"""Distributed Schur bundle adjustment: observations sharded over the mesh.

The g2o replacement (solvers/local_ba.py) assembles the normal equations from
per-observation block outer-products; those sums are embarrassingly parallel
over observations. This module shards the observation table across chips with
shard_map: each chip reduces its shard's contributions to (Hcc, g_c, Hpp, g_p,
Hcp), `jax.lax.psum` combines them over ICI, and every chip solves the
identical (small) reduced camera system — poses/points stay replicated, so no
re-gather is needed. This is the standard distributed-GN layout for BA
(keyframe/observation partitioning, SURVEY.md §2.4 P7 and §5).

Communication per iteration: 36 C^2-free blocks — Hcc [C,6,6], Hcp [C,P,6,3],
Hpp [P,3,3] — dominated by Hcp; for local-BA sizes this is a few MB over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from orbslam2_nmi_tpu.parallel.mesh import OBS_AXIS, POSE_AXIS
from orbslam2_nmi_tpu.solvers import local_ba


def _pad_obs(prob: local_ba.BAProblem, n_dev: int) -> local_ba.BAProblem:
    O = prob.obs_cam.shape[0]
    pad = (-O) % n_dev
    if pad == 0:
        return prob
    return prob._replace(
        obs_cam=jnp.pad(prob.obs_cam, (0, pad)),
        obs_pt=jnp.pad(prob.obs_pt, (0, pad)),
        obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0))),
        obs_inv_sigma2=jnp.pad(prob.obs_inv_sigma2, (0, pad), constant_values=1.0),
        obs_valid=jnp.pad(prob.obs_valid, (0, pad)),
    )


def sharded_bundle_adjust(
    mesh, prob: local_ba.BAProblem, iters1: int = 5, iters2: int = 10, axis: str = POSE_AXIS
) -> local_ba.BAResult:
    """bundle_adjust with the observation table sharded over `axis`.

    Matches solvers.local_ba.bundle_adjust numerically (psum is exact up to
    float reassociation); the two-phase chi2-gating schedule is identical.
    """
    n_dev = mesh.shape[axis]
    prob = _pad_obs(prob, n_dev)

    obs_spec = local_ba.BAProblem(
        K=P(),
        cam_Tcw=P(),
        cam_fixed=P(),
        cam_valid=P(),
        pts_w=P(),
        pts_valid=P(),
        obs_cam=P(axis),
        obs_pt=P(axis),
        obs_uv=P(axis, None),
        obs_inv_sigma2=P(axis),
        obs_valid=P(axis),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(obs_spec,),
        out_specs=local_ba.BAResult(
            cam_Tcw=P(), pts_w=P(), obs_inlier=P(axis), chi2=P(axis)
        ),
        check_vma=False,
    )
    def run(p_local: local_ba.BAProblem) -> local_ba.BAResult:
        allreduce = lambda x: jax.lax.psum(x, axis)
        K = p_local.K
        active0 = (
            p_local.obs_valid
            & p_local.pts_valid[p_local.obs_pt]
            & p_local.cam_valid[p_local.obs_cam]
        )

        def phase(cam, pts, active, n_iters):
            def body(carry, _):
                cam, pts, lam, best = carry
                new_cam, new_pts, _ = local_ba._ba_iteration(
                    K, cam, pts, p_local, active.astype(jnp.float32), lam,
                    jnp.asarray(True), allreduce=allreduce,
                )
                chi2_new, z = local_ba._chi2_of(K, new_cam, new_pts, p_local)
                total = allreduce(jnp.sum(chi2_new * active * (z > 0)))
                improved = total < best
                cam = jnp.where(improved, new_cam, cam)
                pts = jnp.where(improved, new_pts, pts)
                lam = jnp.where(improved, lam * 0.5, lam * 5.0)
                return (cam, pts, lam, jnp.minimum(best, total)), None

            chi2_0, z0 = local_ba._chi2_of(K, cam, pts, p_local)
            total0 = allreduce(jnp.sum(chi2_0 * active * (z0 > 0)))
            (cam, pts, _, _), _ = jax.lax.scan(
                body, (cam, pts, jnp.float32(1e-4), total0), None, length=n_iters
            )
            return cam, pts

        cam, pts = phase(p_local.cam_Tcw, p_local.pts_w, active0, iters1)
        chi2, z = local_ba._chi2_of(K, cam, pts, p_local)
        active1 = active0 & (chi2 <= local_ba.CHI2_MONO) & (z > 0)
        cam, pts = phase(cam, pts, active1, iters2)
        chi2, z = local_ba._chi2_of(K, cam, pts, p_local)
        inlier = active0 & (chi2 <= local_ba.CHI2_MONO) & (z > 0)
        return local_ba.BAResult(cam_Tcw=cam, pts_w=pts, obs_inlier=inlier, chi2=chi2)

    return run(prob)
