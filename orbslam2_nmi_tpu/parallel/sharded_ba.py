"""Distributed Schur bundle adjustment: LANDMARKS sharded over the mesh.

The g2o replacement (solvers/local_ba.py) marginalizes landmarks with a Schur
complement; the reduced camera system

    S = Hcc - B Hpp^{-1} B^T,   g_s = g_c - B Hpp^{-1} g_p

is ADDITIVE OVER POINTS once every observation of a point lives on the chip
that owns the point. This module therefore shards the POINT array across the
mesh and routes each observation to its point's shard (host-side grouping,
one stable sort per solve):

  * Hpp / gp / Hpp^{-1} / point back-substitution: fully local, scale 1/N.
  * The Schur product B·(Hpp^{-1}Bᵀ) — the solve's dominant matmul — runs on
    each chip over its point shard only: [6C, 3P/N] x [3P/N, 6C].
  * The only collectives are psum([6C,6C]) + psum([6C]) (+ scalar chi2
    totals): O(C^2) bytes per iteration, INDEPENDENT of the landmark count —
    the textbook distributed-GN layout (SURVEY.md §2.4 P7: block-row Hessian
    assembly + psum-reduced reduced camera system). An earlier design sharded
    raw observations and psum'd the dense coupling blocks [C,P,6,3]; that
    moved O(C·P) bytes per iteration and replicated the Schur matmul on every
    chip.

The (small) [6C,6C] solve stays replicated — cheaper than a distributed
Cholesky and it leaves the updated poses already in place on every chip.
Numerics match solvers.local_ba.bundle_adjust up to psum reassociation; the
two-phase chi2-gating schedule is identical (Optimizer.cc:679-725).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from orbslam2_nmi_tpu.parallel.mesh import POSE_AXIS
from orbslam2_nmi_tpu.solvers import local_ba
from orbslam2_nmi_tpu.geometry import se3

_HI = jax.lax.Precision.HIGHEST


def _balance_points(obs_pt: np.ndarray, P_n: int, n_dev: int):
    """Assign points to shards balancing OBSERVATION counts (greedy LPT):
    every shard's per-iteration work and padding is ~mean instead of the max
    of a contiguous range (uneven landmark covisibility skews contiguous
    ranges ~1.5x, which every other shard then pads and idles to).
    Returns (shard_of [P_n], slot_of [P_n], p_loc)."""
    import heapq

    counts = np.bincount(obs_pt, minlength=P_n)
    order = np.argsort(-counts, kind="stable")
    p_loc = -(-P_n // n_dev)
    shard_of = np.zeros(P_n, np.int64)
    slot_of = np.zeros(P_n, np.int64)
    fill = np.zeros(n_dev, np.int64)
    heap = [(0, d) for d in range(n_dev)]
    heapq.heapify(heap)
    for p in order:
        spill = []
        while True:
            load, d = heapq.heappop(heap)
            if fill[d] < p_loc:
                break
            spill.append((load, d))
        for item in spill:
            heapq.heappush(heap, item)
        shard_of[p] = d
        slot_of[p] = fill[d]
        fill[d] += 1
        heapq.heappush(heap, (load + int(counts[p]), d))
    return shard_of, slot_of, p_loc


def _group_obs_by_point_shard(obs_pt: np.ndarray, shard_of: np.ndarray, n_dev: int):
    """Stable-sort observation slots so each device receives exactly the
    observations of its point shard. Returns (idx [n_dev, O_loc] source slot
    or -1 pad, O_loc)."""
    shard = shard_of[obs_pt]
    order = np.argsort(shard, kind="stable")
    counts = np.bincount(shard, minlength=n_dev)
    o_loc = max(int(counts.max()), 1)
    o_loc = -(-o_loc // 8) * 8  # pad for lane friendliness
    idx = np.full((n_dev, o_loc), -1, np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for d in range(n_dev):
        idx[d, : counts[d]] = order[starts[d] : starts[d] + counts[d]]
    return idx, o_loc


def sharded_bundle_adjust(
    mesh, prob: local_ba.BAProblem, iters1: int = 5, iters2: int = 10, axis: str = POSE_AXIS
) -> local_ba.BAResult:
    """bundle_adjust with the landmark array (and each landmark's
    observations) sharded over `axis`.

    Matches solvers.local_ba.bundle_adjust numerically (psum is exact up to
    float reassociation); the two-phase chi2-gating schedule is identical.
    """
    n_dev = mesh.shape[axis]
    C = prob.cam_Tcw.shape[0]
    P_n = prob.pts_w.shape[0]
    O = prob.obs_cam.shape[0]

    obs_pt_h = np.asarray(prob.obs_pt)
    shard_of, slot_of, p_loc = _balance_points(obs_pt_h, P_n, n_dev)
    p_pad = p_loc * n_dev
    idx, o_loc = _group_obs_by_point_shard(obs_pt_h, shard_of, n_dev)
    safe = np.maximum(idx, 0).reshape(-1)
    pad_ok = (idx >= 0).reshape(-1)

    def gather_obs(a, fill=0):
        out = np.asarray(a)[safe]
        if out.ndim == 1:
            return np.where(pad_ok, out, fill)
        return np.where(pad_ok[:, None], out, fill)

    obs_cam_s = jnp.asarray(gather_obs(prob.obs_cam))
    obs_pt_s = jnp.asarray(
        np.where(pad_ok, slot_of[obs_pt_h[safe]], 0).astype(np.int32)
    )
    obs_uv_s = jnp.asarray(gather_obs(prob.obs_uv))
    obs_w_s = jnp.asarray(gather_obs(prob.obs_inv_sigma2, fill=1.0))
    obs_valid_full = np.asarray(prob.obs_valid) & np.asarray(prob.cam_valid)[
        np.asarray(prob.obs_cam)
    ]
    obs_valid_s = jnp.asarray(gather_obs(obs_valid_full, fill=False))

    # permuted point layout: global slot = shard_of * p_loc + slot_of
    perm_pos = shard_of * p_loc + slot_of
    pts_h = np.zeros((p_pad, 3), np.asarray(prob.pts_w).dtype)
    pts_h[perm_pos] = np.asarray(prob.pts_w)
    ptsv_h = np.zeros((p_pad,), bool)
    ptsv_h[perm_pos] = np.asarray(prob.pts_valid)
    pts_pad = jnp.asarray(pts_h)
    ptsv_pad = jnp.asarray(ptsv_h)

    cam_free = (~prob.cam_fixed) & prob.cam_valid

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),  # K, cam_Tcw, cam_free
            P(axis), P(axis),  # pts, pts_valid
            P(axis), P(axis), P(axis), P(axis), P(axis),  # obs
        ),
        out_specs=(P(), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def run(K, cam0, free, pts0, ptsv, ocam, opt, ouv, ow, ovalid):
        P_l = pts0.shape[0]

        def iteration(cam_Tcw, pts_w, active, lam, use_huber):
            r, Jc, Jp, z = local_ba._residuals(K, cam_Tcw, pts_w, ocam, opt, ouv)
            chi2 = jnp.sum(r * r, axis=-1) * ow
            rho_w = jnp.where(
                use_huber & (chi2 > local_ba.CHI2_MONO),
                local_ba.HUBER_DELTA / jnp.sqrt(chi2 + 1e-12),
                1.0,
            )
            w = ow * rho_w * active * (z > 0)
            Jc = Jc * free[ocam].astype(Jc.dtype)[:, None, None]
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]

            # camera blocks: partial over this shard's observations
            Hcc = jax.ops.segment_sum(
                jnp.einsum("oik,oil->okl", wJc, Jc, precision=_HI), ocam, num_segments=C
            )
            gc = jax.ops.segment_sum(
                jnp.einsum("oik,oi->ok", wJc, r, precision=_HI), ocam, num_segments=C
            )
            # landmark blocks: COMPLETE locally (all obs of local points here)
            Hpp = jax.ops.segment_sum(
                jnp.einsum("oik,oil->okl", wJp, Jp, precision=_HI), opt, num_segments=P_l
            )
            gp = jax.ops.segment_sum(
                jnp.einsum("oik,oi->ok", wJp, r, precision=_HI), opt, num_segments=P_l
            )
            Hcp = jax.ops.segment_sum(
                jnp.einsum("oik,oil->okl", wJc, Jp, precision=_HI),
                ocam * P_l + opt,
                num_segments=C * P_l,
            ).reshape(C, P_l, 6, 3)

            lamI3 = lam * jnp.eye(3)
            Hpp = Hpp + lamI3[None] + 1e-8 * jnp.eye(3)[None]
            Hpp_inv = local_ba._spd_inv3(Hpp) * ptsv[:, None, None]

            # partial reduced system over the local point shard
            B = Hcp.transpose(0, 2, 1, 3).reshape(C * 6, P_l * 3)
            HppinvBT = jnp.einsum("pkl,cpjl->cpjk", Hpp_inv, Hcp, precision=_HI)
            HppinvBT_m = HppinvBT.transpose(1, 3, 0, 2).reshape(P_l * 3, C * 6)
            S_part = -jnp.matmul(B, HppinvBT_m, precision=_HI)
            S_part = S_part.reshape(C, 6, C, 6)
            S_part = S_part.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
            gp_tilde = jnp.einsum("pkl,pl->pk", Hpp_inv, gp, precision=_HI)
            g_part = gc.reshape(-1) - jnp.matmul(B, gp_tilde.reshape(-1), precision=_HI)

            # the ONLY non-scalar collectives: [6C, 6C] + [6C] + the [C, 6]
            # update broadcast
            S = jax.lax.psum(S_part.reshape(C * 6, C * 6), axis)
            g_s = jax.lax.psum(g_part, axis)

            def solve_root():
                lamI6 = lam * jnp.eye(6)
                Sd = S.reshape(C, 6, C, 6)
                Sd = Sd.at[jnp.arange(C), :, jnp.arange(C), :].add(
                    lamI6[None] + 1e-8 * jnp.eye(6)[None]
                )
                Sd = Sd.reshape(C * 6, C * 6)
                free6 = jnp.repeat(free, 6)
                Sd = jnp.where(free6[:, None] & free6[None, :], Sd, 0.0)
                Sd = Sd + jnp.diag(jnp.where(free6, 0.0, 1.0))
                g = jnp.where(free6, g_s, 0.0)
                return jax.scipy.linalg.cho_solve(
                    jax.scipy.linalg.cho_factor(Sd + 1e-8 * jnp.eye(C * 6)), g
                ).reshape(C, 6)

            # Cholesky on chip 0 only, psum-broadcast the update (same root-
            # solve pattern as sharded_pose_graph): a replicated factorization
            # costs n_devices x the FLOPs for the same wall time
            on_root = jax.lax.axis_index(axis) == 0
            dxc = jax.lax.psum(
                jax.lax.cond(on_root, solve_root, lambda: jnp.zeros((C, 6))), axis
            )

            # back-substitute the local point shard
            Bt_dxc = jnp.einsum("cpkl,ck->pl", Hcp, dxc, precision=_HI)
            dp = jnp.einsum("pkl,pl->pk", Hpp_inv, gp - Bt_dxc, precision=_HI)
            dp = dp * ptsv[:, None]
            new_cams = jnp.where(
                free[:, None, None],
                se3.se3_compose(se3.batched_se3_exp(dxc), cam_Tcw),
                cam_Tcw,
            )
            return new_cams, pts_w + dp

        def chi2_of(cam, pts):
            r, _, _, z = local_ba._residuals(K, cam, pts, ocam, opt, ouv)
            return jnp.sum(r * r, axis=-1) * ow, z

        cam_valid_obs = ovalid  # padding already folded into ovalid
        active0 = cam_valid_obs & ptsv[opt]

        def phase(cam, pts, active, n_iters, use_huber):
            def body(carry, _):
                cam, pts, lam, best = carry
                new_cam, new_pts = iteration(
                    cam, pts, active.astype(jnp.float32), lam, use_huber
                )
                chi2_new, z = chi2_of(new_cam, new_pts)
                # Huber-robustified + degeneracy-penalized accept total (see
                # local_ba._robust_total): raw totals let gross outliers or
                # behind-camera/NaN states masquerade as improvements
                total = jax.lax.psum(local_ba._robust_total(chi2_new, active, z), axis)
                improved = total < best
                cam = jnp.where(improved, new_cam, cam)
                pts = jnp.where(improved, new_pts, pts)
                lam = jnp.where(improved, lam * 0.5, lam * 5.0)
                return (cam, pts, lam, jnp.minimum(best, total)), None

            chi2_0, z0 = chi2_of(cam, pts)
            total0 = jax.lax.psum(local_ba._robust_total(chi2_0, active, z0), axis)
            (cam, pts, _, _), _ = jax.lax.scan(
                body, (cam, pts, jnp.float32(1e-4), total0), None, length=n_iters
            )
            return cam, pts

        use_huber = jnp.asarray(True)
        cam, pts = phase(cam0, pts0, active0, iters1, use_huber)
        chi2, z = chi2_of(cam, pts)
        active1 = active0 & (chi2 <= local_ba.CHI2_MONO) & (z > 0)
        cam, pts = phase(cam, pts, active1, iters2, use_huber)
        chi2, z = chi2_of(cam, pts)
        inlier = active0 & (chi2 <= local_ba.CHI2_MONO) & (z > 0)
        return cam, pts, inlier, chi2

    cam_out, pts_out, inlier_s, chi2_s = run(
        prob.K, prob.cam_Tcw, cam_free, pts_pad, ptsv_pad,
        obs_cam_s, obs_pt_s, obs_uv_s, obs_w_s, obs_valid_s,
    )

    # un-permute per-observation outputs back to the original slot order
    inlier = np.zeros(O, bool)
    chi2 = np.zeros(O, np.float32)
    inlier[safe[pad_ok]] = np.asarray(inlier_s).reshape(-1)[pad_ok]
    chi2[safe[pad_ok]] = np.asarray(chi2_s).reshape(-1)[pad_ok]
    return local_ba.BAResult(
        cam_Tcw=cam_out,
        pts_w=pts_out[jnp.asarray(perm_pos)],  # un-permute the balanced layout
        obs_inlier=jnp.asarray(inlier),
        chi2=jnp.asarray(chi2),
    )
