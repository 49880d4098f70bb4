"""Batched Sim(3) estimation between two keyframes (loop closing).

Replaces Sim3Solver (reference: src/Sim3Solver.cc — Horn's closed-form
quaternion method on 3-point samples inside sequential RANSAC, :40 ctor /
:143 iterate). TPU-first: all RANSAC hypotheses are Horn-solved in one vmapped
batch; inliers are counted by reprojecting each side's points into the OTHER
camera (the reference's CheckInliers does exactly this dual test with
th2 = 9.21 * sigma2 per feature). Monocular => scale is free (bFixScale=false).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Sim3Result(NamedTuple):
    S12: jnp.ndarray  # [4, 4] sim3 mapping frame-2 coords into frame-1
    scale: jnp.ndarray
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def horn_sim3(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray, fix_scale: bool = False):
    """Closed-form similarity p1 ~ s R p2 + t (Horn 1987), weighted.

    p1, p2: [N, 3]; w: [N] 0/1 sample weights. Returns (R, t, s).
    """
    wsum = jnp.maximum(w.sum(), 1e-9)
    c1 = (p1 * w[:, None]).sum(0) / wsum
    c2 = (p2 * w[:, None]).sum(0) / wsum
    q1 = p1 - c1
    q2 = p2 - c2
    # cross-covariance
    M = jnp.einsum("ni,nj,n->ij", q2, q1, w)  # maps 2 -> 1
    # quaternion method: largest eigenvector of the 4x4 N matrix
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    vals, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # [w, x, y, z] eigenvector of largest eigenvalue
    from orbslam2_nmi_tpu.geometry import se3

    R = se3.quat_to_rot(q)
    # scale (Horn symmetric-free form): s = sum(q1 . R q2) / sum(|q2|^2)
    Rq2 = q2 @ R.T
    s = jnp.sum(jnp.sum(q1 * Rq2, -1) * w) / jnp.maximum(
        jnp.sum(jnp.sum(q2 * q2, -1) * w), 1e-9
    )
    s = jnp.where(fix_scale, 1.0, s)
    t = c1 - s * (R @ c2)
    return R, t, s


def _project(K, p):
    z = jnp.where(jnp.abs(p[:, 2]) > 1e-9, p[:, 2], 1e-9)
    return jnp.stack(
        [K[0, 0] * p[:, 0] / z + K[0, 2], K[1, 1] * p[:, 1] / z + K[1, 2]], -1
    ), p[:, 2]


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "fix_scale"))
def sim3_ransac(
    key,
    K: jnp.ndarray,
    pts1_cam: jnp.ndarray,  # [N, 3] matched points in camera-1 frame
    pts2_cam: jnp.ndarray,  # [N, 3] same points in camera-2 frame
    uv1: jnp.ndarray,  # [N, 2] observed pixels in image 1
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    n_hypotheses: int = 128,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3Result:
    n = pts1_cam.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)

    def count_inliers(R, t, s):
        # project 2's points through S12 into image 1, and 1's through S21 into 2
        p2in1 = s * (pts2_cam @ R.T) + t
        uv1_hat, z1 = _project(K, p2in1)
        e1 = jnp.sum((uv1_hat - uv1) ** 2, -1) * inv_sigma2_1
        Rt = R.T
        p1in2 = (1.0 / jnp.maximum(s, 1e-9)) * ((pts1_cam - t) @ R)
        uv2_hat, z2 = _project(K, p1in2)
        e2 = jnp.sum((uv2_hat - uv2) ** 2, -1) * inv_sigma2_2
        # 9.21 = chi2(0.99, 2dof) as in Sim3Solver::CheckInliers
        return (e1 < 9.21) & (e2 < 9.21) & (z1 > 0) & (z2 > 0) & valid

    def one(k):
        idx = jax.random.choice(k, n, shape=(3,), replace=False, p=probs)
        w = jnp.zeros(n).at[idx].set(1.0)
        R, t, s = horn_sim3(pts1_cam, pts2_cam, w, fix_scale)
        inl = count_inliers(R, t, s)
        return R, t, s, jnp.sum(inl)

    keys = jax.random.split(key, n_hypotheses)
    Rs, ts, ss, counts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    R, t, s = Rs[best], ts[best], ss[best]
    inl = count_inliers(R, t, s)
    # refine on all inliers with one weighted Horn solve
    R, t, s = horn_sim3(pts1_cam, pts2_cam, inl.astype(jnp.float32), fix_scale)
    inl = count_inliers(R, t, s)
    S12 = jnp.eye(4).at[:3, :3].set(s * R).at[:3, 3].set(t)
    n_inl = jnp.sum(inl)
    return Sim3Result(S12=S12, scale=s, inliers=inl, n_inliers=n_inl, ok=n_inl >= min_inliers)
