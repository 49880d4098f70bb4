"""Batched Sim(3) estimation + refinement between two keyframes (loop closing).

Replaces Sim3Solver (reference: src/Sim3Solver.cc — Horn's closed-form
quaternion method on 3-point samples inside sequential RANSAC, :40 ctor /
:143 iterate) and Optimizer::OptimizeSim3 (src/Optimizer.cc:1063 — g2o LM on
one Sim3 vertex with dual-direction reprojection edges, Huber sqrt(10), chi2-10
outlier removal then re-optimization). TPU-first: all RANSAC hypotheses are
Horn-solved in one vmapped batch; inliers are counted by reprojecting each
side's points into the OTHER camera (the reference's CheckInliers does exactly
this dual test); the refinement is a fixed-shape Gauss-Newton on the 7-DoF
tangent with autodiff jacobians, everything masked. Monocular => scale is free
(bFixScale=false).
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


# --------------------------------------------------------------- OptimizeSim3

CHI2_SIM3 = 10.0  # Optimizer.cc:1102 th2 (both edge directions)


class Sim3OptResult(NamedTuple):
    S12: jnp.ndarray  # [4, 4] refined sim3 (scale folded into rotation block)
    scale: jnp.ndarray
    inliers: jnp.ndarray  # [N] bool — chi2 <= 10 in BOTH directions
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters1", "iters2", "fix_scale"))
def optimize_sim3(
    K: jnp.ndarray,
    S12_0: jnp.ndarray,  # [4, 4] initial sim3 (e.g. RANSAC output)
    pts1_cam: jnp.ndarray,  # [N, 3] matched points in camera-1 frame
    pts2_cam: jnp.ndarray,  # [N, 3] same points in camera-2 frame
    uv1: jnp.ndarray,  # [N, 2] observed pixels in image 1
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    iters1: int = 5,
    iters2: int = 10,
    fix_scale: bool = False,
) -> Sim3OptResult:
    """Optimizer::OptimizeSim3 (Optimizer.cc:1063) as masked Gauss-Newton.

    Dual reprojection edges per match (p2 through S12 into image 1; p1 through
    S21 into image 2), Huber delta = sqrt(10); after `iters1` iterations edges
    with chi2 > 10 in either direction are dropped (the reference removes both
    directions of a bad pair) and `iters2` more iterations run on the
    survivors. Returns the refined S12 and the final inlier set.
    """
    from orbslam2_nmi_tpu.geometry import se3

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    s0 = jnp.linalg.norm(S12_0[:3, 0])
    R_init = S12_0[:3, :3] / s0
    t_init = S12_0[:3, 3]

    def _proj(p):
        z = jnp.where(jnp.abs(p[..., 2]) > 1e-9, p[..., 2], 1e-9)
        return jnp.stack(
            [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1
        )

    def _residuals(delta, R0, t0, ls0):
        """delta = [omega(3), dt(3), dls(1)] applied on the left/additively."""
        R = se3.so3_exp(delta[:3]) @ R0
        t = t0 + delta[3:6]
        ls = ls0 if fix_scale else ls0 + delta[6]
        s = jnp.exp(ls)
        p2in1 = s * (pts2_cam @ R.T) + t
        r1 = uv1 - _proj(p2in1)
        p1in2 = (1.0 / s) * ((pts1_cam - t) @ R)
        r2 = uv2 - _proj(p1in2)
        return r1, r2

    def _chi2(R, t, ls):
        r1, r2 = _residuals(jnp.zeros(7), R, t, ls)
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        return c1, c2

    huber = jnp.sqrt(CHI2_SIM3)

    def _gn_step(carry, mask):
        R, t, ls = carry
        zero = jnp.zeros(7)
        (r1, r2), (J1, J2) = (
            _residuals(zero, R, t, ls),
            jax.jacfwd(lambda d: _residuals(d, R, t, ls))(zero),
        )
        c1 = jnp.sum(r1 * r1, -1) * inv_sigma2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_sigma2_2
        # IRLS Huber weights per edge direction
        w1 = jnp.where(c1 > CHI2_SIM3, huber / jnp.sqrt(jnp.maximum(c1, 1e-12)), 1.0)
        w2 = jnp.where(c2 > CHI2_SIM3, huber / jnp.sqrt(jnp.maximum(c2, 1e-12)), 1.0)
        w1 = w1 * inv_sigma2_1 * mask
        w2 = w2 * inv_sigma2_2 * mask
        H = jnp.einsum("nri,n,nrj->ij", J1, w1, J1) + jnp.einsum(
            "nri,n,nrj->ij", J2, w2, J2
        )
        b = jnp.einsum("nri,n,nr->i", J1, w1, r1) + jnp.einsum(
            "nri,n,nr->i", J2, w2, r2
        )
        H = H + 1e-6 * jnp.eye(7)
        # e(d) ~ e0 + J d  =>  normal equations H d = -J^T W e0
        d = -jnp.linalg.solve(H, b)
        R_new = se3.so3_exp(d[:3]) @ R
        t_new = t + d[3:6]
        ls_new = ls if fix_scale else ls + d[6]
        return (R_new, t_new, ls_new)

    state = (R_init, t_init, jnp.log(s0))
    mask = valid.astype(jnp.float32)
    for _ in range(iters1):
        state = _gn_step(state, mask)
    c1, c2 = _chi2(*state)
    good = valid & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3)
    mask = good.astype(jnp.float32)
    for _ in range(iters2):
        state = _gn_step(state, mask)
    c1, c2 = _chi2(*state)
    inl = valid & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3)
    R, t, ls = state
    s = jnp.exp(ls)
    S12 = jnp.eye(4).at[:3, :3].set(s * R).at[:3, 3].set(t)
    return Sim3OptResult(S12=S12, scale=s, inliers=inl, n_inliers=jnp.sum(inl))
