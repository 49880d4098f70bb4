"""Batched RANSAC PnP for BoW relocalization.

Replaces PnPsolver (reference: src/PnPsolver.cc — EPnP control points +
Gauss-Newton inside a sequential RANSAC loop, :167 iterate / :479
compute_pose). TPU-first re-design: instead of iterating hypotheses one at a
time, ALL RANSAC hypotheses are solved in one vmapped batch (DLT-PnP on
6-point minimal-ish samples, SVD-orthogonalized), inliers counted in one
[H, N] masked reduction, and the winner polished with the pose-only LM
(solvers/pose_gn.py) exactly as the reference refines with g2o afterwards
(Tracking.cc:1669-1720).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_nmi_tpu.solvers import pose_gn


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray  # [4, 4]
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # int32
    ok: jnp.ndarray  # bool — enough inliers found


def _dlt_pose(K, pts_w, uv, weights):
    """Weighted DLT for P = K [R|t] from >= 6 points; returns Tcw [4,4].

    weights selects the sampled subset (0/1), keeping shapes static.
    """
    # normalized image coords
    x = (uv[:, 0] - K[0, 2]) / K[0, 0]
    y = (uv[:, 1] - K[1, 2]) / K[1, 1]
    X = pts_w
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # rows for M = [R|t]: x * (m3 . X) = m1 . X etc.
    Xh = jnp.concatenate([X, one[:, None]], axis=1)  # [N, 4]
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -x[:, None] * Xh], axis=1)  # [N, 12]
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -y[:, None] * Xh], axis=1)
    A = jnp.concatenate([r1 * weights[:, None], r2 * weights[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    m = vt[-1].reshape(3, 4)
    # the null vector is defined up to sign; pick the sign that puts the
    # sampled points in FRONT of the camera (depth ~ m[2] . Xh) BEFORE
    # orthogonalizing — flipping R after orthogonalization would break det(R)=1
    depths = Xh @ m[2]
    flip = jnp.sum((depths < 0) * weights) > 0.5 * jnp.sum(weights)
    m = jnp.where(flip, -m, m)
    R_raw = m[:, :3]
    # orthogonalize: R = U V^T (det safety), scale from singular values
    U, S, Vt = jnp.linalg.svd(R_raw)
    det = jnp.linalg.det(jnp.matmul(U, Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    D = D.at[2, 2].set(det)
    R = U @ D @ Vt
    scale = jnp.sum(S) / 3.0
    t = m[:, 3] / jnp.maximum(scale, 1e-12)
    T = jnp.eye(4, dtype=pts_w.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def _reproj_err2(K, T, pts_w, uv):
    pc = pts_w @ T[:3, :3].T + T[:3, 3]
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    return jnp.where(pc[:, 2] > 0, err2, 1e12)


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "sample_size"))
def _ransac_core(key, K, pts_w, uv, inv_sigma2, valid, n_hypotheses=128, sample_size=6):
    n = pts_w.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)

    def one(k):
        idx = jax.random.choice(k, n, shape=(sample_size,), replace=False, p=probs)
        w = jnp.zeros(n).at[idx].set(1.0)
        T = _dlt_pose(K, pts_w, uv, w)
        err2 = _reproj_err2(K, T, pts_w, uv) * inv_sigma2
        inl = (err2 < pose_gn.CHI2_MONO) & valid
        return T, jnp.sum(inl)

    keys = jax.random.split(key, n_hypotheses)
    Ts, counts = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    T = Ts[best]
    err2 = _reproj_err2(K, T, pts_w, uv) * inv_sigma2
    inl = (err2 < pose_gn.CHI2_MONO) & valid
    return T, inl, counts[best]


def pnp_ransac(
    key,
    K: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    n_hypotheses: int = 128,
    min_inliers: int = 10,
) -> PnPResult:
    """Full relocalization solve: batched DLT RANSAC + pose-only LM polish."""
    T, inl, n_inl = _ransac_core(
        key, K, pts_w, uv, inv_sigma2, valid, n_hypotheses=n_hypotheses
    )
    res = pose_gn.pose_optimization_k(K, T, pts_w, uv, inv_sigma2, inl)
    ok = res.n_inliers >= min_inliers
    return PnPResult(Tcw=res.Tcw, inliers=res.inliers, n_inliers=res.n_inliers, ok=ok)
