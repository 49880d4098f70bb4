"""Batched RANSAC PnP for BoW relocalization.

Replaces PnPsolver (reference: src/PnPsolver.cc — EPnP control points +
Gauss-Newton inside a sequential RANSAC loop, :167 iterate / :479
compute_pose). TPU-first re-design: instead of iterating hypotheses one at a
time, ALL RANSAC hypotheses are solved in one vmapped batch, inliers counted
in one [H, N] masked reduction, and the winner polished with the pose-only LM
(solvers/pose_gn.py) exactly as the reference refines with g2o afterwards
(Tracking.cc:1669-1720).

Two batched minimal solvers:
  * `epnp_pose` — the reference's actual algorithm (PnPsolver.cc:479
    compute_pose): 4 control points (centroid + PCA axes), barycentric
    expansion, 12x12 eigendecomposition of M^T M, beta cases N=1/2/3 from the
    L·beta=rho distance system (:700-840), Gauss-Newton refinement of betas
    (:842), Horn/procrustes recovery of [R|t]. Minimal sample = 4 points
    (PnPsolver.cc:128 `mRansacMinSet = 4`).
  * `_dlt_pose` — 6-point weighted DLT fallback (simpler, used for tests and
    degenerate configurations).
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


def _procrustes_rt(pw, pc, w):
    """Weighted rigid alignment pc ~ R pw + t (Horn, rotation-only scale=1)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cw = jnp.sum(pw * w[:, None], 0) / wsum
    cc = jnp.sum(pc * w[:, None], 0) / wsum
    qw = pw - cw
    qc = pc - cc
    H = (qc * w[:, None]).T @ qw  # [3, 3]
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, det]))
    R = U @ D @ Vt
    t = cc - R @ cw
    return R, t


def epnp_pose(K, pts_w, uv, weights):
    """EPnP for the weighted point subset (weights in {0,1}, >= 4 ones).

    Follows PnPsolver.cc:479 compute_pose: control points from the sample's
    centroid + principal axes, barycentric coordinates, eigenvectors of
    M^T M, beta initializations for cases N=1/2/3 solved from the pairwise
    control-point distance system, a few Gauss-Newton steps on the betas, and
    procrustes recovery; the best case by reprojection error wins.
    """
    w = weights
    wsum = jnp.maximum(jnp.sum(w), 1e-9)

    # ---- control points: centroid + PCA axes (compute_pose -> choose_control_points)
    c0 = jnp.sum(pts_w * w[:, None], 0) / wsum
    q = (pts_w - c0) * w[:, None]
    cov = q.T @ q / wsum
    eval_, evec = jnp.linalg.eigh(cov)  # ascending
    # scale axes by sqrt eigenvalue (degenerate-safe floor)
    axes = evec * jnp.sqrt(jnp.maximum(eval_, 1e-10))[None, :]
    C = jnp.stack([c0, c0 + axes[:, 2], c0 + axes[:, 1], c0 + axes[:, 0]])  # [4,3]

    # ---- barycentric coordinates: X_i = sum_j alpha_ij C_j
    M34 = (C[1:] - C[0]).T  # [3, 3]
    Minv = jnp.linalg.inv(M34 + 1e-12 * jnp.eye(3))
    a123 = (pts_w - C[0]) @ Minv.T  # [N, 3]
    alpha = jnp.concatenate([1.0 - a123.sum(1, keepdims=True), a123], axis=1)  # [N,4]

    # ---- M matrix (2N x 12) and its 12x12 normal matrix
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    du = uv[:, 0] - cx
    dv = uv[:, 1] - cy
    # rows: [a_j*fx, 0, -a_j*du] and [0, a_j*fy, -a_j*dv] per control point j
    r1 = jnp.stack([alpha * fx, jnp.zeros_like(alpha), -alpha * du[:, None]], -1).reshape(-1, 12)
    r2 = jnp.stack([jnp.zeros_like(alpha), alpha * fy, -alpha * dv[:, None]], -1).reshape(-1, 12)
    ws = jnp.sqrt(w)
    MtM = (r1 * ws[:, None]).T @ (r1 * ws[:, None]) + (r2 * ws[:, None]).T @ (r2 * ws[:, None])
    _, V = jnp.linalg.eigh(MtM)  # ascending eigenvalues
    # null-space basis: 4 smallest eigenvectors, each [4 ctrl pts x 3]
    v = [V[:, k].reshape(4, 3) for k in range(4)]

    # pairwise squared distances between world control points (rho)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    rho = jnp.stack([jnp.sum((C[i] - C[j]) ** 2) for i, j in pairs])  # [6]

    def dists(vc):  # squared ctrl-pt distances of a camera-frame candidate
        return jnp.stack([jnp.sum((vc[i] - vc[j]) ** 2) for i, j in pairs])

    def diffs(va, vb):  # cross terms
        return jnp.stack([jnp.sum((va[i] - va[j]) * (vb[i] - vb[j])) for i, j in pairs])

    # ---- beta initializations (find_betas_approx_1/2/3, PnPsolver.cc:700-840)
    # case 1: x = [B11] with L = [d(v1)]
    L11 = dists(v[0])
    b1_c1 = jnp.sqrt(jnp.abs(jnp.sum(L11 * rho) / jnp.maximum(jnp.sum(L11 * L11), 1e-12)))
    betas_c1 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1_c1

    # case 2: unknowns [B11, B12, B22]
    L2 = jnp.stack([dists(v[0]), 2.0 * diffs(v[0], v[1]), dists(v[1])], axis=1)  # [6,3]
    x2 = jnp.linalg.lstsq(L2, rho)[0]
    b1_c2 = jnp.sqrt(jnp.abs(x2[0]))
    b2_c2 = jnp.sqrt(jnp.abs(x2[2])) * jnp.sign(x2[1]) * jnp.sign(x2[0] + 1e-30)
    betas_c2 = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1_c2 + jnp.array([0.0, 1.0, 0.0, 0.0]) * b2_c2

    # case 3: unknowns [B11, B12, B22, B13, B23]
    L3 = jnp.stack(
        [
            dists(v[0]),
            2.0 * diffs(v[0], v[1]),
            dists(v[1]),
            2.0 * diffs(v[0], v[2]),
            2.0 * diffs(v[1], v[2]),
        ],
        axis=1,
    )  # [6,5]
    x3 = jnp.linalg.lstsq(L3, rho)[0]
    b1_c3 = jnp.sqrt(jnp.abs(x3[0]))
    b2_c3 = jnp.sqrt(jnp.abs(x3[2])) * jnp.sign(x3[1]) * jnp.sign(x3[0] + 1e-30)
    b3_c3 = x3[3] / jnp.maximum(b1_c3, 1e-12) * jnp.sign(x3[0] + 1e-30)
    betas_c3 = (
        jnp.array([1.0, 0.0, 0.0, 0.0]) * b1_c3
        + jnp.array([0.0, 1.0, 0.0, 0.0]) * b2_c3
        + jnp.array([0.0, 0.0, 1.0, 0.0]) * b3_c3
    )

    # ---- Gauss-Newton on betas (gauss_newton PnPsolver.cc:842, 5 iterations)
    L10 = jnp.stack(
        [
            dists(v[0]),
            2.0 * diffs(v[0], v[1]),
            dists(v[1]),
            2.0 * diffs(v[0], v[2]),
            2.0 * diffs(v[1], v[2]),
            dists(v[2]),
            2.0 * diffs(v[0], v[3]),
            2.0 * diffs(v[1], v[3]),
            2.0 * diffs(v[2], v[3]),
            dists(v[3]),
        ],
        axis=1,
    )  # [6, 10]

    def gn_refine(betas):
        def step(_, b):
            b1, b2, b3, b4 = b[0], b[1], b[2], b[3]
            # residual: L10 @ q(b) - rho, q = [b1^2, b1b2, b2^2, b1b3, b2b3, b3^2, b1b4, b2b4, b3b4, b4^2]
            qv = jnp.stack(
                [b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4]
            )
            res = L10 @ qv - rho
            # jacobian d res / d b
            J = jnp.stack(
                [
                    L10[:, 0] * 2 * b1 + L10[:, 1] * b2 + L10[:, 3] * b3 + L10[:, 6] * b4,
                    L10[:, 1] * b1 + L10[:, 2] * 2 * b2 + L10[:, 4] * b3 + L10[:, 7] * b4,
                    L10[:, 3] * b1 + L10[:, 4] * b2 + L10[:, 5] * 2 * b3 + L10[:, 8] * b4,
                    L10[:, 6] * b1 + L10[:, 7] * b2 + L10[:, 8] * b3 + L10[:, 9] * 2 * b4,
                ],
                axis=1,
            )  # [6, 4]
            JtJ = J.T @ J + 1e-9 * jnp.eye(4)
            db = jnp.linalg.solve(JtJ, J.T @ res)
            return b - db

        return jax.lax.fori_loop(0, 5, step, betas)

    def pose_from_betas(betas):
        vc = betas[0] * v[0] + betas[1] * v[1] + betas[2] * v[2] + betas[3] * v[3]  # [4,3] cam ctrl pts
        pc = alpha @ vc  # [N, 3] camera-frame points
        # enforce positive depth (the nullspace sign is arbitrary)
        depth_sign = jnp.where(jnp.sum((pc[:, 2] > 0) * w) >= 0.5 * wsum, 1.0, -1.0)
        pc = pc * depth_sign
        R, t = _procrustes_rt(pts_w, pc, w)
        T = jnp.eye(4, dtype=pts_w.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        return T

    def sample_err(T):
        return jnp.sum(_reproj_err2(K, T, pts_w, uv) * w) / wsum

    cand = [pose_from_betas(gn_refine(b)) for b in (betas_c1, betas_c2, betas_c3)]
    errs = jnp.stack([sample_err(T) for T in cand])
    Ts = jnp.stack(cand)
    return Ts[jnp.argmin(errs)]


def _reproj_err2(K, T, pts_w, uv):
    pc = pts_w @ T[:3, :3].T + T[:3, 3]
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    return jnp.where(pc[:, 2] > 0, err2, 1e12)


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "sample_size", "solver"))
def _ransac_core(key, K, pts_w, uv, inv_sigma2, valid, n_hypotheses=128,
                 sample_size=4, solver="epnp"):
    n = pts_w.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    minimal = epnp_pose if solver == "epnp" else _dlt_pose

    def one(k):
        idx = jax.random.choice(k, n, shape=(sample_size,), replace=False, p=probs)
        w = jnp.zeros(n).at[idx].set(1.0)
        T = minimal(K, pts_w, uv, w)
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
    solver: str = "epnp",
) -> PnPResult:
    """Full relocalization solve: batched EPnP RANSAC + pose-only LM polish."""
    sample_size = 4 if solver == "epnp" else 6
    T, inl, n_inl = _ransac_core(
        key, K, pts_w, uv, inv_sigma2, valid,
        n_hypotheses=n_hypotheses, sample_size=sample_size, solver=solver,
    )
    res = pose_gn.pose_optimization_k(K, T, pts_w, uv, inv_sigma2, inl)
    ok = res.n_inliers >= min_inliers
    return PnPResult(Tcw=res.Tcw, inliers=res.inliers, n_inliers=res.n_inliers, ok=ok)
