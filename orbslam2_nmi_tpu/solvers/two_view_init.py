"""Classic two-view monocular initialization: parallel H/F RANSAC + reconstruction.

Replaces Initializer (reference: src/Initializer.cc): FindHomography (:132) and
FindFundamental (:183) run as two thread-parallel sequential RANSACs there; here
BOTH model families evaluate ALL hypotheses in two vmapped batches. Model
selection RH = SH/(SH+SF) > 0.40 (:105-128), ReconstructF via essential-matrix
decomposition + cheirality (:484, :924 DecomposeE), ReconstructH via the
Faugeras 8-solution decomposition (:587). Scoring constants preserved:
chi2 thresholds 5.991 (H) / 3.841 (F), score offset 5.991 per inlier.

The NMI pipeline bypasses this (Tracking.cc:386-387 uses InitializeWithNMI);
it exists for model-free operation and capability parity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_nmi_tpu.geometry import se3
from orbslam2_nmi_tpu.ops import triangulate

TH_H = 5.991
TH_F = 3.841
SCORE_OFFSET = 5.991


class InitResult(NamedTuple):
    ok: jnp.ndarray  # bool
    used_homography: jnp.ndarray  # bool
    Tcw2: jnp.ndarray  # [4, 4] pose of view 2 (view 1 at identity)
    points_w: jnp.ndarray  # [N, 3] triangulated
    inliers: jnp.ndarray  # [N] bool


def _normalize(uv, valid):
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (uv * w[:, None]).sum(0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    mean_dev = jnp.maximum(d.sum(0) / n, 1e-9)
    s = 1.0 / mean_dev
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return (uv - mean) * s[None, :], T


def _dlt_homography(p1, p2, w):
    """Weighted DLT for H p1 ~ p2 (normalized coords), >= 4 points."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    return vt[-1].reshape(3, 3)


def _eight_point(p1, p2, w):
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], -1) * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    F = vt[-1].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)  # enforce rank 2
    return U @ jnp.diag(S) @ Vt


def _homography_score(H, uv1, uv2, valid):
    """Symmetric transfer error score (CheckHomography, Initializer.cc:240)."""
    def transfer(H, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], 1)
        p = ah @ H.T
        p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:3]) > 1e-9, p[:, 2:3], 1e-9)
        return jnp.sum((p - b) ** 2, -1)

    Hi = jnp.linalg.inv(H)
    e12 = transfer(H, uv1, uv2)
    e21 = transfer(Hi, uv2, uv1)
    ok = (e12 < TH_H) & (e21 < TH_H) & valid
    score = jnp.sum(jnp.where(ok, (TH_H - e12) + (TH_H - e21), 0.0))
    return score, ok


def _fundamental_score(F, uv1, uv2, valid):
    """Epipolar distance score (CheckFundamental, Initializer.cc:330)."""
    o1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], 1)
    o2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], 1)
    l2 = o1 @ F.T  # lines in image 2
    l1 = o2 @ F  # lines in image 1
    d2 = (jnp.sum(l2 * o2, -1) ** 2) / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = (jnp.sum(l1 * o1, -1) ** 2) / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    ok = (d1 < TH_F) & (d2 < TH_F) & valid
    score = jnp.sum(jnp.where(ok, (SCORE_OFFSET - d1) + (SCORE_OFFSET - d2), 0.0))
    return score, ok


def _check_rt(R, t, K, uv1, uv2, valid):
    """CheckRT (Initializer.cc:813): triangulate and count good points."""
    T1 = jnp.eye(4)
    T2 = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    res = triangulate.triangulate_and_gate(
        K, T1, T2, uv1, uv2,
        jnp.ones(uv1.shape[0]), jnp.ones(uv1.shape[0]), valid,
        min_parallax_cos=0.99998, chi2_thresh=4.0 * 4.0,
    )
    return jnp.sum(res.valid), res


def _decompose_e(E):
    U, _, Vt = jnp.linalg.svd(E)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def _decompose_h(H, K):
    """Faugeras SVD decomposition of A = K^-1 H K (ReconstructH,
    Initializer.cc:587): 8 candidate (R, t) pairs."""
    A = jnp.linalg.inv(K) @ H @ K
    U, S, Vt = jnp.linalg.svd(A)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    out = []
    # d' = d2 case
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, 1e-12
    )
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        eps = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        st = eps * sin_t * jnp.sign(x1s[i] + 1e-30) * jnp.sign(x3s[i] + 1e-30)
        st = sin_t * jnp.where(x1s[i] * x3s[i] >= 0, 1.0, -1.0)
        Rp = jnp.array([[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        out.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
    # d' = -d2 case
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, 1e-12
    )
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sp = sin_p * jnp.where(x1s[i] * x3s[i] >= 0, 1.0, -1.0)
        Rp = jnp.array([[cos_p, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_p]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        out.append((R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)))
    return out


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def initialize_two_view(
    key,
    K: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    n_hypotheses: int = 200,
) -> InitResult:
    """Full two-view initialization (Initializer::Initialize, :48)."""
    n = uv1.shape[0]
    p1n, T1 = _normalize(uv1, valid)
    p2n, T2 = _normalize(uv2, valid)
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    keys = jax.random.split(key, n_hypotheses)

    def h_hyp(k):
        idx = jax.random.choice(k, n, shape=(4,), replace=False, p=probs)
        w = jnp.zeros(n).at[idx].set(1.0)
        Hn = _dlt_homography(p1n, p2n, w)
        H = jnp.linalg.inv(T2) @ Hn @ T1
        score, _ = _homography_score(H, uv1, uv2, valid)
        return H, score

    def f_hyp(k):
        idx = jax.random.choice(k, n, shape=(8,), replace=False, p=probs)
        w = jnp.zeros(n).at[idx].set(1.0)
        Fn = _eight_point(p1n, p2n, w)
        F = T2.T @ Fn @ T1
        score, _ = _fundamental_score(F, uv1, uv2, valid)
        return F, score

    Hs, h_scores = jax.vmap(h_hyp)(keys)
    Fs, f_scores = jax.vmap(f_hyp)(keys)
    bH = jnp.argmax(h_scores)
    bF = jnp.argmax(f_scores)
    H, SH = Hs[bH], h_scores[bH]
    F, SF = Fs[bF], f_scores[bF]
    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40  # Initializer.cc:125

    _, h_inl = _homography_score(H, uv1, uv2, valid)
    _, f_inl = _fundamental_score(F, uv1, uv2, valid)

    # reconstruct both families, pick by the selected model
    E = K.T @ F @ K
    cands = list(_decompose_e(E)) + _decompose_h(H, K)
    counts = []
    results = []
    for R, t in cands:
        c, res = _check_rt(R, t, K, uv1, uv2, jnp.where(use_h, h_inl, f_inl))
        counts.append(c)
        results.append((R, t, res))
    counts = jnp.stack(counts)
    e_counts = jnp.where(jnp.arange(12) < 4, counts, -1)
    h_counts = jnp.where(jnp.arange(12) >= 4, counts, -1)
    best = jnp.where(use_h, jnp.argmax(h_counts), jnp.argmax(e_counts))

    Rb = jnp.stack([r for r, _, _ in results])[best]
    tb = jnp.stack([t for _, t, _ in results])[best]
    pts = jnp.stack([res.points_w for _, _, res in results])[best]
    inl = jnp.stack([res.valid for _, _, res in results])[best]
    n_best = counts[best]
    second = jnp.sort(jnp.where(use_h, h_counts, e_counts))[-2]
    n_inliers_model = jnp.sum(jnp.where(use_h, h_inl, f_inl))
    ok = (
        (n_best >= 30)
        & (n_best.astype(jnp.float32) > 0.75 * n_inliers_model.astype(jnp.float32))
        & (second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32))
    )
    Tcw2 = jnp.eye(4).at[:3, :3].set(Rb).at[:3, 3].set(tb)
    return InitResult(ok=ok, used_homography=use_h, Tcw2=Tcw2, points_w=pts, inliers=inl)
