"""Bundle adjustment with Schur-complement landmark marginalization.

The TPU-native replacement for g2o's BlockSolver_6_3 + Levenberg pipeline as
used by Optimizer::LocalBundleAdjustment (reference: src/Optimizer.cc:472) and
Optimizer::BundleAdjustment (:52). Key design decision (SURVEY.md §7.4): rather
than sparse block bookkeeping, the camera-point coupling matrix B is
*densified* — [6C, 3P] — so the reduced-camera system

    S = Hcc - B Hpp^{-1} B^T,   g_s = g_c - B Hpp^{-1} g_p

is two big MXU matmuls. Landmark marginalization Hpp^{-1} is a batched 3x3
Cholesky inverse. For local-BA-sized problems (C <= ~64 cameras, P <= ~16k
points) the dense form is both simpler and faster on TPU than any scatter-based
sparse assembly; scaling beyond that shards observations across chips and
psum-reduces S (see parallel/sharded_ba.py).

Semantics preserved from the reference:
  * fixed vertices (first KF, NMI-relocalized KFs, observer-only KFs) via
    `cam_fixed` mask (Optimizer.cc:82, :548, :561),
  * Huber kernel delta = sqrt(5.991) on monocular edges,
  * per-octave information weights,
  * the 5+10-iteration two-phase schedule with chi2 outlier gating between
    phases (Optimizer.cc:679-725).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_nmi_tpu.geometry import se3

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(CHI2_MONO)
_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Fixed-shape BA problem. O = observation capacity (padded)."""

    K: jnp.ndarray  # [3, 3] intrinsics
    cam_Tcw: jnp.ndarray  # [C, 4, 4]
    cam_fixed: jnp.ndarray  # [C] bool — poses held constant (id0 / NMI-anchored)
    cam_valid: jnp.ndarray  # [C] bool
    pts_w: jnp.ndarray  # [P, 3]
    pts_valid: jnp.ndarray  # [P] bool
    obs_cam: jnp.ndarray  # [O] int32 camera index
    obs_pt: jnp.ndarray  # [O] int32 point index
    obs_uv: jnp.ndarray  # [O, 2] float32
    obs_inv_sigma2: jnp.ndarray  # [O] float32
    obs_valid: jnp.ndarray  # [O] bool


class BAResult(NamedTuple):
    cam_Tcw: jnp.ndarray
    pts_w: jnp.ndarray
    obs_inlier: jnp.ndarray  # [O] bool — chi2-gated
    chi2: jnp.ndarray  # [O] float32


def _residuals(K, cam_Tcw, pts_w, obs_cam, obs_pt, obs_uv):
    """Per-observation residual r = uv - proj, jacobians Jc [O,2,6], Jp [O,2,3], depth z."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    T = cam_Tcw[obs_cam]  # [O, 4, 4]
    p = pts_w[obs_pt]  # [O, 3]
    pc = se3.se3_apply(T, p)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    r = obs_uv - jnp.stack([u, v], axis=-1)

    du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * y * iz2], axis=-1)
    dproj = jnp.stack([du, dv], axis=-2)  # [O, 2, 3]
    # pose perturbation T <- exp(xi) T : d(pc)/dxi = [I | -hat(pc)]
    o = pc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (o, 3, 3))
    dpc_dxi = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [O, 3, 6]
    Jc = jnp.einsum("oij,ojk->oik", dproj, dpc_dxi, precision=_HI)
    # point perturbation: d(pc)/dp = R
    Jp = jnp.einsum("oij,ojk->oik", dproj, T[:, :3, :3], precision=_HI)
    return r, Jc, Jp, z


def _spd_inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 SPD inverse via adjugate (fast, no pivoting needed)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    inv = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([B, a * f - c * c, c * b - a * e], axis=-1),
            jnp.stack([C, c * b - a * e, a * d - b * b], axis=-1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def _ba_iteration(K, cam_Tcw, pts_w, prob: BAProblem, active, lam, use_huber, allreduce=None):
    """One damped-GN step. Returns (new_cams, new_pts, chi2_total_old).

    `allreduce` (optional) sums block contributions across an observation-
    sharded mesh axis (jax.lax.psum inside shard_map) — the distributed Schur
    BA of SURVEY.md §2.4 P7: each chip reduces its observation shard, the
    normal equations are psum-reduced, and the (small) reduced camera system
    is solved replicated on every chip.
    """
    C = cam_Tcw.shape[0]
    P = pts_w.shape[0]
    r, Jc, Jp, z = _residuals(K, cam_Tcw, pts_w, prob.obs_cam, prob.obs_pt, prob.obs_uv)
    w_info = prob.obs_inv_sigma2
    chi2 = jnp.sum(r * r, axis=-1) * w_info
    rho_w = jnp.where(use_huber & (chi2 > CHI2_MONO), HUBER_DELTA / jnp.sqrt(chi2 + 1e-12), 1.0)
    w = w_info * rho_w * active * (z > 0)

    # zero jacobians of fixed cameras so their updates vanish
    cam_free = (~prob.cam_fixed) & prob.cam_valid
    Jc = Jc * cam_free[prob.obs_cam].astype(Jc.dtype)[:, None, None]

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]

    # Hcc diag blocks [C, 6, 6] and gradient [C, 6]
    Hcc = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", wJc, Jc, precision=_HI), prob.obs_cam, num_segments=C
    )
    gc = jax.ops.segment_sum(
        jnp.einsum("oik,oi->ok", wJc, r, precision=_HI), prob.obs_cam, num_segments=C
    )
    # Hpp diag blocks [P, 3, 3], gp [P, 3]
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", wJp, Jp, precision=_HI), prob.obs_pt, num_segments=P
    )
    gp = jax.ops.segment_sum(
        jnp.einsum("oik,oi->ok", wJp, r, precision=_HI), prob.obs_pt, num_segments=P
    )
    # camera-point coupling, densified: [C, P, 6, 3] via segment over combined id
    Hcp_blocks = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", wJc, Jp, precision=_HI),
        prob.obs_cam * P + prob.obs_pt,
        num_segments=C * P,
    ).reshape(C, P, 6, 3)

    if allreduce is not None:
        Hcc = allreduce(Hcc)
        gc = allreduce(gc)
        Hpp = allreduce(Hpp)
        gp = allreduce(gp)
        Hcp_blocks = allreduce(Hcp_blocks)

    # LM damping
    lamI6 = lam * jnp.eye(6)
    lamI3 = lam * jnp.eye(3)
    Hcc = Hcc + lamI6[None] + 1e-8 * jnp.eye(6)[None]
    Hpp = Hpp + lamI3[None] + 1e-8 * jnp.eye(3)[None]
    Hpp_inv = _spd_inv3(Hpp) * prob.pts_valid[:, None, None]

    # Schur: S = Hcc_full - B Hpp^-1 B^T with B = [6C, 3P]
    B = Hcp_blocks.transpose(0, 2, 1, 3).reshape(C * 6, P * 3)
    HppinvBT = jnp.einsum("pkl,cpjl->cpjk", Hpp_inv, Hcp_blocks, precision=_HI)
    HppinvBT_m = HppinvBT.transpose(1, 3, 0, 2).reshape(P * 3, C * 6)
    S = -jnp.matmul(B, HppinvBT_m, precision=_HI)
    S = S.reshape(C, 6, C, 6)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
    S = S.reshape(C * 6, C * 6)
    gp_tilde = jnp.einsum("pkl,pl->pk", Hpp_inv, gp, precision=_HI)  # Hpp^-1 gp
    g_s = gc.reshape(-1) - jnp.matmul(B, gp_tilde.reshape(-1), precision=_HI)

    # fixed/invalid cameras: identity rows to pin dx = 0
    free6 = jnp.repeat(cam_free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    g_s = jnp.where(free6, g_s, 0.0)

    dxc = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S + 1e-8 * jnp.eye(C * 6)), g_s
    ).reshape(C, 6)
    # back-substitute points: dp = Hpp^-1 (gp - B^T dxc)
    Bt_dxc = jnp.einsum("cpkl,ck->pl", Hcp_blocks, dxc, precision=_HI)
    dp = jnp.einsum("pkl,pl->pk", Hpp_inv, gp - Bt_dxc, precision=_HI)
    dp = dp * prob.pts_valid[:, None]

    new_cams = jnp.where(
        cam_free[:, None, None], se3.se3_compose(se3.batched_se3_exp(dxc), cam_Tcw), cam_Tcw
    )
    new_pts = pts_w + dp
    chi2_total = jnp.sum(chi2 * active * (z > 0))
    return new_cams, new_pts, chi2_total


def _chi2_of(K, cam_Tcw, pts_w, prob):
    r, _, _, z = _residuals(K, cam_Tcw, pts_w, prob.obs_cam, prob.obs_pt, prob.obs_uv)
    return jnp.sum(r * r, axis=-1) * prob.obs_inv_sigma2, z


# robust cost charged per active observation that a candidate state made
# degenerate (behind the camera or non-finite) — far above any healthy rho
_DEGENERATE_COST = 1e4


def _robust_total(chi2, active, z):
    """Huber-robustified chi2 total (g2o robust_kernel_impl.cpp): rho(x) = x
    for x <= delta^2, else 2*delta*sqrt(x) - delta^2. LM accept decisions MUST
    use this, not the raw total: with raw chi2, crushing one gross outlier
    (chi2 ~1e5) 'pays for' pushing every healthy observation to chi2 ~10e1 and
    the solve walks away from the consensus geometry (observed on a healthy
    3764-obs local BA: median initial chi2 0.05, final inliers 0).

    Degenerate observations (z <= 0 or non-finite chi2 — e.g. the NaN state a
    Cholesky of an indefinite Schur complement produces) are charged a LARGE
    cost instead of being masked to zero: a zero mask makes 'every point
    behind the camera' the global optimum of the accept criterion, and an
    all-NaN step gets accepted at total 0. With the penalty, such steps are
    rejected and the LM loop self-heals by raising the damping."""
    d2 = CHI2_MONO
    ok = active & (z > 0) & jnp.isfinite(chi2)
    rho = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2)
    total = jnp.sum(jnp.where(ok, rho, 0.0))
    n_degen = jnp.sum(active & ~ok)
    return total + n_degen.astype(jnp.float32) * _DEGENERATE_COST


@functools.partial(jax.jit, static_argnames=("iters1", "iters2"))
def bundle_adjust(prob: BAProblem, iters1: int = 5, iters2: int = 10) -> BAResult:
    """Two-phase BA mirroring Optimizer::LocalBundleAdjustment: `iters1` robust
    iterations, chi2 gating of outlier observations, then `iters2` iterations
    on inliers with the Huber kernel still active (the reference drops the
    kernel only at the final recollection; keeping it is strictly more robust).
    """
    K = prob.K
    active0 = prob.obs_valid & prob.pts_valid[prob.obs_pt] & prob.cam_valid[prob.obs_cam]

    def phase(cam, pts, active, n_iters, use_huber):
        def body(carry, _):
            cam, pts, lam, best_chi2 = carry
            new_cam, new_pts, _ = _ba_iteration(
                K, cam, pts, prob, active.astype(jnp.float32), lam, use_huber
            )
            chi2_new, z = _chi2_of(K, new_cam, new_pts, prob)
            total_new = _robust_total(chi2_new, active, z)
            improved = total_new < best_chi2
            cam = jnp.where(improved, new_cam, cam)
            pts = jnp.where(improved, new_pts, pts)
            lam = jnp.where(improved, lam * 0.5, lam * 5.0)
            best_chi2 = jnp.minimum(best_chi2, total_new)
            return (cam, pts, lam, best_chi2), None

        chi2_0, z0 = _chi2_of(K, cam, pts, prob)
        total0 = _robust_total(chi2_0, active, z0)
        (cam, pts, _, _), _ = jax.lax.scan(
            body, (cam, pts, jnp.float32(1e-4), total0), None, length=n_iters
        )
        return cam, pts

    cam, pts = phase(prob.cam_Tcw, prob.pts_w, active0, iters1, jnp.asarray(True))
    chi2, z = _chi2_of(K, cam, pts, prob)
    active1 = active0 & (chi2 <= CHI2_MONO) & (z > 0)
    cam, pts = phase(cam, pts, active1, iters2, jnp.asarray(True))
    chi2, z = _chi2_of(K, cam, pts, prob)
    inlier = active0 & (chi2 <= CHI2_MONO) & (z > 0)
    return BAResult(cam_Tcw=cam, pts_w=pts, obs_inlier=inlier, chi2=chi2)
