"""Pose-only optimization: motion-only bundle adjustment for one frame.

TPU-native replacement for Optimizer::PoseOptimization (reference:
src/Optimizer.cc:251): g2o Levenberg with a single SE3 vertex, monocular
reprojection edges, Huber kernel delta=sqrt(5.991), 4 rounds x 10 iterations
with chi2-5.991 outlier gating between rounds (Optimizer.cc:380-460) — here as
a fixed-shape IRLS Levenberg-Marquardt on the 6-DoF tangent, everything masked,
no dynamic shapes. The 6x6 normal equations are built by one einsum over all
observations (VPU/MXU), solved host-free with Cholesky.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam2_nmi_tpu.geometry import se3

CHI2_MONO = 5.991
HUBER_DELTA = jnp.sqrt(CHI2_MONO)


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray  # [4, 4] optimized pose
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # int32
    chi2: jnp.ndarray  # [N] float32 final per-edge chi2


def _reproj_residuals_jac(Tcw, pts_w, uv, fx, fy, cx, cy):
    """Residuals e = uv_obs - proj(T p) and Jacobian de/dxi, xi=[rho, phi].

    Analytic monocular jacobian (same math as g2o types_six_dof_expmap.cpp
    EdgeSE3ProjectXYZOnlyPose::linearizeOplus, with our sign convention
    e = obs - proj and perturbation T <- exp(xi) * T).
    """
    pc = se3.se3_apply(Tcw, pts_w)  # [N, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u = fx * x * iz + cx
    v = fy * y * iz + cy
    e = jnp.stack([u, v], axis=-1)

    # d(proj)/d(pc): [N, 2, 3]
    du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * y * iz2], axis=-1)
    dproj = jnp.stack([du, dv], axis=-2)
    # d(pc)/dxi with pc = exp(xi) * (R p + t):  [I, -hat(pc)]
    n = pc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (n, 3, 3))
    dpc = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [N, 3, 6]
    J = jnp.einsum("nij,njk->nik", dproj, dpc,
                   precision=jax.lax.Precision.HIGHEST)  # [N, 2, 6] = d(proj)/dxi
    return e, J, z


def pose_optimization_k(
    K: jnp.ndarray,
    Tcw0: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    rounds: int = 4,
    iters: int = 10,
) -> PoseOptResult:
    """PoseOptimization with explicit intrinsics. See module docstring.

    Between rounds, edges with chi2 > 5.991 are marked outliers and excluded;
    previously excluded edges are re-tested and can return (Optimizer.cc:418-438).
    The Huber kernel is active in rounds 0..1 and disabled for inlier-only
    refinement afterwards (the reference sets edges outlier-free at round>=3;
    we keep Huber off in the last two rounds like g2o's setRobustKernel(0)).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    obs = uv

    def lm_round(Tcw, use_mask, use_huber):
        lam0 = jnp.float32(1e-4)
        w_info_mask = use_mask

        def body(carry, _):
            Tcw, lam = carry
            e_proj, J, z = _reproj_residuals_jac(Tcw, pts_w, obs, fx, fy, cx, cy)
            r = obs - e_proj  # residual [N, 2]
            w_info = inv_sigma2  # [N]
            chi2 = jnp.sum(r * r, axis=-1) * w_info
            # Huber IRLS weight on top of the information weight
            rho_w = jnp.where(
                use_huber & (chi2 > CHI2_MONO), HUBER_DELTA / jnp.sqrt(chi2 + 1e-12), 1.0
            )
            w = w_info * rho_w * use_mask * (z > 0)
            # normal equations: H = J^T W J (note J maps dxi -> dproj; dr = -J dxi)
            # HIGHEST: bf16 normal equations bias the GN step on TPU
            H = jnp.einsum("nik,n,nil->kl", J, w, J, precision=jax.lax.Precision.HIGHEST)
            g = jnp.einsum("nik,n,ni->k", J, w, r, precision=jax.lax.Precision.HIGHEST)
            # solve (H + lam diag(H)) dxi = g ; update T <- exp(-dxi)... sign:
            # r = obs - proj, dr/dxi = -J => GN step solves J^T W J dxi = J^T W r
            H_lm = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            dxi = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H_lm), g)
            T_new = se3.se3_compose(se3.se3_exp(dxi), Tcw)
            # accept if total chi2 decreased (cheap LM accept/reject)
            e2, _, z2 = _reproj_residuals_jac(T_new, pts_w, obs, fx, fy, cx, cy)
            r2 = obs - e2
            chi2_new = jnp.sum(jnp.sum(r2 * r2, axis=-1) * w_info * use_mask * (z2 > 0))
            chi2_old = jnp.sum(chi2 * w_info_mask)
            improved = chi2_new < chi2_old
            Tcw = jnp.where(improved, T_new, Tcw)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            return (Tcw, lam), None

        (Tcw, _), _ = jax.lax.scan(body, (Tcw, lam0), None, length=iters)
        return Tcw

    def chi2_of(Tcw):
        e_proj, _, z = _reproj_residuals_jac(Tcw, pts_w, obs, fx, fy, cx, cy)
        r = obs - e_proj
        return jnp.sum(r * r, axis=-1) * inv_sigma2, z

    Tcw = Tcw0
    inlier = valid
    for rnd in range(rounds):
        use_huber = jnp.asarray(rnd < 2)
        Tcw = lm_round(Tcw, inlier.astype(jnp.float32), use_huber)
        chi2, z = chi2_of(Tcw)
        # re-gate ALL originally valid edges (outliers may be rescued)
        inlier = valid & (chi2 <= CHI2_MONO) & (z > 0)

    chi2, z = chi2_of(Tcw)
    return PoseOptResult(
        Tcw=Tcw,
        inliers=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=chi2,
    )


pose_optimization_jit = jax.jit(
    pose_optimization_k, static_argnames=("rounds", "iters")
)
