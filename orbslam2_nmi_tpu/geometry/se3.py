"""SO(3)/SE(3)/Sim(3) operations in JAX.

The TPU-native replacement for the reference's Converter.cc (cv::Mat <-> Eigen <->
g2o::SE3Quat, reference: src/Converter.cc:30-155) and for g2o's se3quat.h /
sim3.h Lie-group machinery. Everything is pure-functional jnp, batched via vmap.

Conventions:
  * Rotations as 3x3 matrices or quaternions [w, x, y, z] (Hamilton).
  * Poses Tcw are 4x4 world->camera transforms (ORB-SLAM2 convention).
  * Tangent vectors for SE(3) are [rho(3), phi(3)] = [trans, rot] like g2o.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Pose math must be exact f32: TPU matmuls default to bf16 inputs, which costs
# ~1e-3 error on a 4x4 compose — unacceptable for SLAM geometry. All matrix
# products in this module go through _mm / high-precision einsum.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HIGHEST)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle 3-vector -> 3x3 rotation. Safe at ||w|| -> 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # Taylor-safe coefficients
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * _mm(W, W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation -> axis-angle 3-vector. Safe near identity and pi."""
    trace = jnp.trace(R) if R.ndim == 2 else jnp.einsum("...ii->...", R)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # vee of the antisymmetric part; |v| = 2 sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # sqrt is guarded so autodiff through the identity rotation stays finite
    # (jnp.where does not protect gradients of the untaken branch)
    sin_theta = 0.5 * jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)
    # atan2 form is well-conditioned over the whole range except theta ~ pi
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = sin_theta < 1e-5
    near_pi = jnp.logical_and(small, cos_theta < 0.0)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, 0.5 * theta / jnp.where(small, 1.0, sin_theta))
    w_generic = v * scale[..., None]
    # Near pi: use diagonal extraction
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / jnp.maximum(1.0 - cos_theta[..., None], _EPS), 0.0, None)
    axis = jnp.sqrt(axis_sq + 1e-24)
    # fix signs from off-diagonals
    s0 = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    s1 = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    s2 = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis = axis * jnp.stack([s0, s1, s2], axis=-1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# ---------------------------------------------------------------------------
# Quaternions [w, x, y, z]
# ---------------------------------------------------------------------------


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion [w,x,y,z], branchless (Shepperd's method)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1)

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1)

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1)

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1)

    c0, c1, c2, c3 = case0(), case1(), case2(), case3()
    use0 = tr > 0
    use1 = jnp.logical_and(~use0, jnp.logical_and(m00 >= m11, m00 >= m22))
    use2 = jnp.logical_and(~use0, jnp.logical_and(~use1, m11 >= m22))
    q = jnp.where(
        use0[..., None], c0, jnp.where(use1[..., None], c1, jnp.where(use2[..., None], c2, c3))
    )
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# SE(3) as 4x4 matrices
# ---------------------------------------------------------------------------


def make_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble 4x4 from 3x3 R and 3-vector t. Batched."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HIGHEST))


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent [rho, phi] -> 4x4 (g2o SE3Quat::exp ordering: trans first)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(phi)
    W2 = _mm(W, W)
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (1.0 - a) / theta2, 1.0 / 6.0 - theta2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho, precision=_HIGHEST)
    return make_se3(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 -> [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(phi)
    W2 = _mm(W, W)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (1.0 - jnp.sin(theta) / theta) / theta2, 1.0 / 6.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform to 3-points ([..., 3])."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], p, precision=_HIGHEST) + T[..., :3, 3]


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return _mm(A, B)


# ---------------------------------------------------------------------------
# Sim(3) — for loop closing (reference: g2o sim3.h, Sim3Solver.cc)
# ---------------------------------------------------------------------------


def make_sim3(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Assemble 4x4 [sR t; 0 1]."""
    return make_se3(R * s[..., None, None], t)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    s2 = jnp.sum(sR[..., 0, :] * sR[..., 0, :], axis=-1)  # |s*row|^2 = s^2
    inv_s2 = 1.0 / jnp.maximum(s2, _EPS)
    sRinv = jnp.swapaxes(sR, -1, -2) * inv_s2[..., None, None]  # (1/s) R^T
    return make_se3(sRinv, -jnp.einsum("...ij,...j->...i", sRinv, t, precision=_HIGHEST))


def sim3_apply(S: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", S[..., :3, :3], p, precision=_HIGHEST) + S[..., :3, 3]


def sim3_scale(S: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(S[..., :3, 0], axis=-1)


def _sim3_w_matrix(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The sim(3) 'W' matrix with t = W rho (Strasdat's closed form, the math
    behind g2o sim3.h): W = C I + A hat(phi) + B hat(phi)^2 with smooth
    coefficient limits for jit."""
    s = jnp.exp(sigma)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(phi)
    W2 = _mm(W, W)

    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)

    C = jnp.where(small_sig, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)
    a_ss = jnp.full_like(C, 0.5)  # sigma ~ 0, theta ~ 0
    b_ss = jnp.full_like(C, 1.0 / 6.0)
    a_sl = (1.0 - jnp.cos(th_safe)) / jnp.maximum(theta2, _EPS)  # sigma ~ 0
    b_sl = (th_safe - jnp.sin(th_safe)) / jnp.maximum(theta2 * th_safe, _EPS)
    a_ls = ((sig_safe - 1.0) * s + 1.0) / jnp.maximum(sig_safe**2, _EPS)  # theta ~ 0
    b_ls = ((0.5 * sig_safe**2 - sig_safe + 1.0) * s - 1.0) / jnp.maximum(sig_safe**3, _EPS)
    aa = s * jnp.sin(th_safe)
    bb = s * jnp.cos(th_safe)
    cc = theta2 + sigma * sigma
    a_ll = (aa * sig_safe + (1.0 - bb) * th_safe) / jnp.maximum(th_safe * cc, _EPS)
    b_ll = (C - ((bb - 1.0) * sig_safe + aa * th_safe) / jnp.maximum(cc, _EPS)) / jnp.maximum(
        theta2, _EPS
    )
    A = jnp.where(small_th, jnp.where(small_sig, a_ss, a_ls), jnp.where(small_sig, a_sl, a_ll))
    B = jnp.where(small_th, jnp.where(small_sig, b_ss, b_ls), jnp.where(small_sig, b_sl, b_ll))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """sim(3) tangent [rho(3), phi(3), sigma(1)] -> 4x4 [sR t; 0 1]."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    Wm = _sim3_w_matrix(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", Wm, rho, precision=_HIGHEST)
    return make_sim3(R, t, jnp.exp(sigma))


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """4x4 sim3 -> [rho, phi, sigma]. Inverse of sim3_exp."""
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    t = S[..., :3, 3]
    phi = so3_log(R)
    sigma = jnp.log(jnp.maximum(s, _EPS))
    Wm = _sim3_w_matrix(phi, sigma)
    rho = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# Batched convenience
batched_se3_exp = jax.vmap(se3_exp)
batched_se3_apply = jax.vmap(se3_apply, in_axes=(0, 0))
