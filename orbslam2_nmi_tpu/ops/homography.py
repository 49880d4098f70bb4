"""Rotation-hypothesis image warping for the NMI search.

Replaces the reference's Image class (Thirdparty/Localization/image.cpp:33-285):
it builds numWarp^3 homographies H = K Rz Ry Rx K^-1 (image.cpp:76-108) and
warps the live camera frame with cv::cuda::warpPerspective into preallocated
GpuMats (image.cpp:115-128). Here the whole rotation grid is one vmapped
inverse-warp bilinear sample — a single fused XLA kernel, no per-warp dispatch.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

from orbslam2_nmi_tpu.geometry import se3

_HI = jax.lax.Precision.HIGHEST


def rotation_grid_angles(warp_num: tuple[int, int, int], warp_step: tuple[float, float, float]) -> jnp.ndarray:
    """[R, 3] angles (ax, ay, az) for the full rotation grid, centered on zero.

    Grid index ordering matches the reference rating layout: index
    r = (wz * numWarpY + wy) * numWarpX + wx, with each axis spanning
    (i - (n-1)/2) * step  (image.cpp:76-108 center-offset convention).
    """
    nx, ny, nz = warp_num
    sx, sy, sz = warp_step
    ax = (jnp.arange(nx) - (nx - 1) / 2.0) * sx
    ay = (jnp.arange(ny) - (ny - 1) / 2.0) * sy
    az = (jnp.arange(nz) - (nz - 1) / 2.0) * sz
    AZ, AY, AX = jnp.meshgrid(az, ay, ax, indexing="ij")  # [nz, ny, nx]
    return jnp.stack([AX.reshape(-1), AY.reshape(-1), AZ.reshape(-1)], axis=-1)


def homographies_from_angles(K: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """[R, 3] Euler angles -> [R, 3, 3] homographies H = K Rz Ry Rx K^-1."""

    def one(a):
        Rx = se3.so3_exp(jnp.array([1.0, 0.0, 0.0]) * a[0])
        Ry = se3.so3_exp(jnp.array([0.0, 1.0, 0.0]) * a[1])
        Rz = se3.so3_exp(jnp.array([0.0, 0.0, 1.0]) * a[2])
        R = jnp.matmul(jnp.matmul(Rz, Ry, precision=_HI), Rx, precision=_HI)
        return jnp.matmul(jnp.matmul(K, R, precision=_HI), jnp.linalg.inv(K), precision=_HI)

    return jax.vmap(one)(angles)


def warp_bilinear(img: jnp.ndarray, H: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Inverse-warp a [H, W] image by 3x3 homography (dst->src uses H^-1)."""
    h, w = img.shape
    Hi = jnp.linalg.inv(H)
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    denom = Hi[2, 0] * xs + Hi[2, 1] * ys + Hi[2, 2]
    denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    u = (Hi[0, 0] * xs + Hi[0, 1] * ys + Hi[0, 2]) / denom
    v = (Hi[1, 0] * xs + Hi[1, 1] * ys + Hi[1, 2]) / denom

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u0i = jnp.clip(u0.astype(jnp.int32), 0, w - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
    u1i = jnp.clip(u0i + 1, 0, w - 1)
    v1i = jnp.clip(v0i + 1, 0, h - 1)
    # flat 1-D takes lower to much better TPU gathers than 2-D advanced indexing
    f = img.astype(jnp.float32).reshape(-1)
    base0 = v0i * w
    base1 = v1i * w
    val = (
        jnp.take(f, base0 + u0i) * (1 - du) * (1 - dv)
        + jnp.take(f, base0 + u1i) * du * (1 - dv)
        + jnp.take(f, base1 + u0i) * (1 - du) * dv
        + jnp.take(f, base1 + u1i) * du * dv
    )
    return jnp.where(inb, val, fill)


# ---------------------------------------------------------------------------
# Gather-free two-pass warp (TPU fast path)
# ---------------------------------------------------------------------------
#
# XLA's per-pixel gather is the wrong primitive on TPU (measured: 27 warps of
# 960x540 cost ~380 ms device time and minutes of compile). Small-rotation
# homographies admit a separable decomposition instead: resample columns
# (vertical pass) then rows (horizontal pass), each with a per-pixel FLOAT
# source offset realized as a bank of STATIC rolls + selects — pure VPU work,
# no gathers. The vertical-pass source is Catmull-Smith-corrected (evaluated
# at x - du) so the composition matches the true homography to second order
# (sub-0.1 px over the NMI rotation grids, whose shifts are bounded by
# ~ f*angle + angle*W/2 ~= tens of pixels).


def _shift_resample(img: jnp.ndarray, src: jnp.ndarray, axis: int, k_min: int, k_max: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Resample along `axis`: out[i] = img[src[i]] (bilinear), where
    src - i is within [k_min, k_max]. Returns (values, in_range_mask)."""
    n = img.shape[axis]
    idx = jnp.arange(img.shape[0])[:, None] if axis == 0 else jnp.arange(img.shape[1])[None, :]
    shift = src - idx
    k0 = jnp.floor(shift).astype(jnp.int32)
    frac = shift - k0
    acc0 = jnp.zeros_like(img)
    acc1 = jnp.zeros_like(img)
    for k in range(k_min, k_max + 1):
        rolled = jnp.roll(img, -k, axis=axis)
        acc0 = acc0 + jnp.where(k0 == k, rolled, 0.0)
        acc1 = acc1 + jnp.where(k0 + 1 == k, rolled, 0.0)
    out = acc0 * (1.0 - frac) + acc1 * frac
    ok = (src >= 0) & (src <= n - 1) & (k0 >= k_min) & (k0 + 1 <= k_max)
    return out, ok


def warp_two_pass(img: jnp.ndarray, H: jnp.ndarray, max_shift: int, fill: float = 0.0) -> jnp.ndarray:
    """Homography warp without gathers (see module comment). `max_shift` is a
    STATIC bound on |source - dest| per axis."""
    h, w = img.shape
    Hi = jnp.linalg.inv(H)
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    def src_uv(x, y):
        denom = Hi[2, 0] * x + Hi[2, 1] * y + Hi[2, 2]
        denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        u = (Hi[0, 0] * x + Hi[0, 1] * y + Hi[0, 2]) / denom
        v = (Hi[1, 0] * x + Hi[1, 1] * y + Hi[1, 2]) / denom
        return u, v

    u, v = src_uv(xs, ys)
    inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    du = u - xs
    # Catmull-Smith correction: the vertical pass must fetch the row the
    # HORIZONTAL source will need — evaluate v at x' = x - du
    _, v_corr = src_uv(xs - du, ys)

    mv, mh = (max_shift if isinstance(max_shift, tuple) else (max_shift, max_shift))
    tmp, ok_v = _shift_resample(img, v_corr, axis=0, k_min=-mv, k_max=mv)
    out, ok_u = _shift_resample(tmp, u, axis=1, k_min=-mh, k_max=mh)
    return jnp.where(inb & ok_v & ok_u, out, fill)


def shift_bounds_for_angles(
    K: np.ndarray, angles: np.ndarray, height: int, width: int
) -> tuple[int, int]:
    """Static (vertical, horizontal) pixel-shift bounds for a rotation grid.

    Rotation about x moves pixels vertically (~fy*ax), about y horizontally
    (~fx*ay), about z tangentially (~az * corner radius per axis); small
    projective terms are covered by the margin.
    """
    K = np.asarray(K)
    a = np.abs(np.asarray(angles))
    ax, ay, az = a[:, 0].max(initial=0), a[:, 1].max(initial=0), a[:, 2].max(initial=0)
    fx, fy = float(K[0, 0]), float(K[1, 1])
    cx, cy = float(K[0, 2]), float(K[1, 2])
    half_w = max(cx, width - cx)
    half_h = max(cy, height - cy)
    vert = fy * ax * 1.2 + az * half_w + 3.0
    horiz = fx * ay * 1.2 + az * half_h + 3.0
    return int(np.ceil(vert)), int(np.ceil(horiz))


def shift_bound_for_angles(K: np.ndarray, angles: np.ndarray, height: int, width: int) -> int:
    """Joint bound (max of the per-axis bounds), kept for compatibility."""
    v, h = shift_bounds_for_angles(K, angles, height, width)
    return max(v, h)


def warp_rotation_grid(
    img: jnp.ndarray, K: jnp.ndarray, angles: jnp.ndarray, max_two_pass_shift: int = 64
) -> jnp.ndarray:
    """Warp `img` by every rotation hypothesis. Returns [R, H, W] float32.

    One fused dispatch for the whole grid (reference does R separate
    cv::cuda::warpPerspective calls, image.cpp:115-128). Uses the gather-free
    two-pass path when `angles` is concrete and the shift bound is small
    enough; falls back to the exact bilinear-gather warp otherwise.
    """
    use_two_pass = False
    bound = (0, 0)
    if not isinstance(angles, jax.core.Tracer):
        bound = shift_bounds_for_angles(np.asarray(K), np.asarray(angles), *img.shape)
        use_two_pass = max(bound) <= max_two_pass_shift

    Hs = homographies_from_angles(K, angles)
    if use_two_pass:
        return _warp_grid_two_pass_jit(img, Hs, bound)
    return _warp_grid_gather_jit(img, Hs)


@functools.partial(jax.jit, static_argnames=("max_shift",))
def _warp_grid_two_pass_jit(img, Hs, max_shift: int):
    return jax.vmap(lambda H: warp_two_pass(img, H, max_shift))(Hs)


@jax.jit
def _warp_grid_gather_jit(img, Hs):
    return jax.vmap(lambda H: warp_bilinear(img, H))(Hs)
