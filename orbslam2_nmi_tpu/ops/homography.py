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


@functools.partial(jax.jit, static_argnames=())
def warp_rotation_grid(img: jnp.ndarray, K: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Warp `img` by every rotation hypothesis. Returns [R, H, W] float32.

    One fused dispatch for the whole grid (reference does R separate
    cv::cuda::warpPerspective calls, image.cpp:115-128).
    """
    Hs = homographies_from_angles(K, angles)
    return jax.vmap(lambda H: warp_bilinear(img, H))(Hs)
