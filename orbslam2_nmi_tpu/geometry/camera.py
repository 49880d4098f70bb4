"""Pinhole camera model: projection, unprojection, undistortion.

Replaces the reference's per-frame OpenCV undistort (Frame::UndistortKeyPoints,
reference: src/Frame.cc:442) and the frustum check (Frame::isInFrustum,
src/Frame.cc:308) with batched jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def project(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame 3-D points [..., 3] to pixels [..., 2]."""
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = K[0, 0] * pts_cam[..., 0] * inv_z + K[0, 2]
    v = K[1, 1] * pts_cam[..., 1] * inv_z + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def unproject(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] + depth [...] -> camera-frame 3-D points [..., 3]."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion (k1,k2,p1,p2,k3) to normalized coords."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(K: jnp.ndarray, dist: jnp.ndarray, uv: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Iterative undistortion (cv::undistortPoints equivalent) of pixel coords.

    Fixed-point iteration x <- (xd - delta(x)) — the standard OpenCV scheme,
    unrolled a static `iters` times so it jits with no dynamic control flow.
    """
    x0 = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y0 = (uv[..., 1] - K[1, 2]) / K[1, 1]
    xd = jnp.stack([x0, y0], axis=-1)
    xy = xd
    for _ in range(iters):
        d = distort_normalized(xy, dist) - xy
        xy = xd - d
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def compute_image_bounds(K: np.ndarray, dist: np.ndarray, width: int, height: int):
    """Undistorted image bounds (Frame::ComputeImageBounds, src/Frame.cc:~470)."""
    if not np.any(np.abs(dist) > 0):
        return 0.0, float(width), 0.0, float(height)
    corners = jnp.array(
        [[0.0, 0.0], [width, 0.0], [0.0, height], [width, height]], dtype=jnp.float32
    )
    und = np.asarray(undistort_points(jnp.asarray(K), jnp.asarray(dist), corners))
    return (
        float(min(und[0, 0], und[2, 0])),
        float(max(und[1, 0], und[3, 0])),
        float(min(und[0, 1], und[1, 1])),
        float(max(und[2, 1], und[3, 1])),
    )
