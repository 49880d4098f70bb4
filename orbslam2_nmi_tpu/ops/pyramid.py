"""Image pyramid + separable Gaussian blur.

Replaces the reference's ORBextractor::ComputePyramid (src/ORBextractor.cc:1114,
cv::resize bilinear, 8 levels, scale 1.2) and the pre-descriptor
GaussianBlur(7x7, sigma=2) at src/ORBextractor.cc:1092. All static shapes:
level sizes are Python ints derived from config, so one jit covers a sequence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def level_sizes(height: int, width: int, n_levels: int, scale_factor: float):
    """Per-level (h, w) using the reference's round(size / scale^l) convention."""
    sizes = []
    for lvl in range(n_levels):
        inv = 1.0 / (scale_factor**lvl)
        sizes.append((int(round(height * inv)), int(round(width * inv))))
    return sizes


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of a [H, W] image, matching cv::resize's pixel-center
    alignment (src = (dst + 0.5) * scale - 0.5)."""
    h, w = img.shape
    scale_y = h / out_h
    scale_x = w / out_w
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * scale_y - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * scale_x - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = img[y0i][:, x0i] * (1 - wx)[None, :] + img[y0i][:, x1i] * wx[None, :]
    bot = img[y1i][:, x0i] * (1 - wx)[None, :] + img[y1i][:, x1i] * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def build_pyramid(
    img: jnp.ndarray, n_levels: int, scale_factor: float
) -> list[jnp.ndarray]:
    """[H, W] float32 -> list of n_levels float32 arrays, level 0 == input.

    Like the reference, each level is resized from the previous one (cumulative
    bilinear), not from level 0 — keeps the anti-aliasing behavior similar.
    """
    h, w = img.shape
    sizes = level_sizes(h, w, n_levels, scale_factor)
    levels = [img.astype(jnp.float32)]
    for lvl in range(1, n_levels):
        lh, lw = sizes[lvl]
        levels.append(resize_bilinear(levels[-1], lh, lw))
    return levels


@functools.lru_cache(maxsize=8)
def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with REFLECT_101 border (cv default), [H, W] float32."""
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    r = ksize // 2
    # reflect-101 padding: edge pixel not duplicated
    p = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # horizontal then vertical via conv on the 2 spatial dims
    # fast precision opt-in: image blur tolerates bf16 accumulation and the
    # package default is HIGHEST (see orbslam2_nmi_tpu/__init__.py)
    fast = jax.lax.Precision.DEFAULT
    out = jax.lax.conv_general_dilated(
        p[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=fast,
    )
    out = jax.lax.conv_general_dilated(
        out,
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=fast,
    )
    return out[0, 0]
