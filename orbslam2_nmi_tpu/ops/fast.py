"""Vectorized FAST-9/16 corner detection.

TPU-native replacement for the per-cell cv::FAST calls in
ORBextractor::ComputeKeyPointsOctTree (reference: src/ORBextractor.cc:770).
Instead of scalar loops over 30x30 cells, the whole level is evaluated as one
dense bit-twiddling pass on the VPU:

  * the 16 Bresenham-circle neighbors are materialized by jnp.roll shifts,
  * bright/dark tests pack into a 16-bit mask per pixel,
  * the ">= 9 contiguous" test is `(m | m << 16) >> i & 0x1FF == 0x1FF`
    over the 16 rotations — no data-dependent control flow anywhere,
  * 3x3 non-max suppression on a SAD-style response.

The per-cell dual-threshold fallback (iniThFAST=20 -> minThFAST=7 when a cell
is empty, ORBextractor.cc:770-820) is reproduced with max-pooled cell masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, clockwise from 12 o'clock, as (drow, dcol).
# Same geometry as cv::FAST's offset table.
CIRCLE_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LENGTH = 9  # FAST-9
_ARC_MASK = (1 << ARC_LENGTH) - 1  # 0x1FF


def fast_response(img: jnp.ndarray, threshold: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense FAST-9 on a [H, W] float image.

    Returns (is_corner [H,W] bool, score [H,W] float32). Score is the sum of
    absolute threshold-exceeding differences on the dominant arc polarity —
    monotone in corner strength, used only for NMS/ranking.
    """
    center = img
    shifted = jnp.stack(
        [jnp.roll(img, (-dr, -dc), axis=(0, 1)) for dr, dc in CIRCLE_OFFSETS], axis=0
    )  # [16, H, W]; roll wraparound is masked out by the border crop below
    diff = shifted - center[None]
    bright = diff > threshold
    dark = diff < -threshold

    weights = jnp.asarray((1 << np.arange(16)).astype(np.int32))
    mb = jnp.sum(bright.astype(jnp.int32) * weights[:, None, None], axis=0)
    md = jnp.sum(dark.astype(jnp.int32) * weights[:, None, None], axis=0)

    def has_arc(m):
        ext = m | (m << 16)
        hit = jnp.zeros(m.shape, dtype=bool)
        for i in range(16):
            hit = hit | (((ext >> i) & _ARC_MASK) == _ARC_MASK)
        return hit

    corner = has_arc(mb) | has_arc(md)
    score_b = jnp.sum(jnp.where(bright, diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(dark, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)

    # kill the roll wraparound ring (3 px) — callers additionally crop the ORB
    # edge threshold
    h, w = img.shape
    ri = jnp.arange(h)[:, None]
    ci = jnp.arange(w)[None, :]
    interior = (ri >= 3) & (ri < h - 3) & (ci >= 3) & (ci < w - 3)
    return corner & interior, jnp.where(interior, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """True where score is a strict-enough 3x3 local max (ties broken by
    raster order to avoid dropping plateau corners entirely)."""
    neigh = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(3, 3),
        window_strides=(1, 1),
        padding="SAME",
    )
    return score >= neigh


def _cell_any_pool(mask: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Per-cell OR, broadcast back to pixel resolution. Pads to cell multiple."""
    h, w = mask.shape
    ph = (-h) % cell
    pw = (-w) % cell
    m = jnp.pad(mask, ((0, ph), (0, pw)))
    hc, wc = (h + ph) // cell, (w + pw) // cell
    cells = m.reshape(hc, cell, wc, cell).any(axis=(1, 3))
    back = jnp.repeat(jnp.repeat(cells, cell, axis=0), cell, axis=1)
    return back[:h, :w]


def detect_with_fallback(
    img: jnp.ndarray,
    ini_threshold: float,
    min_threshold: float,
    cell: int = 30,
    border: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FAST with the reference's per-cell threshold fallback.

    Cells that fired at ini_threshold keep only those corners; cells that
    didn't contribute their min_threshold corners (ORBextractor.cc:770-820).
    `border` crops the ORB edge region (EDGE_THRESHOLD-3 = 16 in the reference).
    Returns (corner mask after NMS, score).
    """
    corner_hi, score_hi = fast_response(img, ini_threshold)
    corner_lo, score_lo = fast_response(img, min_threshold)
    cell_has_hi = _cell_any_pool(corner_hi, cell)
    corner = jnp.where(cell_has_hi, corner_hi, corner_lo)
    score = jnp.where(cell_has_hi, score_hi, score_lo)

    h, w = img.shape
    ri = jnp.arange(h)[:, None]
    ci = jnp.arange(w)[None, :]
    inside = (ri >= border) & (ri < h - border) & (ci >= border) & (ci < w - border)
    corner = corner & inside

    score = jnp.where(corner, score, 0.0)
    keep = nms3x3(score) & corner
    return keep, jnp.where(keep, score, 0.0)
