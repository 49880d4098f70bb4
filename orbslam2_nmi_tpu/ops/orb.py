"""ORB keypoint extraction: oriented FAST + rotated BRIEF, fully batched.

TPU-native replacement for ORBextractor (reference: src/ORBextractor.cc:1048
`operator()`, :770 ComputeKeyPointsOctTree, :544 DistributeOctTree, :82 IC_Angle,
:113 computeOrbDescriptor). Design differences, on purpose:

  * The quadtree keypoint distribution becomes a per-cell-winner bonus + global
    top-k — deterministic, fixed-shape, no recursion. Spatial uniformity is
    enforced by giving each spatial cell's best corner priority before filling
    the remaining budget by response.
  * Intensity-centroid orientation is computed as two dense 31x31 convolutions
    (x*mask, y*mask kernels) over the level — MXU work — then gathered at
    keypoints, instead of per-keypoint patch loops.
  * rBRIEF sampling is one flat gather of [N, 512] rotated pattern points.

Descriptors are 256 bits packed as [N, 8] uint32, byte-compatible with the
reference's 32x uchar layout (pair 8i+k is bit k of byte i).
The 256-pair pattern is the stock ORB pattern table (loaded from
orb_pattern.npy, extracted from ORBextractor.cc:155-410 — shared numeric
constants required for descriptor parity).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.config import ORBConfig
from orbslam2_nmi_tpu.ops import fast as fast_ops
from orbslam2_nmi_tpu.ops import pyramid as pyr

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "orb_pattern.npy")

HALF_PATCH_SIZE = 15


class Features(NamedTuple):
    """Fixed-capacity feature set for one image (level-0 coordinates)."""

    xy: jnp.ndarray  # [N, 2] float32 (x, y) in level-0 pixels
    response: jnp.ndarray  # [N] float32
    angle: jnp.ndarray  # [N] float32 radians
    octave: jnp.ndarray  # [N] int32 pyramid level
    size: jnp.ndarray  # [N] float32 patch size at level scale
    desc: jnp.ndarray  # [N, 8] uint32 packed 256-bit rBRIEF
    valid: jnp.ndarray  # [N] bool

    @property
    def n(self) -> int:
        return self.xy.shape[0]


@functools.lru_cache(maxsize=1)
def load_pattern() -> np.ndarray:
    return np.load(_PATTERN_PATH)  # [256, 4] int32: x1, y1, x2, y2


@functools.lru_cache(maxsize=1)
def circle_umax() -> np.ndarray:
    """Max column extent per row of the radius-15 circular patch, with the
    symmetry fix-up (same construction as ORBextractor.cc:443-457)."""
    hp = HALF_PATCH_SIZE
    umax = np.zeros(hp + 1, dtype=np.int32)
    vmax = int(np.floor(hp * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(hp * np.sqrt(2.0) / 2))
    hp2 = hp * hp
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(hp, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


@functools.lru_cache(maxsize=1)
def _orientation_kernels() -> np.ndarray:
    """31x31 kernels [2, 1, 31, 31]: (x*mask, y*mask) over the umax circle."""
    hp = HALF_PATCH_SIZE
    umax = circle_umax()
    ys, xs = np.mgrid[-hp : hp + 1, -hp : hp + 1]
    mask = np.abs(xs) <= umax[np.minimum(np.abs(ys), hp)]
    kx = (xs * mask).astype(np.float32)
    ky = (ys * mask).astype(np.float32)
    return np.stack([kx[None], ky[None]], axis=0)  # [2, 1, 31, 31]


def orientation_maps(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (m10, m01) intensity-centroid moment maps via row prefix sums.

    A direct 31x31 convolution lowers terribly on TPU (~110 ms at 960x540);
    each circle row is a width-(2u+1) box filter instead, so with one x
    prefix sum C and one x-weighted prefix sum W per image:
        rowsum(y+dy, x; u)  = C[y+dy, x+u] - C[y+dy, x-u-1]
        rowxsum(y+dy, x; u) = (W[...] - W[...]) - x * rowsum
        m01 = sum_dy dy * rowsum,   m10 = sum_dy rowxsum
    31 shifted slices + elementwise math: ~1 ms, exact same result as the
    umax-circle kernels (ORBextractor.cc IC_Angle semantics).
    """
    hp = HALF_PATCH_SIZE
    umax = circle_umax()
    h, w = img.shape
    # pad so every (dy, +-u) slice is in range; prefix sums along x with a
    # leading zero column so box sums are two loads
    pad = hp + 1
    ip = jnp.pad(img, ((pad, pad), (pad, pad)))
    xs = jnp.arange(-pad, w + pad, dtype=jnp.float32)[None, :]
    C = jnp.cumsum(ip, axis=1)
    W = jnp.cumsum(ip * xs, axis=1)
    Cz = jnp.pad(C, ((0, 0), (1, 0)))
    Wz = jnp.pad(W, ((0, 0), (1, 0)))

    m10 = jnp.zeros((h, w), img.dtype)
    m01 = jnp.zeros((h, w), img.dtype)
    x0 = jnp.arange(w, dtype=jnp.float32)[None, :]
    for dy in range(-hp, hp + 1):
        u = int(umax[min(abs(dy), hp)])
        r0 = pad + dy
        # inclusive column window [x-u, x+u] in padded coords: x_pad = x + pad
        lo = pad - u  # start offset of (x - u) in the zero-padded prefix
        hi = pad + u + 1
        rowsum = Cz[r0 : r0 + h, hi : hi + w] - Cz[r0 : r0 + h, lo : lo + w]
        rowxsum = (
            Wz[r0 : r0 + h, hi : hi + w] - Wz[r0 : r0 + h, lo : lo + w]
        ) - x0 * rowsum
        m01 = m01 + float(dy) * rowsum
        m10 = m10 + rowxsum
    return m10, m01


def select_spatial_topk(
    score: jnp.ndarray, n_target: int, cell: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick up to n_target corners, preferring each cell's best (quadtree-like
    spatial spread, reference DistributeOctTree ORBextractor.cc:544), then
    filling by response. Returns (ys, xs, scores, valid) of length n_target."""
    h, w = score.shape
    ph = (-h) % cell
    pw = (-w) % cell
    s = jnp.pad(score, ((0, ph), (0, pw)))
    hc, wc = (h + ph) // cell, (w + pw) // cell
    cell_max = s.reshape(hc, cell, wc, cell).max(axis=(1, 3))
    cell_max_b = jnp.repeat(jnp.repeat(cell_max, cell, axis=0), cell, axis=1)[:h, :w]
    preferred = (score > 0) & (score >= cell_max_b)
    # key: preferred winners rank above everything else, then by score
    bonus = jnp.float32(1e9)
    key = jnp.where(score > 0, score + jnp.where(preferred, bonus, 0.0), -jnp.inf)
    topv, topi = jax.lax.top_k(key.reshape(-1), n_target)
    ys = (topi // w).astype(jnp.int32)
    xs = (topi % w).astype(jnp.int32)
    valid = topv > -jnp.inf
    scores = jnp.where(valid, score.reshape(-1)[topi], 0.0)
    return ys, xs, scores, valid


def compute_descriptors(
    blurred: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    angles: jnp.ndarray,
) -> jnp.ndarray:
    """rBRIEF for keypoints on one level. blurred: [H, W] float32.

    Sampling rule identical to computeOrbDescriptor (ORBextractor.cc:113):
      row offset = round(px*sin + py*cos), col offset = round(px*cos - py*sin).
    Returns [N, 8] uint32.
    """
    h, w = blurred.shape
    pat = jnp.asarray(load_pattern().astype(np.float32))  # [256, 4]
    a = jnp.cos(angles)[:, None]  # [N, 1]
    b = jnp.sin(angles)[:, None]
    px1, py1, px2, py2 = pat[:, 0][None], pat[:, 1][None], pat[:, 2][None], pat[:, 3][None]

    r1 = jnp.round(px1 * b + py1 * a).astype(jnp.int32) + ys[:, None]
    c1 = jnp.round(px1 * a - py1 * b).astype(jnp.int32) + xs[:, None]
    r2 = jnp.round(px2 * b + py2 * a).astype(jnp.int32) + ys[:, None]
    c2 = jnp.round(px2 * a - py2 * b).astype(jnp.int32) + xs[:, None]

    flat = blurred.reshape(-1)
    idx1 = jnp.clip(r1, 0, h - 1) * w + jnp.clip(c1, 0, w - 1)
    idx2 = jnp.clip(r2, 0, h - 1) * w + jnp.clip(c2, 0, w - 1)
    t0 = flat[idx1]
    t1 = flat[idx2]
    bits = (t0 < t1).astype(jnp.uint32)  # [N, 256]
    bits = bits.reshape(bits.shape[0], 8, 32)
    weights = jnp.asarray((np.uint32(1) << np.arange(32, dtype=np.uint32)))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def _distribution_cell(h: int, w: int, n_target: int) -> int:
    if n_target <= 0:
        return 16
    c = int(round(np.sqrt(h * w / n_target)))
    return int(np.clip(c, 8, 64))


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_orb(image_u8: jnp.ndarray, cfg: ORBConfig) -> Features:
    """Full ORB extraction on a [H, W] uint8 image -> Features of size
    cfg.n_features (fixed), coordinates in level-0 pixels.

    Equivalent of ORBextractor::operator() (reference: src/ORBextractor.cc:1048).
    """
    img = image_u8.astype(jnp.float32)
    levels = pyr.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = [int(b) for b in cfg.features_per_level()]
    border = cfg.edge_threshold - 3  # reference crops EDGE_THRESHOLD-3 = 16

    outs = []
    for lvl, (level_img, n_l) in enumerate(zip(levels, budgets)):
        if n_l == 0:
            continue
        h, w = level_img.shape
        keep, score = fast_ops.detect_with_fallback(
            level_img, cfg.ini_th_fast, cfg.min_th_fast, cell=cfg.cell_size, border=border
        )
        ys, xs, sc, valid = select_spatial_topk(
            score, n_l, _distribution_cell(h, w, n_l)
        )
        m10, m01 = orientation_maps(level_img)
        angles = jnp.arctan2(m01[ys, xs], m10[ys, xs])
        blurred = pyr.gaussian_blur(level_img, 7, 2.0)
        desc = compute_descriptors(blurred, xs, ys, angles)

        scale = float(cfg.scale_factor**lvl)
        xy0 = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], axis=-1) * scale
        outs.append(
            Features(
                xy=xy0,
                response=sc,
                angle=angles,
                octave=jnp.full((n_l,), lvl, dtype=jnp.int32),
                size=jnp.full((n_l,), float(cfg.patch_size) * scale, dtype=jnp.float32),
                desc=desc,
                valid=valid,
            )
        )

    return Features(*[jnp.concatenate([getattr(o, f) for o in outs], axis=0) for f in Features._fields])
