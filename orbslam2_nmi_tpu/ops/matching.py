"""Batched ORB descriptor matching.

TPU-native replacement for ORBmatcher (reference: src/ORBmatcher.cc). The
reference accelerates CPU matching with a 64x48 per-frame grid index and BoW
feature vectors; on TPU the natural primitive is the dense [Q, N] candidate
matrix: Hamming distances via XOR + population_count (VPU), spatial windows as
masks, argmin reductions. 2000x2000 problems are a few MB — bandwidth-trivial.

Thresholds preserved from the reference: TH_LOW=50, TH_HIGH=100
(ORBmatcher.cc:42-44), best/second-best nn-ratio, 30-bin rotation-consistency
histogram with top-3 peaks (ORBmatcher.cc ComputeThreeMaxima).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
HIST_LENGTH = 30

_BIG = jnp.int32(10_000)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """[A, 8] x [B, 8] packed uint32 -> [A, B] int32 Hamming distances."""
    acc = jnp.zeros((desc_a.shape[0], desc_b.shape[0]), dtype=jnp.int32)
    for w in range(desc_a.shape[1]):
        x = jnp.bitwise_xor(desc_a[:, None, w], desc_b[None, :, w])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    return acc


def rotation_consistency_mask(
    angle_a: jnp.ndarray, angle_b: jnp.ndarray, match_idx: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 dominant
    histogram bins (ORBmatcher.cc:1458 ComputeThreeMaxima semantics).

    angle_a: [A] query angles (radians); angle_b: [B] train angles;
    match_idx: [A] index into B (or -1); valid: [A] bool.
    """
    two_pi = 2.0 * jnp.pi
    rot = angle_a - angle_b[jnp.clip(match_idx, 0, angle_b.shape[0] - 1)]
    rot = jnp.mod(rot, two_pi)  # [0, 2pi)
    bin_f = rot * (HIST_LENGTH / two_pi)
    bins = jnp.clip(bin_f.astype(jnp.int32), 0, HIST_LENGTH - 1)
    counts = jnp.zeros(HIST_LENGTH, jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)[0]
    # reference drops peaks weaker than 0.1x the max
    thresh = jnp.maximum(top3 * jnp.array([0, 1, 1]), (0.1 * top3[0]).astype(jnp.int32))
    keep_bin = jnp.zeros(HIST_LENGTH, dtype=bool)
    for k in range(3):
        keep_bin = keep_bin | ((counts == top3[k]) & (top3[k] >= thresh[k]) & (top3[k] > 0))
    return valid & keep_bin[bins]


@functools.partial(jax.jit, static_argnames=("apply_ratio", "check_rotation"))
def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    *,
    spatial_mask: jnp.ndarray | None = None,
    max_dist: int = TH_LOW,
    nn_ratio: float = 0.9,
    angle_a: jnp.ndarray | None = None,
    angle_b: jnp.ndarray | None = None,
    apply_ratio: bool = True,
    check_rotation: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best-match search A->B with optional window mask / ratio / rotation checks.

    Returns (match_idx [A] int32 into B or -1, dist [A] int32). Enforces
    one-to-one matching by keeping, for each B, only the lowest-distance A
    (mutual best of the masked candidate matrix).
    """
    d = hamming_matrix(desc_a, desc_b)
    mask = valid_a[:, None] & valid_b[None, :]
    if spatial_mask is not None:
        mask = mask & spatial_mask
    d = jnp.where(mask, d, _BIG)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    ok = best_d <= max_dist

    if apply_ratio:
        d2 = d.at[jnp.arange(d.shape[0]), best].set(_BIG)
        second_d = jnp.min(d2, axis=1)
        ok = ok & (best_d.astype(jnp.float32) < nn_ratio * second_d.astype(jnp.float32))

    # one-to-one: for each B keep the best A
    inv_best = jnp.argmin(jnp.where(ok[:, None], d, _BIG), axis=0)  # [B]
    mutual = inv_best[best] == jnp.arange(d.shape[0])
    ok = ok & mutual

    if check_rotation and angle_a is not None and angle_b is not None:
        ok = rotation_consistency_mask(angle_a, angle_b, best, ok)

    return jnp.where(ok, best, -1), jnp.where(ok, best_d, _BIG)


def window_mask(
    xy_a: jnp.ndarray,
    xy_b: jnp.ndarray,
    radius: jnp.ndarray | float,
    octave_a: jnp.ndarray | None = None,
    octave_b: jnp.ndarray | None = None,
    level_window: int = 1,
) -> jnp.ndarray:
    """[A, B] mask: B features within `radius` (optionally per-A) of each A
    position, optionally within +-level_window octaves. Mirrors the grid
    lookups of Frame::GetFeaturesInArea (src/Frame.cc) without the grid."""
    diff = xy_a[:, None, :] - xy_b[None, :, :]
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    m = (jnp.abs(diff[..., 0]) < r) & (jnp.abs(diff[..., 1]) < r)
    if octave_a is not None and octave_b is not None:
        dl = octave_b[None, :] - octave_a[:, None]
        m = m & (dl >= -level_window) & (dl <= level_window)
    return m


@jax.jit
def match_epipolar_batch(
    desc1: jnp.ndarray,  # [F1, 8] the new keyframe's descriptors (shared)
    free1: jnp.ndarray,  # [N, F1] per-pair free mask (bindings change as pairs land)
    xy1: jnp.ndarray,  # [F1, 2]
    desc2_b: jnp.ndarray,  # [N, F2, 8] neighbor descriptors
    free2_b: jnp.ndarray,  # [N, F2]
    xy2_b: jnp.ndarray,  # [N, F2, 2]
    F12_b: jnp.ndarray,  # [N, 3, 3]
    sigma2_2_b: jnp.ndarray,  # [N, F2]
) -> jnp.ndarray:
    """All of CreateNewMapPoints' epipolar matches in ONE dispatch.

    The reference walks up to 20 covisible neighbors calling
    SearchForTriangulation per pair (LocalMapping.cc:210-224); the host-loop
    equivalent here costs ~2 device round-trips per pair — on a remote-device
    rig that makes the mapper 10x slower than its device time. vmap over the
    pair axis turns it into one program. Returns match idx [N, F1] into F2."""

    def one(free1p, desc2, free2, xy2, F12, s2):
        return match_epipolar(desc1, free1p, desc2, free2, xy1, xy2, F12, s2)[0]

    return jax.vmap(one)(free1, desc2_b, free2_b, xy2_b, F12_b, sigma2_2_b)


@jax.jit
def fuse_match_batch(
    desc_src: jnp.ndarray,  # [P, NB, 8] source map-point descriptors (padded)
    valid_src: jnp.ndarray,  # [P, NB]
    proj: jnp.ndarray,  # [P, NB, 2] projections into the destination KF
    desc_dst: jnp.ndarray,  # [P, F, 8] destination KF feature descriptors
    valid_dst: jnp.ndarray,  # [P, F]
    xy_dst: jnp.ndarray,  # [P, F, 2]
    radius: float = 3.0,
) -> jnp.ndarray:
    """All of SearchInNeighbors' fuse matches (both directions, all neighbor
    pairs) in ONE dispatch — same per-pair math as _fuse_into's window mask +
    Hamming match (ORBmatcher::Fuse, ORBmatcher.cc:858). Returns [P, NB]
    match idx into the destination features (or -1)."""

    def one(ds, vs, pj, dd, vd, xd):
        sm = window_mask(pj, xd, radius)
        idx, _ = match_descriptors(
            ds, vs, dd, vd, spatial_mask=sm, max_dist=TH_LOW, apply_ratio=False
        )
        return idx

    return jax.vmap(one)(desc_src, valid_src, proj, desc_dst, valid_dst, xy_dst)


@jax.jit
def match_epipolar(
    desc1: jnp.ndarray,
    free1: jnp.ndarray,
    desc2: jnp.ndarray,
    free2: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    F12: jnp.ndarray,
    sigma2_2: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SearchForTriangulation's epipolar-constrained match (ORBmatcher.cc:690)
    in ONE dispatch: the [F1, F2] epipolar-distance mask is built on device
    (x1^T F12 x2 = 0 => line of x1 in image 2 is F12^T x1; gate at
    3.84 sigma^2 like the reference) and fed straight into the Hamming
    matcher — no host-side mask or its [F1, F2] upload."""
    ones1 = jnp.concatenate([xy1, jnp.ones((xy1.shape[0], 1), xy1.dtype)], axis=1)
    lines2 = ones1 @ F12  # [F1, 3]
    a, b, c = lines2[:, 0:1], lines2[:, 1:2], lines2[:, 2:3]
    d = jnp.abs(a * xy2[:, 0][None, :] + b * xy2[:, 1][None, :] + c) / jnp.sqrt(
        jnp.maximum(a * a + b * b, 1e-12)
    )
    epi_ok = (d * d) < 3.84 * sigma2_2[None, :]
    return match_descriptors(
        desc1, free1, desc2, free2, spatial_mask=epi_ok,
        max_dist=TH_LOW, apply_ratio=False,
    )
