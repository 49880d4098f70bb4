"""Normalized-mutual-information scoring of (synthetic render x warped camera) pairs.

TPU-native replacement for the reference's CUDA NMI pipeline
(Thirdparty/CUDA_Functions/NMI.cu: histogram256all :52-104 with shared-memory
atomics, ComputeEntropyKernel :230-267, pairwise-sum reductions :270-363, one
4-byte D2H per pose kernel.cu:100). Design (SURVEY.md §7.5c):

  * A 256x256 **joint histogram is a matmul**: with one-hot encodings
    A=[P,256], B=[P,256] of the two images, J = A^T B. The MXU does this at
    full throughput; no atomics, no scatter. Products are 0/1 (exact in bf16),
    accumulation is f32 (exact below 2^24 counts).
  * The joint **entropy is fused into the kernel** — each (s, r) grid cell
    reduces its own J to the scalar Hab, so the kernel output is just [S, R]
    floats: the whole 6-D pose grid costs ONE dispatch and ONE [S*R]-float
    readback (the reference does S*R kernel launches + D2H syncs).
  * Marginal entropies Ha[s], Hb[r] depend on single images only (S+R of
    them, not S*R) and are computed with a cheap histogram outside the kernel.

Score metrics (reference kernel.cuh:22-23, NMI.cu:344-359):
    SUC  = 2 * (1 - Hab / (Ha + Hb))     <- enabled in the reference
    ENMI = (Ha + Hb) / Hab

Background masking (`nmi_prop_BG=false`, reference NMI.cu:85 + allProperties
.hpp:38): pixel pairs where EITHER image is 0 are excluded from the joint AND
both marginal histograms, while probabilities stay normalized by the FULL
pixel count width*height (kernel.cu:85 passes width*height as `length`
unconditionally). Because the reference increments the marginals under the
same both-nonzero condition, the masked marginal histograms are exactly the
row/col sums of the masked joint histogram — so the masked path computes all
three entropies from one joint-histogram pass per pair (masking = dropping
row 0 and column 0 of J in the entropy epilogue; the count loop is unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 256
_CHUNK = 2048  # pixels per MXU matmul chunk


def quantize_to_bins(img: jnp.ndarray, n_bins: int = N_BINS) -> jnp.ndarray:
    """float [0,255] image -> int32 bin indices (uint8 semantics like NMI.cu)."""
    return jnp.clip(img, 0, n_bins - 1).astype(jnp.int32)


def marginal_entropy(bins_flat: jnp.ndarray, n_valid: int, n_bins: int = N_BINS) -> jnp.ndarray:
    """Shannon entropy (log2) of one image's histogram. bins_flat: [P] int32."""
    hist = jnp.zeros((n_bins,), jnp.float32).at[jnp.clip(bins_flat, 0, n_bins - 1)].add(
        jnp.where(bins_flat >= 0, 1.0, 0.0)
    )
    p = hist / jnp.float32(n_valid)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0))


# ---------------------------------------------------------------------------
# Reference implementation (jnp, used on CPU/tests and as the oracle)
# ---------------------------------------------------------------------------


def joint_entropy_reference(a: jnp.ndarray, b: jnp.ndarray, n_valid: int, n_bins: int = N_BINS) -> jnp.ndarray:
    """Joint entropy of two [P] int32 bin arrays (padding marked as -1)."""
    idx = jnp.clip(a, 0, n_bins - 1) * n_bins + jnp.clip(b, 0, n_bins - 1)
    w = jnp.where((a >= 0) & (b >= 0), 1.0, 0.0)
    hist = jnp.zeros((n_bins * n_bins,), jnp.float32).at[idx].add(w)
    p = hist / jnp.float32(n_valid)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0))


def nmi_scores_reference(
    synth_bins: jnp.ndarray,  # [S, P] int32
    warp_bins: jnp.ndarray,  # [R, P] int32
    n_valid: int,
    metric: str = "SUC",
    n_bins: int = N_BINS,
    use_background: bool = True,
) -> jnp.ndarray:
    """[S, R] scores, pure jnp (scatter-add histograms). Oracle for the kernel."""
    if not use_background:
        Hab, Ha, Hb = jax.vmap(
            lambda a: jax.vmap(
                lambda b: masked_entropies_reference(a, b, n_valid, n_bins)
            )(warp_bins)
        )(synth_bins)
        return _combine_pairwise(Ha, Hb, Hab, metric)
    Ha = jax.vmap(lambda x: marginal_entropy(x, n_valid, n_bins))(synth_bins)
    Hb = jax.vmap(lambda x: marginal_entropy(x, n_valid, n_bins))(warp_bins)
    Hab = jax.vmap(
        lambda a: jax.vmap(lambda b: joint_entropy_reference(a, b, n_valid, n_bins))(warp_bins)
    )(synth_bins)
    return _combine(Ha, Hb, Hab, metric)


def masked_entropies_reference(
    a: jnp.ndarray, b: jnp.ndarray, n_valid: int, n_bins: int = N_BINS
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(Hab, Ha, Hb) of one pair with zero-pixel pairs excluded (NMI.cu:85
    `nmi_prop_BG=false` path), normalized by the full n_valid. Oracle."""
    idx = jnp.clip(a, 0, n_bins - 1) * n_bins + jnp.clip(b, 0, n_bins - 1)
    w = jnp.where((a > 0) & (b > 0), 1.0, 0.0)  # exclude either-zero AND pad
    J = jnp.zeros((n_bins * n_bins,), jnp.float32).at[idx].add(w).reshape(n_bins, n_bins)

    def ent(h):
        p = h / jnp.float32(n_valid)
        return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0))

    return ent(J), ent(J.sum(1)), ent(J.sum(0))


def _combine(Ha, Hb, Hab, metric):
    s = Ha[:, None] + Hb[None, :]
    if metric == "SUC":
        return 2.0 * (1.0 - Hab / jnp.maximum(s, 1e-12))
    elif metric == "ENMI":
        return s / jnp.maximum(Hab, 1e-12)
    raise ValueError(f"unknown NMI metric {metric!r}")


def _combine_pairwise(Ha, Hb, Hab, metric):
    """Same score formulas, but Ha/Hb are per-PAIR [S, R] (masked path)."""
    s = Ha + Hb
    if metric == "SUC":
        return 2.0 * (1.0 - Hab / jnp.maximum(s, 1e-12))
    elif metric == "ENMI":
        return s / jnp.maximum(Hab, 1e-12)
    raise ValueError(f"unknown NMI metric {metric!r}")


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


# Mosaic requires block sublane/lane dims divisible by (8, 128). The joint
# kernel consumes [8, JCHUNK]-shaped pixel super-chunks: each of the 8 rows
# one-hot-expands to [n_bins, JCHUNK] and feeds an int8 MXU matmul with
# K=JCHUNK (one-hot products are exactly representable in int8 and the int8
# MXU path runs at 2x the bf16 rate; counts accumulate exactly in int32).

_JCHUNK = 2048  # lanes per joint-kernel matmul (K dimension)
_JROWS = 8
_JSUPER = _JROWS * _JCHUNK  # pixels per joint-kernel grid step


def _joint_entropy_kernel(
    n_chunks: int, n_r: int, n_valid: int, n_bins: int, mask_zero: bool = False
):
    inv_n = 1.0 / float(n_valid)

    def kernel(synth_ref, warp_ref, out_ref, acc_ref, aoh_ref):
        # grid order (S, C, R): r sweeps fastest, so the synth one-hot for
        # (s, c) is built once (at r == 0) and reused for all R warps — the
        # one-hot expansion is ~30% of kernel time otherwise. Each r keeps its
        # own joint-histogram accumulator in scratch across the c sweep.
        c = pl.program_id(1)
        r = pl.program_id(2)

        @pl.when(c == 0)
        def _():
            acc_ref[r] = jnp.zeros_like(acc_ref[r])

        bins_col = jax.lax.broadcasted_iota(jnp.int32, (n_bins, _JCHUNK), 0)

        @pl.when(r == 0)
        def _():
            a = synth_ref[0]  # [8, JCHUNK] int32 (pad = -1 -> all-zero one-hot)
            for row in range(_JROWS):
                aoh_ref[row] = (a[row : row + 1, :] == bins_col).astype(jnp.int8)

        b = warp_ref[0]
        acc = acc_ref[r]
        for row in range(_JROWS):
            b_ohT = (b[row : row + 1, :] == bins_col).astype(jnp.int8)
            # J[bin_a, bin_b] += sum_pix a_ohT[bin_a, pix] * b_ohT[bin_b, pix]
            acc = acc + jax.lax.dot_general(
                aoh_ref[row],
                b_ohT,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
                # explicit: the package-global HIGHEST default would request
                # an fp32 contraction of int8 operands (Mosaic rejects it)
                precision=jax.lax.Precision.DEFAULT,
            )
        acc_ref[r] = acc

        @pl.when(c == n_chunks - 1)
        def _():
            J = acc_ref[r].astype(jnp.float32)
            if mask_zero:
                # nmi_prop_BG=false: drop every pair where either bin is 0 —
                # exactly rows/cols 0 of the joint histogram (NMI.cu:85). The
                # masked marginal histograms are then the row/col sums of the
                # masked J, so Ha/Hb come out of this same pass.
                ri = jax.lax.broadcasted_iota(jnp.int32, (n_bins, n_bins), 0)
                ci = jax.lax.broadcasted_iota(jnp.int32, (n_bins, n_bins), 1)
                J = jnp.where((ri > 0) & (ci > 0), J, 0.0)

            def neg_sum_plogp(p):
                return -jnp.sum(
                    jnp.where(p > 0, p * (jnp.log(jnp.where(p > 0, p, 1.0)) * 1.4426950408889634), 0.0)
                )

            Hab = neg_sum_plogp(J * inv_n)
            if mask_zero:
                # row/col sums via matmul against ones so intermediates stay
                # 2-D (8,128)-tileable (see _marginal_entropy_kernel)
                ones = jnp.ones((n_bins, 128), jnp.float32)
                rows = jax.lax.dot_general(
                    J, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # [n_bins, 128], each column = row sums of J
                cols = jax.lax.dot_general(
                    J, ones, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # [n_bins, 128], each column = col sums of J
                Ha = neg_sum_plogp(rows * inv_n) / 128.0
                Hb = neg_sum_plogp(cols * inv_n) / 128.0
                rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                out_ref[0, 0] = jnp.where(
                    rowi == 0, Hab, jnp.where(rowi == 1, Ha, Hb)
                )
            else:
                out_ref[0, 0] = jnp.broadcast_to(Hab, (8, 128))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_valid", "n_bins", "interpret", "mask_zero")
)
def joint_entropy_grid_pallas(
    synth_bins: jnp.ndarray,  # [S, P_pad] int32, padding = -1
    warp_bins: jnp.ndarray,  # [R, P_pad] int32
    n_valid: int,
    n_bins: int = N_BINS,
    interpret: bool = False,
    mask_zero: bool = False,
) -> jnp.ndarray:
    """All-pairs joint entropies [S, R] in one Pallas dispatch.

    With `mask_zero` (the nmi_prop_BG=false path) the result is [3, S, R]:
    (Hab, Ha, Hb) per pair, all computed from the zero-masked joint histogram.

    Layout notes for Mosaic: pixel super-chunks are presented as [8, JCHUNK]
    blocks (sublane x lane aligned); each (s, r) cell's scalar entropy is
    written as an (8, 128) broadcast tile and sliced back to [S, R] outside —
    scalar VMEM outputs don't meet TPU tiling constraints.
    """
    S, P = synth_bins.shape
    R = warp_bins.shape[0]
    assert P % _JSUPER == 0, f"pad pixel dim to a multiple of {_JSUPER}"
    n_chunks = P // _JSUPER

    synth3 = synth_bins.reshape(S, P // _JCHUNK, _JCHUNK)
    warp3 = warp_bins.reshape(R, P // _JCHUNK, _JCHUNK)

    grid = (S, n_chunks, R)
    out = pl.pallas_call(
        _joint_entropy_kernel(n_chunks, R, n_valid, n_bins, mask_zero),
        out_shape=jax.ShapeDtypeStruct((S, R, 8, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _JROWS, _JCHUNK), lambda s, c, r: (s, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _JROWS, _JCHUNK), lambda s, c, r: (r, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda s, c, r: (s, r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((R, n_bins, n_bins), jnp.int32),
            pltpu.VMEM((_JROWS, n_bins, _JCHUNK), jnp.int8),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * R * P * n_bins,
            bytes_accessed=(S + R) * P * 4 + S * R * 4 * 1024,
            transcendentals=S * R * n_bins * n_bins,
        ),
    )(synth3, warp3)
    if mask_zero:
        return jnp.stack([out[:, :, 0, 0], out[:, :, 1, 0], out[:, :, 2, 0]])
    return out[:, :, 0, 0]


def _marginal_entropy_kernel(n_chunks: int, n_valid: int, n_bins: int):
    inv_n = 1.0 / float(n_valid)
    rows = _CHUNK // 128

    def kernel(bins_ref, out_ref, acc_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a3 = bins_ref[0]  # [rows, 128]
        bins_col = jax.lax.broadcasted_iota(jnp.int32, (n_bins, 128), 0)
        acc = acc_ref[:]
        for r in range(rows):
            acc = acc + (a3[r : r + 1, :] == bins_col).astype(jnp.float32)
        acc_ref[:] = acc

        @pl.when(c == n_chunks - 1)
        def _():
            # lane-reduce via matmul against ones so every intermediate stays a
            # 2-D (8,128)-tileable vector (1-D [n_bins] hits a Mosaic relayout
            # bug); every column of `tot` holds the same per-bin total.
            ones = jnp.ones((128, 128), jnp.float32)
            tot = jax.lax.dot_general(
                acc_ref[:], ones, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [n_bins, 128]
            p = tot * inv_n
            plogp = jnp.where(p > 0, p * (jnp.log(jnp.where(p > 0, p, 1.0)) * 1.4426950408889634), 0.0)
            out_ref[0] = jnp.broadcast_to(-jnp.sum(plogp) / 128.0, (8, 128))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_valid", "n_bins", "interpret"))
def marginal_entropy_pallas(
    bins: jnp.ndarray,  # [N, P_pad] int32, padding = -1
    n_valid: int,
    n_bins: int = N_BINS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-image Shannon entropies [N] via one-hot accumulation (no scatter).

    Replaces the XLA scatter-add histogram (slow on TPU) for the S+R marginal
    terms of the NMI score.
    """
    N, P = bins.shape
    assert P % _CHUNK == 0
    n_chunks = P // _CHUNK
    rows = _CHUNK // 128
    bins3 = bins.reshape(N, P // 128, 128)
    out = pl.pallas_call(
        _marginal_entropy_kernel(n_chunks, n_valid, n_bins),
        out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.float32),
        grid=(N, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda n, c: (n, c, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda n, c: (n, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_bins, 128), jnp.float32)],
        interpret=interpret,
    )(bins3)
    return out[:, 0, 0]


def pad_pixels(bins: jnp.ndarray, chunk: int = _CHUNK) -> jnp.ndarray:
    """Pad the pixel axis of [N, P] to a chunk multiple with -1 sentinels."""
    p = bins.shape[-1]
    pad = (-p) % chunk
    if pad == 0:
        return bins
    return jnp.pad(bins, ((0, 0), (0, pad)), constant_values=-1)


def nmi_scores(
    synth: jnp.ndarray,  # [S, H, W] float or int images in [0, 255]
    warped: jnp.ndarray,  # [R, H, W]
    metric: str = "SUC",
    n_bins: int = N_BINS,
    use_pallas: bool | None = None,
    use_background: bool = True,
) -> jnp.ndarray:
    """Score every (render, warp) pair: [S, R] float32.

    The reference evaluates these S*R pairs one CUDA pipeline at a time inside
    a 6-deep host loop (Tracking.cc:1879-1902); here it is one fused device
    computation regardless of grid size.

    `use_background=False` is the reference's `nmi_prop_BG=false` compile
    option (NMI.cu:85): pairs where either image is 0 are excluded from all
    histograms (normalization stays at the full pixel count) — background
    removal for prior-model renders that do not cover the whole frame.
    """
    S = synth.shape[0]
    R = warped.shape[0]
    P = int(np.prod(synth.shape[1:]))
    sb = quantize_to_bins(synth.reshape(S, P), n_bins)
    wb = quantize_to_bins(warped.reshape(R, P), n_bins)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    if not use_background:
        if use_pallas:
            Hab, Ha, Hb = joint_entropy_grid_pallas(
                pad_pixels(sb, _JSUPER), pad_pixels(wb, _JSUPER), P, n_bins,
                mask_zero=True,
            )
        else:
            Hab, Ha, Hb = jax.vmap(
                lambda a: jax.vmap(
                    lambda b: masked_entropies_reference(a, b, P, n_bins)
                )(wb)
            )(sb)
        return _combine_pairwise(Ha, Hb, Hab, metric)

    if use_pallas:
        Ha = marginal_entropy_pallas(pad_pixels(sb), P, n_bins)
        Hb = marginal_entropy_pallas(pad_pixels(wb), P, n_bins)
        Hab = joint_entropy_grid_pallas(
            pad_pixels(sb, _JSUPER), pad_pixels(wb, _JSUPER), P, n_bins
        )
    else:
        Ha = jax.vmap(lambda x: marginal_entropy(x, P, n_bins))(sb)
        Hb = jax.vmap(lambda x: marginal_entropy(x, P, n_bins))(wb)
        Hab = jax.vmap(
            lambda a: jax.vmap(lambda b: joint_entropy_reference(a, b, P, n_bins))(wb)
        )(sb)
    return _combine(Ha, Hb, Hab, metric)
