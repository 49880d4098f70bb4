"""Shape bucketing for jitted device calls.

Everything under jit is compiled per input shape (SURVEY.md §7 hard part #3:
data-dependent control flow/shapes vs XLA's static-shape model). Host code
that slices data-dependent row counts (match sets, candidate map points,
triangulation pairs) must pad to a small set of bucket sizes before calling a
jitted function, or every new count triggers a fresh XLA compile — profiling
the synthetic replay showed ~60% of wall time in recompiles before bucketing.

Pattern:
    nb = bucket(len(rows))
    out = jitted_fn(pad_rows(x, nb), ..., valid=row_mask(len(rows), nb))
    result = np.asarray(out)[: len(rows)]
"""

from __future__ import annotations

import numpy as np


def bucket(n: int, lo: int = 32) -> int:
    """Smallest power of two >= n (and >= lo): bounds distinct compile shapes
    to log2(max_n) per call site."""
    n = max(int(n), 1)
    return max(lo, 1 << (n - 1).bit_length())


def pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad axis 0 of `a` to length n with `fill` (no-op when already n)."""
    a = np.asarray(a)
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


def row_mask(n_valid: int, n_total: int) -> np.ndarray:
    """[n_total] bool with the first n_valid True."""
    m = np.zeros(n_total, bool)
    m[:n_valid] = True
    return m
