"""Genes-axis bucketing: pad batch dims to canonical sizes.

XLA compiles one program per shape.  The pipeline repeatedly calls the
same kernels on data-dependent subsets of genes (refit rows, non-converged
rows, outlier rows), which would trigger a fresh compile per subset size.
Padding the genes axis up to a bucket (powers of two below 4096, then
multiples of 4096) makes shapes canonical so the jitted kernels are
compiled once and reused — at most ~2x padding waste for small batches,
<=9% at 60k genes.

Dummy rows are filled with benign values (y=1, mu=1, nf=1, alpha=1,
beta=0, weights=1) that converge instantly and never produce NaN/Inf.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bucket_size", "pad_rows"]


def bucket_size(g):
    if g <= 16:
        return 16
    if g < 4096:
        return 1 << (g - 1).bit_length()
    return -(-g // 4096) * 4096


def pad_rows(arr, g_pad, fill):
    """Pad axis 0 of `arr` to g_pad with `fill`."""
    arr = np.asarray(arr)
    g = arr.shape[0]
    if g == g_pad:
        return arr
    pad_shape = (g_pad - g,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)],
                          axis=0)
