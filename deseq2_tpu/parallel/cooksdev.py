"""On-device Cook's distance machinery for the fused pipeline.

Device (jnp) ports of the host implementations in ``deseq2_tpu/cooks.py``
(reference: robustMethodOfMomentsDisp / trimmedCellVariance R/core.R:2277-2331,
calculateCooksDistance R/core.R:2333-2340, recordMaxCooks R/core.R:2349-2359).

The design-cell structure (`cells`: one integer code per sample, static) is
known at trace time, so the per-cell column subsets, trim ratios, and scale
constants are all static — only the sorts and reductions run on device.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_TRIM_RATIO = (1.0 / 3, 1.0 / 4, 1.0 / 8)
_TRIM_SCALE = (2.04, 1.86, 1.51)


def _trim_bin(n):
    """Trim-ratio bin by cell size (reference R/core.R:2306-2310)."""
    if n <= 3.5:
        return 0
    if n <= 23.5:
        return 1
    return 2


def trimmed_mean_dev(v, trim):
    """R's mean(x, trim=t) along axis 1: drop floor(n*t) per end of sorted."""
    n = v.shape[1]
    k = int(np.floor(n * trim))
    vs = jnp.sort(v, axis=1)
    if k > 0:
        vs = vs[:, k:n - k]
    return vs.mean(axis=1)


def trimmed_variance_dev(v):
    """(reference trimmedVariance, R/core.R:2326-2331)"""
    rm = trimmed_mean_dev(v, 1.0 / 8)
    return 1.51 * trimmed_mean_dev((v - rm[:, None]) ** 2, 1.0 / 8)


def robust_mom_disp_dev(norm_counts, cells):
    """Robust method-of-moments dispersion, (G,) on device
    (reference robustMethodOfMomentsDisp, R/core.R:2277-2300).

    cells: static tuple of per-sample design-cell codes."""
    cells_np = np.asarray(cells)
    counts_per = np.bincount(cells_np)
    keep = np.where(counts_per >= 3)[0]
    if keep.size:
        v = None
        for lvl in keep:
            idx = tuple(np.where(cells_np == lvl)[0])
            n = len(idx)
            b = _trim_bin(n)
            sub = norm_counts[:, idx]
            m_l = trimmed_mean_dev(sub, _TRIM_RATIO[b])
            v_l = _TRIM_SCALE[b] * trimmed_mean_dev(
                (sub - m_l[:, None]) ** 2, _TRIM_RATIO[b])
            v = v_l if v is None else jnp.maximum(v, v_l)
    else:
        v = trimmed_variance_dev(norm_counts)
    m = norm_counts.mean(axis=1)
    # floor of 0.04, not minDisp (R/core.R:2296-2298)
    return jnp.maximum((v - m) / m ** 2, 0.04)


def cooks_distance_dev(y, norm_counts, mu, hat, cells, p):
    """(G,S) Cook's distances (reference calculateCooksDistance,
    R/core.R:2333-2340)."""
    disp = robust_mom_disp_dev(norm_counts, cells)
    v = mu + disp[:, None] * mu ** 2
    pearson_sq = (y - mu) ** 2 / v
    return pearson_sq / p * hat / (1.0 - hat) ** 2


def max_cooks_dev(cooks, cells, p):
    """Max Cook's over samples in cells with >=3 replicates; NaN column
    mask handled statically (reference recordMaxCooks, R/core.R:2349-2359).

    Returns None when the reference would store all-NA (m <= p or no
    cell with >=3 replicates)."""
    cells_np = np.asarray(cells)
    counts_per = np.bincount(cells_np)
    sel = tuple(np.where(counts_per[cells_np] >= 3)[0])
    m = len(cells_np)
    if m <= p or not sel:
        return None
    return cooks[:, sel].max(axis=1)
