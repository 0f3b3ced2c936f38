"""Cook's distance machinery for outlier detection.

Reference: robustMethodOfMomentsDisp / trimmedCellVariance / trimmedVariance
(R/core.R:2277-2331), calculateCooksDistance (R/core.R:2333-2340),
recordMaxCooks (R/core.R:2349-2359).
"""

from __future__ import annotations

import numpy as np

from .dispersions import model_matrix_groups, n_or_more_in_cell


def _r_trimmed_mean(x, trim, axis=-1):
    """R's mean(x, trim=t): drop floor(n*t) from each end of sorted x."""
    x = np.sort(x, axis=axis)
    n = x.shape[axis]
    k = int(np.floor(n * trim))
    if k > 0:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, n - k)
        x = x[tuple(sl)]
    return x.mean(axis=axis)


def trimmed_variance(x):
    """(reference trimmedVariance, R/core.R:2326-2331)"""
    rm = _r_trimmed_mean(x, 1.0 / 8)
    sqerror = (x - rm[:, None]) ** 2
    return 1.51 * _r_trimmed_mean(sqerror, 1.0 / 8)


def trimmed_cell_variance(cnts, cells):
    """Per-cell trimmed variance, max across cells
    (reference trimmedCellVariance, R/core.R:2302-2324).

    cells: integer codes (S,) of design cells; only cells with >=3 samples
    are passed in by the caller."""
    trimratio = [1.0 / 3, 1.0 / 4, 1.0 / 8]
    scale_c = [2.04, 1.86, 1.51]

    def trimfn(n):
        if n <= 3.5:
            return 0
        if n <= 23.5:
            return 1
        return 2

    levels = np.unique(cells)
    G = cnts.shape[0]
    cell_means = np.empty((G, len(levels)))
    for li, lvl in enumerate(levels):
        sel = cells == lvl
        n = sel.sum()
        cell_means[:, li] = _r_trimmed_mean(cnts[:, sel], trimratio[trimfn(n)])
    lvl_index = {lvl: i for i, lvl in enumerate(levels)}
    qmat = cell_means[:, [lvl_index[c] for c in cells]]
    sqerror = (cnts - qmat) ** 2
    var_est = np.empty((G, len(levels)))
    for li, lvl in enumerate(levels):
        sel = cells == lvl
        n = sel.sum()
        var_est[:, li] = scale_c[trimfn(n)] * _r_trimmed_mean(
            sqerror[:, sel], trimratio[trimfn(n)])
    return var_est.max(axis=1)


def robust_method_of_moments_disp(dds, model_matrix):
    """(reference robustMethodOfMomentsDisp, R/core.R:2277-2300)"""
    cnts = dds.counts_normalized()
    three_or_more = n_or_more_in_cell(model_matrix, 3)
    if np.any(three_or_more):
        codes, _ = model_matrix_groups(model_matrix)
        cell_counts = np.bincount(codes)
        keep_cells = np.where(cell_counts >= 3)[0]
        idx = np.isin(codes, keep_cells)
        v = trimmed_cell_variance(cnts[:, idx], codes[idx])
    else:
        v = trimmed_variance(cnts)
    m = cnts.mean(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = (v - m) / m ** 2
    # floor of 0.04, not the usual minDisp: avoids extreme Cook's distances
    # for counts in the outlier's own group (R/core.R:2296-2298)
    return np.maximum(alpha, 0.04)


def calculate_cooks_distance(dds, hat_diag, model_matrix):
    """(reference calculateCooksDistance, R/core.R:2333-2340)"""
    p = model_matrix.shape[1]
    dispersions = robust_method_of_moments_disp(dds, model_matrix)
    mu = dds.assays["mu"]
    v = mu + dispersions[:, None] * mu ** 2
    pearson_res_sq = (dds.counts - mu) ** 2 / v
    with np.errstate(divide="ignore", invalid="ignore"):
        cooks = pearson_res_sq / p * hat_diag / (1.0 - hat_diag) ** 2
    return cooks


def record_max_cooks(model_matrix, cooks, num_rows):
    """Max Cook's only over samples in cells with >=3 replicates, NA when
    m <= p (reference recordMaxCooks, R/core.R:2349-2359)."""
    samples_for_cooks = n_or_more_in_cell(model_matrix, 3)
    m, p = model_matrix.shape
    if m > p and np.any(samples_for_cooks):
        return cooks[:, samples_for_cooks].max(axis=1)
    return np.full(num_rows, np.nan)
