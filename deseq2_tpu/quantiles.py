"""Weighted quantiles with Hmisc semantics + R quantile type 7.

Reference vendors Hmisc.wtd.quantile (R/core.R:2762-2914) for the beta
prior variance (matchWeightedUpperQuantileForVariance, R/core.R:2416-2419)
and the rlog prior.  These are host-side 1-D order statistics over <= G
scalars — exact parity matters more than device placement.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import norm


def r_quantile_type7(x, probs):
    """R's default quantile (type 7) == numpy's 'linear' interpolation."""
    return np.quantile(np.asarray(x, dtype=np.float64), probs)


def wtd_quantile(x, weights=None, probs=0.5, normwt=False):
    """Hmisc wtd.quantile, type='quantile' (reference R/core.R:2762-2799)."""
    x = np.asarray(x, dtype=np.float64)
    scalar = np.isscalar(probs)
    probs = np.atleast_1d(np.asarray(probs, dtype=np.float64))
    if weights is None:
        out = r_quantile_type7(x, probs)
        return out[0] if scalar else out
    weights = np.asarray(weights, dtype=np.float64)
    keep = ~(np.isnan(weights) | (weights == 0))
    x, weights = x[keep], weights[keep]
    keep = ~(np.isnan(x) | np.isnan(weights))
    x, weights = x[keep], weights[keep]
    if normwt:
        weights = weights * len(x) / weights.sum()
    # wtd.table: collapse duplicates, sorted
    order = np.argsort(x, kind="stable")
    xs, ws = x[order], weights[order]
    ux, inv = np.unique(xs, return_inverse=True)
    uw = np.bincount(inv, weights=ws)
    n = uw.sum()
    cumw = np.cumsum(uw)
    ords = 1.0 + (n - 1.0) * probs
    low = np.maximum(np.floor(ords), 1.0)
    high = np.minimum(low + 1.0, n)
    frac = ords % 1.0
    allq_low = _approx_constant_right(cumw, ux, low)
    allq_high = _approx_constant_right(cumw, ux, high)
    out = (1.0 - frac) * allq_low + frac * allq_high
    return out[0] if scalar else out


def _approx_constant_right(xgrid, ygrid, xout):
    """R approx(method='constant', f=1, rule=2): right-continuous step.

    y(v) = ygrid[i] for the smallest i with xgrid[i] >= v; clamps at ends.
    """
    idx = np.searchsorted(xgrid, xout, side="left")
    idx = np.clip(idx, 0, len(ygrid) - 1)
    return ygrid[idx]


def match_upper_quantile_for_variance(x, upper_quantile=0.05):
    """(reference matchUpperQuantileForVariance, R/core.R:2411-2414)"""
    sd_est = (r_quantile_type7(np.abs(x), 1 - upper_quantile)
              / norm.ppf(1 - upper_quantile / 2))
    return float(sd_est) ** 2


def match_weighted_upper_quantile_for_variance(x, weights,
                                               upper_quantile=0.05):
    """(reference matchWeightedUpperQuantileForVariance, R/core.R:2416-2419)"""
    sd_est = (wtd_quantile(np.abs(x), weights=weights,
                           probs=1 - upper_quantile, normwt=True)
              / norm.ppf(1 - upper_quantile / 2))
    return float(sd_est) ** 2
