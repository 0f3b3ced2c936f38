"""On-device beta-prior variance estimation for the fused pipeline.

Device port of estimateBetaPriorVar's weighted-quantile matching
(reference R/core.R:1601-1689 with the vendored Hmisc wtd.quantile,
R/core.R:2762-2914; host port: deseq2_tpu/quantiles.py + wald.py).

Hmisc's duplicate-collapsing wtd.table + right-continuous step lookup is
reproduced WITHOUT the dynamic-shaped unique(): with ties, the first
sorted index whose cumulative weight reaches the target carries the same
x value as the collapsed table would, so a plain sort + cumsum +
searchsorted(side='left') is exact.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from scipy.stats import norm


def wtd_quantile_dev(x, w, prob):
    """Hmisc wtd.quantile(type='quantile', normwt=TRUE) of x under
    weights w at a single probability; entries with w == 0 are excluded
    (callers encode the |beta| < 10 finiteness mask as w = 0)."""
    dtype = x.dtype
    incl = w > 0
    n_used = jnp.sum(incl.astype(dtype))
    xs_key = jnp.where(incl, x, jnp.inf)     # excluded sort last
    order = jnp.argsort(xs_key)
    xs = xs_key[order]
    ws = w[order]
    ws = ws * n_used / jnp.sum(ws)           # normwt
    cumw = jnp.cumsum(ws)
    n = n_used
    o = 1.0 + (n - 1.0) * jnp.asarray(prob, dtype)
    low = jnp.maximum(jnp.floor(o), 1.0)
    high = jnp.minimum(low + 1.0, n)
    frac = o % 1.0
    idx_low = jnp.clip(jnp.searchsorted(cumw, low, side="left"),
                       0, x.shape[0] - 1)
    idx_high = jnp.clip(jnp.searchsorted(cumw, high, side="left"),
                        0, x.shape[0] - 1)
    return (1.0 - frac) * xs[idx_low] + frac * xs[idx_high]


def match_weighted_upper_quantile_var_dev(beta_col, weights,
                                          upper_quantile=0.05):
    """matchWeightedUpperQuantileForVariance (R/core.R:2416-2419) on
    device: sd = wtd.quantile(|beta|, 1-q) / qnorm(1 - q/2), var = sd^2.
    Entries with |beta| >= 10 or non-finite are excluded (w=0), matching
    estimateBetaPriorVar's useFinite mask (R/core.R:1648-1666)."""
    finite = jnp.isfinite(beta_col) & (jnp.abs(beta_col) < 10.0)
    w = jnp.where(finite, weights, 0.0)
    q = wtd_quantile_dev(jnp.abs(jnp.where(finite, beta_col, 0.0)), w,
                         1.0 - upper_quantile)
    z = float(norm.ppf(1.0 - upper_quantile / 2.0))
    return (q / z) ** 2
