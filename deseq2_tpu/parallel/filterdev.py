"""On-device independent filtering: theta-grid filtered BH.

Device port of the heavy part of pvalueAdjustment (reference
R/results.R:638-718 + the vendored genefilter filtered_p
R/results.R:721-740): a 50-point theta grid of baseMean quantile
cutoffs, BH within each filtered subset, and per-cutoff rejection
counts.  The p-values are sorted ONCE; each cutoff then needs only a
cumsum (subset ranks) and a reverse cummin over the shared order.

The final cutoff choice (R lowess fit + RMSE thresholding over 50
scalars) stays on host — see deseq2_tpu/results.py:pvalue_adjustment —
the host wrapper picks the column j and reads filter_padj[j].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantile_type7(sorted_v, q, n=None):
    """R type-7 quantile of a pre-sorted vector at probabilities q.

    `n`: number of REAL entries (static); entries past it are padding
    sorted to the end (+inf) and excluded — gene-axis padding under a
    device mesh must not shift the quantiles."""
    if n is None:
        n = sorted_v.shape[0]
    h = (n - 1) * q
    lo = jnp.clip(jnp.floor(h).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = h - lo.astype(h.dtype)
    return sorted_v[lo] + frac * (sorted_v[hi] - sorted_v[lo])


def theta_grid_dev(filter_stat, n_theta=50, valid_genes=None):
    """Default theta grid (reference R/results.R:645-649).

    `valid_genes`: static count of real genes when the array carries
    mesh padding rows (which look like all-zero genes and would
    otherwise inflate the zero share)."""
    G = filter_stat.shape[0]
    nv = G if valid_genes is None else valid_genes
    real = jnp.arange(G) < nv
    lower = jnp.sum(((filter_stat == 0) & real).astype(
        filter_stat.dtype)) / nv
    upper = jnp.where(lower < 0.95, 0.95, 1.0).astype(filter_stat.dtype)
    t = jnp.arange(n_theta, dtype=filter_stat.dtype) / (n_theta - 1)
    return lower + (upper - lower) * t


def filtered_bh_dev(pvalue, filter_stat, theta, alpha, valid_genes=None):
    """(filter_padj (T,G), num_rej (T,), cutoffs (T,)) on device.

    For each theta: cutoff = type-7 quantile of filter_stat; BH over the
    genes with filter_stat >= cutoff and finite p (NaN p stays NaN, as
    R's p.adjust keeps NA).  `valid_genes` excludes mesh padding rows
    from the quantiles (their p is NaN so BH already ignores them)."""
    G = pvalue.shape[0]
    dtype = pvalue.dtype
    if valid_genes is None or valid_genes == G:
        cutoffs = quantile_type7(jnp.sort(filter_stat), theta)
    else:
        real = jnp.arange(G) < valid_genes
        fs = jnp.where(real, filter_stat, jnp.inf)
        cutoffs = quantile_type7(jnp.sort(fs), theta, n=valid_genes)

    finite = ~jnp.isnan(pvalue)
    pv = jnp.where(finite, pvalue, jnp.inf)
    order = jnp.argsort(pv)
    p_sorted = pv[order]
    f_sorted = filter_stat[order]
    fin_sorted = finite[order]

    def one_cutoff(cut):
        valid = fin_sorted & (f_sorted >= cut)
        n = jnp.sum(valid).astype(dtype)
        rank = jnp.cumsum(valid.astype(dtype))
        scaled = jnp.where(valid, p_sorted * n / rank, jnp.inf)
        rev_cummin = jnp.flip(jax.lax.cummin(jnp.flip(scaled)))
        adj = jnp.minimum(rev_cummin, 1.0)
        padj_sorted = jnp.where(valid, adj, jnp.nan)
        padj = jnp.zeros(G, dtype=dtype).at[order].set(padj_sorted)
        nrej = jnp.sum(jnp.where(valid, (adj < alpha).astype(dtype), 0.0))
        return padj, nrej

    filter_padj, num_rej = jax.vmap(one_cutoff)(cutoffs)
    return filter_padj, num_rej, cutoffs
