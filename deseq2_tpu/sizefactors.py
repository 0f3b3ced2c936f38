"""Size-factor estimation: median-of-ratios and variants.

Reference: estimateSizeFactorsForMatrix (R/core.R:535-578), the
estimateSizeFactors method (R/methods.R:363-498), estimateNormFactors
(R/core.R:2159-2163), estimateSizeFactorsIterate (R/core.R:2589-2622).

These are O(G*S) one-shot reductions; host numpy is the right tool (the
cross-sample medians are per-sample order statistics over genes; on a
gene-sharded mesh they gather ~G scalars per sample, which is trivial).
"""

from __future__ import annotations

import numpy as np


def size_factors_for_matrix(counts, locfunc=None, geo_means=None,
                            control_genes=None, type="ratio"):
    """Median-of-ratios size factors (reference R/core.R:535-578).

    sf_j = exp(locfunc_i(log K_ij - loggeomeans_i)) over genes with finite
    log-geo-mean and positive count.
    """
    counts = np.asarray(counts, dtype=np.float64)
    if locfunc is None:
        locfunc = np.median
    if type not in ("ratio", "poscounts"):
        raise ValueError("type must be 'ratio' or 'poscounts'")
    incoming_geo_means = geo_means is not None
    with np.errstate(divide="ignore"):
        if not incoming_geo_means:
            if type == "ratio":
                loggeomeans = np.mean(np.log(counts), axis=1)
            else:  # poscounts: zeros contribute log(1)=0; all-zero rows -> -inf
                lc = np.log(counts)
                lc[~np.isfinite(lc)] = 0.0
                loggeomeans = np.mean(lc, axis=1)
                loggeomeans[counts.sum(axis=1) == 0] = -np.inf
        else:
            geo_means = np.asarray(geo_means, dtype=np.float64)
            if len(geo_means) != counts.shape[0]:
                raise ValueError(
                    "geoMeans should be as long as the number of rows of counts")
            loggeomeans = np.log(geo_means)
    if np.all(np.isinf(loggeomeans)):
        raise ValueError(
            "every gene contains at least one zero, cannot compute log "
            "geometric means")

    if control_genes is not None:
        idx = np.asarray(control_genes)
        if idx.dtype == bool:
            idx = np.where(idx)[0]
        loggeomeans_sub = loggeomeans[idx]
        counts_sub = counts[idx]
    else:
        loggeomeans_sub = loggeomeans
        counts_sub = counts

    S = counts.shape[1]
    sf = np.empty(S)
    with np.errstate(divide="ignore"):
        logc = np.log(counts_sub)
    for j in range(S):
        sel = np.isfinite(loggeomeans_sub) & (counts_sub[:, j] > 0)
        sf[j] = np.exp(locfunc(logc[sel, j] - loggeomeans_sub[sel]))
    if incoming_geo_means:
        # stabilize to geometric mean 1 (R/core.R:573-576)
        sf = sf / np.exp(np.mean(np.log(sf)))
    return sf


def estimate_norm_factors(counts, norm_matrix, locfunc=None, geo_means=None,
                          control_genes=None):
    """Gene x sample normalization factors (reference R/core.R:2159-2163)."""
    sf = size_factors_for_matrix(np.asarray(counts, float) / norm_matrix,
                                 locfunc=locfunc, geo_means=geo_means,
                                 control_genes=control_genes)
    nf = norm_matrix * sf[None, :]
    return nf / np.exp(np.mean(np.log(nf), axis=1))[:, None]


def estimate_size_factors(dds, type="ratio", locfunc=None, geo_means=None,
                          control_genes=None, norm_matrix=None, quiet=True):
    """The estimateSizeFactors method (reference R/methods.R:363-498).

    - avgTxLength assay (tximport ingestion) takes precedence and produces
      gene x sample normalization factors (R/methods.R:383-391)
    - normMatrix option multiplies in a user normalization matrix
    - type='iterate' runs the alternating likelihood maximization
    """
    dds = dds.copy()
    if type == "iterate":
        dds.size_factors = size_factors_iterate(dds)
        return dds
    if "avgTxLength" in dds.assays:
        nf = estimate_norm_factors(dds.counts, dds.assays["avgTxLength"],
                                   locfunc=locfunc, geo_means=geo_means,
                                   control_genes=control_genes)
        dds.normalization_factors = nf
        return dds
    if norm_matrix is not None:
        nf = estimate_norm_factors(dds.counts, norm_matrix, locfunc=locfunc,
                                   geo_means=geo_means,
                                   control_genes=control_genes)
        dds.normalization_factors = nf
        return dds
    dds.size_factors = size_factors_for_matrix(
        dds.counts, locfunc=locfunc, geo_means=geo_means,
        control_genes=control_genes, type=type)
    return dds


def size_factors_iterate(dds, niter=10, quantile_q=0.05):
    """Iterative size factors by alternating ~1 dispersion fits with
    L-BFGS-B maximization of a trimmed NB likelihood over log sf
    (reference R/core.R:2589-2622)."""
    import scipy.optimize
    from scipy.special import gammaln

    def nb_logpmf_np(y, mu, alpha):
        size = 1.0 / alpha
        t = np.where(y > 0, y * (np.log(mu) - np.log(size + mu)), 0.0)
        return (gammaln(y + size) - gammaln(size) - gammaln(y + 1.0)
                + size * (np.log(size) - np.log(size + mu)) + t)

    from .dispersions import estimate_dispersions

    obj = dds.copy()
    obj.design = "~ 1"
    S = obj.n_samples
    sf = np.ones(S)
    idx = obj.counts.sum(axis=1) > 0
    cts = obj.counts[idx].astype(np.float64)
    for i in range(niter):
        obj.size_factors = sf
        obj = estimate_dispersions(obj, fit_type="mean", quiet=True)
        q = (obj.assays["mu"] / sf[None, :])[idx]
        disps = obj.row_data["dispersion"][idx]

        sf_old = sf

        def neg_fn(p):
            sfv = np.exp(p - np.mean(p))
            mu_new = q * sfv[None, :]
            gene_ll = nb_logpmf_np(cts, mu_new, disps[:, None]).sum(axis=1)
            cut = np.quantile(gene_ll, quantile_q)
            return -np.sum(gene_ll[gene_ll > cut])

        res = scipy.optimize.minimize(neg_fn, np.log(sf_old),
                                      method="L-BFGS-B")
        if not res.success:
            raise RuntimeError(
                "iterative size factor normalization did not converge "
                "within an iteration")
        sf = np.exp(res.x - np.mean(res.x))
        if i > 0 and np.sum((np.log(sf_old) - np.log(sf)) ** 2) < 1e-4:
            break
        if i == niter - 1:
            raise RuntimeError(
                "iterative size factor normalization did not converge")
    return sf
