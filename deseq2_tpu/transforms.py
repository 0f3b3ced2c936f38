"""Variance-stabilizing transforms: VST, rlog, normTransform.

Reference: varianceStabilizingTransformation/getVarianceStabilizedData/vst
(R/vst.R:112-267), rlog/rlogData (R/rlog.R:108-287), normTransform
(R/helper.R:421-435).
"""

from __future__ import annotations

import os
import warnings

import numpy as np
from scipy.special import gammaln

from .dispersions import (estimate_dispersions_fit,
                          estimate_dispersions_gene_est,
                          get_base_means_and_variances)
from .glm import fit_nbinom_glms
from .quantiles import (match_weighted_upper_quantile_for_variance,
                        r_quantile_type7)
from .sizefactors import estimate_size_factors


class DESeqTransform:
    """Transformed data container (reference DESeqTransform,
    R/AllClasses.R:460-489).

    On an accelerator backend the (G,S) payload may be device-resident
    (the transforms compute it there); `.matrix` materializes to host
    numpy on first access.  Over a network-attached chip the download
    is the dominant transform cost (~12 s for 60k x 1k at measured
    tunnel bandwidth), so consumers that only need reductions (e.g.
    plot_pca's top-variance genes) should slice/reduce `matrix_device`
    before touching `.matrix`."""

    def __init__(self, matrix, col_data, row_names, col_names, attrs=None):
        self._matrix = matrix
        self.col_data = col_data
        self.row_names = row_names
        self.col_names = col_names
        self.attrs = attrs or {}

    @property
    def matrix(self):
        m = self._matrix
        if not isinstance(m, np.ndarray):
            import jax
            m = np.asarray(jax.device_get(m), np.float64)
            self._matrix = m
        return m

    @matrix.setter
    def matrix(self, value):
        self._matrix = value

    @property
    def matrix_device(self):
        """The payload as stored — a device array after a device-path
        transform, else host numpy."""
        return self._matrix

    @property
    def shape(self):
        return self._matrix.shape


def _geneest_trend_fused(dds, fit_type):
    """Gene-wise dispersion estimates + trend through the fused engine
    (one on-device program) for the transforms' estimation step —
    R serves the same step through its C++ hot kernels
    (R/vst.R:253-254, R/rlog.R:141-142).  Returns the populated
    dataset, or None when the configuration must take the host path
    (CPU backend, ineligible design, non-closed-form trend)."""
    if not _use_device(dds) or fit_type not in ("parametric", "local",
                                                "mean"):
        return None
    from .engine import deseq_fused, fused_ineligibility
    if fused_ineligibility(dds, "Wald", fit_type, "ratio", False, None,
                           None, None, None) is not None:
        return None
    try:
        routed = deseq_fused(dds.copy(share_counts=True), test="Wald",
                             fit_type=fit_type, quiet=True,
                             min_replicates_for_replace=np.inf)
    except Exception:
        return None
    return routed


def variance_stabilizing_transformation(dds, blind=True,
                                        fit_type="parametric"):
    """(reference varianceStabilizingTransformation, R/vst.R:112-142)"""
    dds = dds.copy()
    if dds.size_factors is None and dds.normalization_factors is None:
        dds = estimate_size_factors(dds)
    if blind:
        dds.design = "~ 1"
        from .formula import parse_formula
        dds.design = parse_formula("~ 1")
    if blind or dds.dispersion_function is None:
        routed = _geneest_trend_fused(dds, fit_type)
        if routed is not None:
            dds = routed
        else:
            dds = estimate_dispersions_gene_est(dds, quiet=True)
            dds = estimate_dispersions_fit(dds, fit_type=fit_type,
                                           quiet=True)
    vsd = _get_vsd_raw(dds)
    return DESeqTransform(vsd, dds.col_data, dds.row_names, dds.col_names)


def _use_device(dds):
    """Route the (G,S) elementwise transform math through the
    accelerator when one is attached and the matrix is big enough for
    the transfer to win (R serves rlog through its C++ hot kernel,
    R/rlog.R:249-253 — the TPU build serves the transforms through the
    batched device path).  CPU/test runs keep the f64 host path."""
    import jax
    if os.environ.get("DESEQ2_TPU_TRANSFORM_DEVICE", "") == "0":
        return False
    return (jax.default_backend() != "cpu"
            and dds.counts.size >= (1 << 20))


def get_variance_stabilized_data(dds):
    """Closed-form / numeric-integral / asinh VST
    (reference getVarianceStabilizedData, R/vst.R:146-193).
    Always returns host numpy; the transform wrappers use
    _get_vsd_raw to keep the payload device-resident."""
    raw = _get_vsd_raw(dds)
    if not isinstance(raw, np.ndarray):
        import jax
        raw = np.asarray(jax.device_get(raw), np.float64)
    return raw


def _get_vsd_raw(dds):
    """VST payload; a DEVICE array on the accelerator closed-form
    paths (the (G,S) download is the dominant cost over a
    network-attached chip — defer it to DESeqTransform.matrix).

    The local-trend spline path stays host-side (1-D fit, never hot)."""
    disp_fn = dds.dispersion_function
    if disp_fn is None or disp_fn.fit_type is None:
        raise ValueError("call estimate_dispersions before "
                         "get_variance_stabilized_data")
    if disp_fn.fit_type in ("parametric", "mean") and _use_device(dds):
        return _vst_closed_form_dev(dds, disp_fn)
    ncounts = dds.counts_normalized()
    if disp_fn.fit_type == "parametric":
        asympt_disp, extra_pois = disp_fn.coefficients
        q = ncounts
        return np.log((1.0 + extra_pois + 2.0 * asympt_disp * q
                       + 2.0 * np.sqrt(asympt_disp * q
                                       * (1.0 + extra_pois
                                          + asympt_disp * q)))
                      / (4.0 * asympt_disp)) / np.log(2.0)
    if disp_fn.fit_type == "local":
        # numeric trapezoid integration of 1/sqrt(var(x)) on an asinh grid,
        # cubic-spline interpolation, affine calibration to log2 at the
        # .95/.999 quantiles (R/vst.R:157-183)
        from scipy.interpolate import CubicSpline
        if dds.size_factors is not None:
            sf = dds.size_factors
        else:
            sf = np.exp(np.mean(np.log(dds.normalization_factors), axis=0))
        xg = np.sinh(np.linspace(np.arcsinh(0), np.arcsinh(ncounts.max()),
                                 1000))[1:]
        xim = np.mean(1.0 / sf)
        base_vars_at_grid = disp_fn(xg) * xg ** 2 + xim * xg
        integrand = 1.0 / np.sqrt(base_vars_at_grid)
        mid = np.arcsinh((xg[1:] + xg[:-1]) / 2)
        csum = np.cumsum((xg[1:] - xg[:-1])
                         * (integrand[1:] + integrand[:-1]) / 2)
        splf = CubicSpline(mid, csum)
        row_means = ncounts.mean(axis=1)
        h1 = r_quantile_type7(row_means, 0.95)
        h2 = r_quantile_type7(row_means, 0.999)
        eta = (np.log2(h2) - np.log2(h1)) / \
            (splf(np.arcsinh(h2)) - splf(np.arcsinh(h1)))
        xi = np.log2(h1) - eta * splf(np.arcsinh(h1))
        return eta * splf(np.arcsinh(ncounts)) + xi
    if disp_fn.fit_type == "mean":
        alpha = disp_fn.mean
        q = ncounts
        return (2.0 * np.arcsinh(np.sqrt(alpha * q)) - np.log(alpha)
                - np.log(4.0)) / np.log(2.0)
    raise ValueError("fitType is not parametric, local or mean")


def _vst_closed_form_dev(dds, disp_fn):
    """Parametric/mean VST evaluated on device (counts via the engine
    placement cache; sf or (G,S) normalization factors on device)."""
    import jax
    import jax.numpy as jnp

    from .engine import _device_counts

    y = _device_counts(dds.counts)
    if dds.normalization_factors is not None:
        nf = jnp.asarray(np.asarray(dds.normalization_factors,
                                    np.float32))
    else:
        nf = jnp.asarray(np.asarray(dds.size_factors, np.float32))

    if disp_fn.fit_type == "parametric":
        a, ep = (float(v) for v in disp_fn.coefficients)

        @jax.jit
        def go(y, nf):
            q = y.astype(jnp.float32) / nf
            aq = a * q
            return (jnp.log((1.0 + ep + 2.0 * aq
                             + 2.0 * jnp.sqrt(aq * (1.0 + ep + aq)))
                            / (4.0 * a)) / np.log(2.0))
    else:
        al = float(disp_fn.mean)

        @jax.jit
        def go(y, nf):
            q = y.astype(jnp.float32) / nf
            return ((2.0 * jnp.arcsinh(jnp.sqrt(al * q)) - np.log(al)
                     - np.log(4.0)) / np.log(2.0))

    return go(y, nf)   # device array; callers fetch lazily


def _base_stats_dev(dds):
    """baseMean/baseVar/allZero on device (one fused reduction over the
    placement-cached counts, three (G,) fetches) — the host
    get_base_means_and_variances costs ~7 s of numpy sweeps at
    60k x 1k."""
    import jax
    import jax.numpy as jnp

    from .engine import _device_counts

    y = _device_counts(dds.counts)
    if dds.normalization_factors is not None:
        nf = jnp.asarray(np.asarray(dds.normalization_factors,
                                    np.float32))
    else:
        nf = jnp.asarray(np.asarray(dds.size_factors, np.float32))

    @jax.jit
    def go(y, nf):
        q = y.astype(jnp.float32) / nf
        bm = q.mean(axis=1)
        bv = q.var(axis=1, ddof=1)
        az = jnp.sum(y, axis=1) == 0
        return bm, bv, az

    bm, bv, az = jax.device_get(go(y, nf))
    return (np.asarray(bm, np.float64), np.asarray(bv, np.float64),
            np.asarray(az, bool))


def vst(dds, blind=True, nsub=1000, fit_type="parametric"):
    """Fast VST: estimate the trend on a 1000-gene subset spanning the mean
    range (reference vst, R/vst.R:219-267)."""
    if dds.n_genes < nsub:
        raise ValueError("less than 'nsub' rows, use "
                         "variance_stabilizing_transformation directly")
    dds = dds.copy()
    if blind:
        from .formula import parse_formula
        dds.design = parse_formula("~ 1")
    if dds.size_factors is None and dds.normalization_factors is None:
        dds = estimate_size_factors(dds)
    if _use_device(dds):
        base_mean, _, _ = _base_stats_dev(dds)
    else:
        base_mean = dds.counts_normalized().mean(axis=1)
    if np.sum(base_mean > 5) < nsub:
        raise ValueError("less than 'nsub' rows with mean normalized "
                         "count > 5, use variance_stabilizing_transformation")
    sub_idx = np.where(base_mean > 5)[0]
    bm_sub = base_mean[sub_idx]
    o = np.argsort(bm_sub, kind="stable")
    # R: o[round(seq(from=1, to=length(o), length=nsub))]
    pick = np.round(np.linspace(1, len(o), nsub)).astype(int) - 1
    object_sub = dds.subset_genes(sub_idx[o[pick]])
    routed = _geneest_trend_fused(object_sub, fit_type)
    if routed is not None:
        object_sub = routed
    else:
        object_sub = estimate_dispersions_gene_est(object_sub, quiet=True)
        object_sub = estimate_dispersions_fit(object_sub,
                                              fit_type=fit_type,
                                              quiet=True)
    if _use_device(dds):
        bm, bv, az = _base_stats_dev(dds)
        dds.set_row_data("baseMean", bm, "intermediate",
                         "mean of normalized counts for all samples")
        dds.set_row_data("baseVar", bv, "intermediate",
                         "variance of normalized counts for all samples")
        dds.set_row_data("allZero", az, "intermediate",
                         "all counts for a gene are zero")
    else:
        dds = get_base_means_and_variances(dds)
    from .dispersions import set_dispersion_function
    # the subset's trend is applied to the full object; varLogDispEsts is
    # not recomputed over the full set (matches the reference assignment)
    dds.dispersion_function = object_sub.dispersion_function
    nzmask = ~dds.row_data["allZero"]
    disp_fit = np.full(dds.n_genes, np.nan)
    disp_fit[nzmask] = object_sub.dispersion_function(
        dds.row_data["baseMean"][nzmask])
    dds.set_row_data("dispFit", disp_fit, "intermediate",
                     "fitted values of dispersion")
    vsd = _get_vsd_raw(dds)
    return DESeqTransform(vsd, dds.col_data, dds.row_names, dds.col_names)


def norm_transform(dds, f=np.log2, pc=1):
    """f(normalized counts + pc) (reference normTransform,
    R/helper.R:421-435)."""
    dds = dds.copy()
    if dds.size_factors is None and dds.normalization_factors is None:
        dds = estimate_size_factors(dds)
    nt = f(dds.counts_normalized() + pc)
    return DESeqTransform(nt, dds.col_data, dds.row_names, dds.col_names)


# ---------------------------------------------------------------------------
# rlog
# ---------------------------------------------------------------------------

def rlog(dds, blind=True, intercept=None, beta_prior_var=None,
         fit_type="parametric"):
    """Regularized log transform (reference rlog, R/rlog.R:108-164)."""
    dds = dds.copy()
    if dds.size_factors is None and dds.normalization_factors is None:
        dds = estimate_size_factors(dds)
    if blind:
        from .formula import parse_formula
        dds.design = parse_formula("~ 1")
    if intercept is None:
        if _use_device(dds):
            import jax
            import jax.numpy as jnp
            from .engine import _device_counts
            yd = _device_counts(dds.counts)
            if dds.normalization_factors is not None:
                nfd = jnp.asarray(np.asarray(dds.normalization_factors,
                                             np.float32))
            else:
                nfd = jnp.asarray(np.asarray(dds.size_factors,
                                             np.float32))
            rs, rmx = jax.jit(lambda y, nf: (
                (y.astype(jnp.float32) / nf).sum(axis=1),
                (y.astype(jnp.float32) / nf).max(axis=1)))(yd, nfd)
            _sparse_test_stats(*jax.device_get((rs, rmx)), 0.9, 100, 0.1)
        else:
            _sparse_test(dds.counts_normalized(), 0.9, 100, 0.1)
    if blind or "dispFit" not in dds.row_data:
        routed = _geneest_trend_fused(dds, fit_type)
        if routed is not None:
            dds = routed
        else:
            if "baseMean" not in dds.row_data:
                dds = get_base_means_and_variances(dds)
            dds = estimate_dispersions_gene_est(dds, quiet=True)
            dds = estimate_dispersions_fit(dds, fit_type=fit_type,
                                           quiet=True)
    rld, bpv, fitted_intercept = rlog_data(dds, intercept, beta_prior_var)
    t = DESeqTransform(rld, dds.col_data, dds.row_names, dds.col_names,
                       attrs={"betaPriorVar": bpv})
    if fitted_intercept is not None:
        t.attrs["rlogIntercept"] = fitted_intercept
    return t


def _rlog_arrow_irls(y, nf, alpha, lam0_nat, lam1_nat, has_intercept,
                     tol=1e-4, maxit=100, min_mu=0.5):
    """Ridge IRLS specialized to the rlog design (SURVEY hard part 6).

    The rlog model matrix is [1 | I_S] (intercept + one indicator per
    sample; R/rlog.R:190-196), so X'WX + diag(ridge) is an ARROW matrix
    [[a00, w'], [w, diag(w)+lam1]] and each IRLS sweep solves it in
    O(S) per gene by block elimination (Schur complement of the
    diagonal block) instead of the O(S^3) dense solve the generic
    (S+1)-column path would cost.  With a frozen intercept the design
    is I_S and the system is fully diagonal.

    Same update/convergence rules as ops/irls.py (src/DESeq2.cpp:282-465,
    deviance-relative tol; |beta|>30 divergence guard).  Natural-log
    scale throughout; returns (xbeta (G,S), intercept (G,), iters)."""
    G, S = y.shape
    y = np.asarray(y, dtype=np.float64)
    nf = np.asarray(nf, dtype=np.float64)
    alpha = np.asarray(alpha, dtype=np.float64)[:, None]
    size = 1.0 / alpha
    norm_c = y / nf

    if has_intercept:
        # rank-deficient design: init = intercept-only (glm.py rule)
        with np.errstate(divide="ignore"):
            b0 = np.log(norm_c.mean(axis=1))
        b0 = np.where(np.isfinite(b0), b0, 0.0)
        bs = np.zeros((G, S))
    else:
        b0 = np.zeros(G)
        bs = np.log(norm_c + 0.1)

    def mu_of(b0v, bsv):
        return np.maximum(nf * np.exp(b0v[:, None] + bsv), min_mu)

    def deviance(mu):
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(y > 0, y * (np.log(mu) - np.log(size + mu)), 0.0)
            core = (gammaln(y + size) - gammaln(size) - gammaln(y + 1.0)
                    + size * np.log(size / (size + mu)) + t)
        return -2.0 * core.sum(axis=1)

    mu = mu_of(b0, bs)
    dev_old = np.zeros(G)
    active = np.ones(G, bool)
    iters = np.zeros(G, np.int64)
    for t_it in range(maxit):
        if not active.any():
            break
        iters[active] += 1
        w = mu / (1.0 + alpha * mu)
        z = np.log(mu / nf) + (y - mu) / mu
        rs = w * z
        if has_intercept:
            d = w + lam1_nat
            swd = (w * w / d).sum(axis=1)
            schur = w.sum(axis=1) + lam0_nat - swd
            b0_new = (rs.sum(axis=1) - (w * rs / d).sum(axis=1)) / schur
            bs_new = (rs - w * b0_new[:, None]) / d
        else:
            b0_new = b0
            bs_new = rs / (w + lam1_nat)
        absmax = np.maximum(np.abs(b0_new), np.abs(bs_new).max(axis=1))
        diverged = absmax > 30.0
        upd = active
        b0 = np.where(upd, b0_new, b0)
        bs = np.where(upd[:, None], bs_new, bs)
        cont = active & ~diverged
        mu_new = mu_of(b0_new, bs_new)
        mu = np.where(cont[:, None], mu_new, mu)
        dev_new = deviance(mu_new)
        with np.errstate(invalid="ignore"):
            conv_test = np.abs(dev_new - dev_old) / (np.abs(dev_new) + 0.1)
        bad = np.isnan(conv_test)
        converged = (t_it > 0) & (conv_test < tol)
        active = cont & ~bad & ~converged
        dev_old = np.where(cont, dev_new, dev_old)
    return b0[:, None] + bs if has_intercept else bs, b0, iters


def _rlog_arrow_irls_dev(y, nf, alpha, lam0_nat, lam1_nat, has_intercept,
                         tol=1e-4, maxit=100, min_mu=0.5):
    """Device (JAX) port of _rlog_arrow_irls: the same O(S)-per-gene
    arrow-solve IRLS, batched over genes on the accelerator, f32.

    `y` may be a device array (gathered from the engine placement
    cache); `nf` is (S,) shared size factors or a (G,S) matrix.
    Returns host numpy (xbeta (G,S), intercept (G,), iters)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("has_int", "maxit"))
    def run(y, nf, alpha, lam0, lam1, has_int, maxit):
        dtype = jnp.float32
        y = y.astype(dtype)
        nf = nf.astype(dtype)
        alpha = alpha.astype(dtype)[:, None]
        size = 1.0 / alpha
        norm_c = y / nf
        G = y.shape[0]

        if has_int:
            m = jnp.maximum(norm_c.mean(axis=1), 1e-30)
            b0 = jnp.where(norm_c.sum(axis=1) > 0, jnp.log(m), 0.0)
            bs = jnp.zeros_like(y)
        else:
            b0 = jnp.zeros(G, dtype)
            bs = jnp.log(norm_c + 0.1)

        # mu-independent deviance part, computed once
        dev_const = -2.0 * jnp.sum(
            jax.lax.lgamma(y + size) - jax.lax.lgamma(size)
            - jax.lax.lgamma(y + 1.0), axis=1)

        def mu_of(b0v, bsv):
            return jnp.maximum(nf * jnp.exp(b0v[:, None] + bsv), min_mu)

        def deviance(mu):
            t = jnp.where(y > 0,
                          y * (jnp.log(mu) - jnp.log(size + mu)), 0.0)
            core = size * jnp.log(size / (size + mu)) + t
            return dev_const + (-2.0) * jnp.sum(core, axis=1)

        def body(state):
            t_it, b0, bs, mu, dev_old, active, iters = state
            iters = iters + active.astype(jnp.int32)
            w = mu / (1.0 + alpha * mu)
            z = jnp.log(mu / nf) + (y - mu) / mu
            rs = w * z
            if has_int:
                d = w + lam1
                swd = jnp.sum(w * w / d, axis=1)
                schur = jnp.sum(w, axis=1) + lam0 - swd
                b0_new = (jnp.sum(rs, axis=1)
                          - jnp.sum(w * rs / d, axis=1)) / schur
                bs_new = (rs - w * b0_new[:, None]) / d
            else:
                b0_new = b0
                bs_new = rs / (w + lam1)
            absmax = jnp.maximum(jnp.abs(b0_new),
                                 jnp.max(jnp.abs(bs_new), axis=1))
            diverged = absmax > 30.0
            b0 = jnp.where(active, b0_new, b0)
            bs = jnp.where(active[:, None], bs_new, bs)
            cont = active & ~diverged
            mu_new = mu_of(b0_new, bs_new)
            mu = jnp.where(cont[:, None], mu_new, mu)
            dev_new = deviance(mu_new)
            conv_test = jnp.abs(dev_new - dev_old) / (jnp.abs(dev_new)
                                                      + 0.1)
            bad = jnp.isnan(conv_test)
            converged = (t_it > 0) & (conv_test < tol)
            active = cont & ~bad & ~converged
            dev_old = jnp.where(cont, dev_new, dev_old)
            return t_it + 1, b0, bs, mu, dev_old, active, iters

        state = (jnp.zeros((), jnp.int32), b0, bs, mu_of(b0, bs),
                 jnp.zeros(G, dtype), jnp.ones(G, bool),
                 jnp.zeros(G, jnp.int32))
        state = jax.lax.while_loop(
            lambda s: (s[0] < maxit) & jnp.any(s[5]), body, state)
        _, b0, bs, _, _, _, iters = state
        xbeta = b0[:, None] + bs if has_int else bs
        return xbeta, b0, iters

    xbeta, b0, iters = run(jnp.asarray(y), jnp.asarray(nf),
                           jnp.asarray(np.asarray(alpha, np.float32)),
                           jnp.float32(lam0_nat), jnp.float32(lam1_nat),
                           has_int=bool(has_intercept), maxit=maxit)
    # device arrays: the (G,S) payload stays on device (the download
    # dominates transform wall time over a network-attached chip);
    # the (G,) intercept is fetched by the caller when needed
    return xbeta, b0, iters


def _rlog_prior_var_dev(dds, nz):
    """The rlog prior variance (weighted upper-quantile match of the
    observed LFC matrix, R/rlog.R:233-240) on device: the host version
    sorts G*S ~ 6e7 values in numpy (~15-25 s at the headline shape);
    here the sort + Hmisc-semantics cumulative-weight quantile run on
    chip and one scalar returns.  Duplicate-value collapse (wtd.table)
    is skipped: ties share a y-value, so the right-continuous step
    lookup returns the same quantile either way."""
    import jax
    import jax.numpy as jnp

    from .engine import _device_counts
    from scipy.stats import norm as _norm

    nz_idx = np.where(nz)[0]
    y = _device_counts(dds.counts)[jnp.asarray(nz_idx)]
    if dds.normalization_factors is not None:
        nf = jnp.asarray(np.asarray(dds.normalization_factors,
                                    np.float32)[nz])
    else:
        nf = jnp.asarray(np.asarray(dds.size_factors, np.float32))
    bm = jnp.asarray(np.asarray(dds.row_data["baseMean"],
                                np.float32)[nz])
    dfit = jnp.asarray(np.asarray(dds.row_data["dispFit"],
                                  np.float32)[nz])

    @jax.jit
    def go(y, nf, bm, dfit):
        q = y.astype(jnp.float32) / nf
        lfc = (jnp.log2(q + 0.5) - jnp.log2(bm + 0.5)[:, None])
        w = 1.0 / (1.0 / bm + dfit)
        x = jnp.abs(lfc).ravel()
        wts = jnp.broadcast_to(w[:, None], lfc.shape).ravel()
        n_el = x.shape[0]
        wts = wts * (n_el / jnp.sum(wts))          # normwt
        xs, ws = jax.lax.sort((x, wts), num_keys=1)
        cumw = jnp.cumsum(ws)
        n = cumw[-1]
        prob = 0.95
        ordv = 1.0 + (n - 1.0) * prob
        low = jnp.maximum(jnp.floor(ordv), 1.0)
        high = jnp.minimum(low + 1.0, n)
        frac = ordv % 1.0
        il = jnp.clip(jnp.searchsorted(cumw, low, side="left"),
                      0, n_el - 1)
        ih = jnp.clip(jnp.searchsorted(cumw, high, side="left"),
                      0, n_el - 1)
        return (1.0 - frac) * xs[il] + frac * xs[ih]

    q95 = float(np.asarray(jax.device_get(go(y, nf, bm, dfit))))
    return float((q95 / _norm.ppf(1 - 0.05 / 2)) ** 2)


def rlog_data(dds, intercept=None, beta_prior_var=None):
    """Shrunken per-sample log2 fits (reference rlogData,
    R/rlog.R:172-272).

    Design: intercept + one indicator per sample, ridge on all but the
    intercept.  The reference fits an (S+1)-coefficient GLM; the batched
    IRLS handles this directly for moderate S.
    """
    if "dispFit" not in dds.row_data:
        raise ValueError("first estimate dispersion")
    if "allZero" not in dds.row_data or "baseMean" not in dds.row_data:
        dds = get_base_means_and_variances(dds)
    S = dds.n_samples

    if intercept is None:
        # model matrix: intercept + indicator per sample (null_level trick
        # gives S indicator columns, R/rlog.R:190-196)
        model_matrix = np.column_stack([np.ones(S), np.eye(S)])
        model_matrix_names = ["Intercept"] + \
            [f"samples{j+1}" for j in range(S)]
    else:
        intercept = np.asarray(intercept, dtype=np.float64)
        if len(intercept) != dds.n_genes:
            raise ValueError("intercept should be as long as the number of "
                             "rows of object")
        model_matrix = np.eye(S)
        model_matrix_names = [f"samples{j+1}" for j in range(S)]
        nf = dds.size_or_norm_factors()
        infinite_intercept = ~np.isfinite(intercept)
        intercept = np.where(infinite_intercept, -10.0, intercept)
        dds = dds.copy()
        dds.normalization_factors = nf * 2.0 ** intercept[:, None]
        dds.row_data["allZero"] = infinite_intercept

    nz = ~dds.row_data["allZero"]
    obj_nz = dds.subset_genes(nz)
    if np.any(np.isnan(obj_nz.row_data["dispFit"])):
        raise ValueError("NA dispFit")

    if beta_prior_var is None:
        if _use_device(dds):
            beta_prior_var = _rlog_prior_var_dev(dds, nz)
        else:
            log_counts = np.log2(obj_nz.counts_normalized() + 0.5)
            lfc_matrix = log_counts - np.log2(
                obj_nz.row_data["baseMean"] + 0.5)[:, None]
            varlogk = 1.0 / obj_nz.row_data["baseMean"] + \
                obj_nz.row_data["dispFit"]
            weights = 1.0 / varlogk
            beta_prior_var = match_weighted_upper_quantile_for_variance(
                lfc_matrix.ravel(order="F"),
                np.tile(weights, obj_nz.n_samples))
    # log2-scale ridge -> natural scale, as fitNbinomGLMs does
    # (R/fitNbinomGLMs.R:157-162)
    has_intercept = "Intercept" in model_matrix_names
    lam1_nat = (1.0 / beta_prior_var) / (np.log(2.0) ** 2)
    lam0_nat = 1e-6 / (np.log(2.0) ** 2)
    if _use_device(dds):
        # counts stay on device (placement cache + on-device nz gather);
        # shared size factors ride as an (S,) row
        import jax.numpy as jnp
        from .engine import _device_counts
        y_dev = _device_counts(dds.counts)[jnp.asarray(np.where(nz)[0])]
        if dds.normalization_factors is not None:
            nf_in = np.asarray(dds.normalization_factors,
                               np.float32)[nz]
        else:
            nf_in = np.asarray(dds.size_factors, np.float32)
        xbeta_nat, b0_nat, _ = _rlog_arrow_irls_dev(
            y_dev, nf_in, obj_nz.row_data["dispFit"],
            lam0_nat, lam1_nat, has_intercept, tol=1e-4)
        # scatter nz rows + intercept offsets on device; the (G,S)
        # payload stays there (DESeqTransform.matrix fetches lazily)
        import jax
        nz_idx = jnp.asarray(np.where(nz)[0])
        normalized_data = jnp.zeros((dds.n_genes, S), jnp.float32) \
            .at[nz_idx].set(np.log2(np.e) * xbeta_nat)
        fitted_intercept = None
        if intercept is not None:
            off = np.where(infinite_intercept, 0.0, intercept)
            normalized_data = normalized_data + \
                jnp.asarray(off, jnp.float32)[:, None]
        elif has_intercept:
            fitted_intercept = np.full(dds.n_genes, -np.inf)
            fitted_intercept[nz] = np.log2(np.e) * np.asarray(
                jax.device_get(b0_nat), np.float64)
        return normalized_data, beta_prior_var, fitted_intercept
    nf = obj_nz.size_or_norm_factors()
    xbeta_nat, b0_nat, _ = _rlog_arrow_irls(
        obj_nz.counts, nf, obj_nz.row_data["dispFit"],
        lam0_nat, lam1_nat, has_intercept, tol=1e-4)
    normalized_data_nz = np.log2(np.e) * xbeta_nat
    normalized_data = np.zeros((dds.n_genes, S))
    normalized_data[nz] = normalized_data_nz
    fitted_intercept = None
    if intercept is not None:
        normalized_data = normalized_data + \
            np.where(infinite_intercept, 0.0, intercept)[:, None]
    elif has_intercept:
        fitted_intercept = np.full(dds.n_genes, -np.inf)
        fitted_intercept[nz] = np.log2(np.e) * b0_nat
    return normalized_data, beta_prior_var, fitted_intercept


def _sparse_test(x, p, t1, t2):
    """Warn when single samples dominate row sums (reference sparseTest,
    R/rlog.R:274-287)."""
    _sparse_test_stats(x.sum(axis=1), None, p, t1, t2, x=x)


def _sparse_test_stats(rs, rmx, p, t1, t2, x=None):
    rs = np.asarray(rs, np.float64)
    if np.all(rs <= t1):
        return
    rmx = (np.asarray(rmx, np.float64) if rmx is not None
           else x.max(axis=1))
    prop = (rmx / rs)[rs > t1]
    total = np.mean(prop > p)
    if total > t2:
        warnings.warn(
            "the rlog assumes that data is close to a negative binomial "
            f"distribution; for {round(total*100,1)}% of genes with sum of "
            f"normalized counts above {t1}, a single sample's count made up "
            f"more than {p*100}% of the row sum. Consider vst() instead.")
