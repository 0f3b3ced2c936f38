"""Dispersion estimation pipeline: gene-wise MLE -> trend -> MAP shrinkage.

Reference: estimateDispersionsGeneEst (R/core.R:657-860),
estimateDispersionsFit (R/core.R:864-939), estimateDispersionsPriorVar
(R/core.R:1135-1208), estimateDispersionsMAP (R/core.R:943-1131), plus
helpers roughDispEstimate/momentsDispEstimate/linearModelMu
(R/core.R:2422-2471) and parametric/local trend fits (R/core.R:2166-2203).

Sharding note (reference R/parallel.R): gene-wise and MAP steps are
embarrassingly parallel per gene; the trend fit and prior variance are the
cross-gene reductions — 1-D fits over (baseMean, dispGeneEst) scalars that
run on host after gathering G scalars.
"""

from __future__ import annotations

import warnings

import numpy as np

import jax.numpy as jnp

from .glm import fit_nbinom_glms, get_and_check_weights
from .ops import disp as disp_ops

__all__ = [
    "estimate_dispersions", "estimate_dispersions_gene_est",
    "estimate_dispersions_fit", "estimate_dispersions_map",
    "estimate_dispersions_prior_var", "get_base_means_and_variances",
]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def get_base_means_and_variances(dds):
    """baseMean/baseVar of (weighted) normalized counts + allZero flag
    (reference getBaseMeansAndVariances, R/core.R:2138-2157)."""
    cts_norm = dds.counts_normalized()
    if "weights" in dds.assays:
        cts_norm = dds.assays["weights"] * cts_norm
    dds.set_row_data("baseMean", cts_norm.mean(axis=1), "intermediate",
                     "mean of normalized counts for all samples")
    dds.set_row_data("baseVar", cts_norm.var(axis=1, ddof=1), "intermediate",
                     "variance of normalized counts for all samples")
    dds.set_row_data("allZero", dds.counts.sum(axis=1) == 0, "intermediate",
                     "all counts for a gene are zero")
    return dds


def linear_model_mu(y, x):
    """Least-squares fitted values, the 'Huber rewrite'
    (reference linearModelMu, R/core.R:2454-2463)."""
    q, r = np.linalg.qr(x)
    return (y @ q) @ (x @ np.linalg.inv(r)).T


def linear_model_mu_normalized(dds, x):
    """(reference linearModelMuNormalized, R/core.R:2465-2471)"""
    norm_cts = dds.counts_normalized()
    muhat = linear_model_mu(norm_cts, x)
    nf = dds.size_or_norm_factors()
    return muhat * nf


def rough_disp_estimate(y, x):
    """Residual-based rough dispersion (reference R/core.R:2422-2437)."""
    mu = np.maximum(1.0, linear_model_mu(y, x))
    m, p = x.shape
    est = np.sum(((y - mu) ** 2 - mu) / mu ** 2, axis=1) / (m - p)
    return np.maximum(est, 0.0)


def moments_disp_estimate(dds):
    """Method-of-moments dispersion (reference R/core.R:2439-2448).
    Uses baseMean/baseVar which must be present."""
    if dds.normalization_factors is not None:
        xim = np.mean(1.0 / dds.normalization_factors.mean(axis=0))
    else:
        xim = np.mean(1.0 / dds.size_factors)
    bv = dds.row_data["baseVar"]
    bm = dds.row_data["baseMean"]
    with np.errstate(divide="ignore", invalid="ignore"):
        return (bv - xim * bm) / bm ** 2


def model_matrix_groups(x):
    """Factor of distinct design-matrix rows (reference R/core.R:2450-2452)."""
    rows = [tuple(r) for r in np.asarray(x)]
    seen = {}
    codes = np.empty(len(rows), dtype=np.int64)
    for i, r in enumerate(rows):
        codes[i] = seen.setdefault(r, len(seen))
    return codes, len(seen)


def n_or_more_in_cell(model_matrix, n):
    """Per sample: does its design cell have >= n replicates
    (reference nOrMoreInCell, R/core.R:2366-2371)."""
    codes, _ = model_matrix_groups(model_matrix)
    counts = np.bincount(codes)
    return counts[codes] >= n


# ---------------------------------------------------------------------------
# gene-wise estimates
# ---------------------------------------------------------------------------

def estimate_dispersions_gene_est(dds, min_disp=None, kappa_0=None,
                                  disp_tol=None, maxit=None, use_cr=None,
                                  weight_threshold=None, quiet=True,
                                  model_matrix=None, niter=None,
                                  linear_mu=None, min_mu=None,
                                  alpha_init=None, config=None):
    """Gene-wise dispersion MLE (reference R/core.R:657-860)."""
    from .config import cfg
    min_disp = cfg(min_disp, "min_disp", config)
    kappa_0 = cfg(kappa_0, "kappa_0", config)
    disp_tol = cfg(disp_tol, "disp_tol", config)
    maxit = cfg(maxit, "maxit_disp", config)
    use_cr = cfg(use_cr, "use_cr", config)
    weight_threshold = cfg(weight_threshold, "weight_threshold", config)
    niter = cfg(niter, "niter_disp", config)
    min_mu = cfg(min_mu, "min_mu", config)
    dds = dds.copy()
    if "dispGeneEst" in dds.row_data:
        dds.remove_row_data(["dispGeneEst", "dispGeneIter"])
    if np.log(min_disp / 10) <= -30:
        raise ValueError("for computational stability, log(minDisp/10) "
                         "should be above -30")
    if model_matrix is None:
        model_matrix, _ = dds.model_matrix()
    model_matrix = np.asarray(model_matrix, dtype=np.float64)
    if model_matrix.shape[0] == model_matrix.shape[1]:
        raise ValueError(
            "the number of samples and the number of model coefficients are "
            "equal, i.e., there are no replicates to estimate the dispersion. "
            "use an alternate design formula")

    dds = get_base_means_and_variances(dds)
    dds.attrs.pop("weightsOK", None)
    dds, weights, use_weights = get_and_check_weights(
        dds, model_matrix, weight_threshold=weight_threshold)
    if weights is not None:
        weights = np.maximum(weights, 1e-6)

    nz = ~dds.row_data["allZero"]
    obj_nz = dds.subset_genes(nz)
    w_nz = weights[nz] if weights is not None else None
    Gnz = obj_nz.n_genes

    if alpha_init is None:
        rough = rough_disp_estimate(obj_nz.counts_normalized(), model_matrix)
        moments = moments_disp_estimate(obj_nz)
        alpha_hat = np.minimum(rough, moments)
    else:
        alpha_hat = (np.full(Gnz, alpha_init) if np.isscalar(alpha_init)
                     else np.asarray(alpha_init, dtype=np.float64))
    max_disp = max(10.0, dds.n_samples)
    alpha_hat = np.clip(alpha_hat, min_disp, max_disp)
    alpha_init_saved = alpha_hat.copy()
    alpha_hat_new = alpha_hat.copy()

    if linear_mu is None:
        _, ngroups = model_matrix_groups(model_matrix)
        linear_mu = ngroups == model_matrix.shape[1]
        if use_weights:
            linear_mu = False

    fitidx = np.ones(Gnz, dtype=bool)
    mu = np.zeros((Gnz, dds.n_samples))
    disp_iter = np.zeros(Gnz, dtype=np.int64)
    last_lp = np.zeros(Gnz)
    initial_lp = np.zeros(Gnz)
    for it in range(niter):
        sub = obj_nz.subset_genes(fitidx)
        if not linear_mu:
            fit = fit_nbinom_glms(sub, alpha_hat=alpha_hat[fitidx],
                                  model_matrix=model_matrix, min_mu=min_mu)
            fit_mu = fit["mu"]
        else:
            fit_mu = linear_model_mu_normalized(sub, model_matrix)
        fit_mu = np.maximum(fit_mu, min_mu)
        mu[fitidx] = fit_mu

        w_sub = w_nz[fitidx] if w_nz is not None else None
        res = disp_ops.fit_disp_line_search(
            jnp.asarray(sub.counts, jnp.float64), jnp.asarray(model_matrix),
            jnp.asarray(fit_mu), jnp.asarray(np.log(alpha_hat[fitidx])),
            jnp.asarray(np.log(alpha_hat[fitidx])), 1.0,
            float(np.log(min_disp / 10)), kappa_0=kappa_0, tol=disp_tol,
            maxit=maxit, use_prior=False,
            weights=None if w_sub is None else jnp.asarray(w_sub),
            use_weights=use_weights, weight_threshold=weight_threshold,
            use_cr=use_cr)
        disp_iter[fitidx] = np.asarray(res["iter"])
        alpha_hat_new[fitidx] = np.minimum(
            np.exp(np.asarray(res["log_alpha"])), max_disp)
        last_lp[fitidx] = np.asarray(res["last_lp"])
        initial_lp[fitidx] = np.asarray(res["initial_lp"])
        with np.errstate(invalid="ignore"):
            fitidx = np.abs(np.log(alpha_hat_new) - np.log(alpha_hat)) > 0.05
        fitidx[np.isnan(fitidx)] = False
        alpha_hat = alpha_hat_new.copy()
        if fitidx.sum() == 0:
            break

    disp_gene_est = alpha_hat.copy()
    if niter == 1:
        # don't accept moves that didn't raise the posterior materially
        # (reference R/core.R:827-830)
        no_increase = last_lp < initial_lp + np.abs(initial_lp) / 1e6
        disp_gene_est[no_increase] = alpha_init_saved[no_increase]
    conv = (disp_iter < maxit) & (disp_iter != 1)

    refit = ~conv & (disp_gene_est > min_disp * 10)
    if refit.sum() > 0:
        grid = np.linspace(np.log(min_disp), np.log(max_disp), 20)
        w_sub = w_nz[refit] if w_nz is not None else None
        la = disp_ops.fit_disp_grid(
            jnp.asarray(obj_nz.counts[refit], jnp.float64),
            jnp.asarray(model_matrix), jnp.asarray(mu[refit]),
            jnp.asarray(grid), jnp.zeros(int(refit.sum())), 1.0,
            use_prior=False,
            weights=None if w_sub is None else jnp.asarray(w_sub),
            use_weights=use_weights, weight_threshold=weight_threshold,
            use_cr=use_cr)
        disp_gene_est[refit] = np.exp(np.asarray(la))
    disp_gene_est = np.clip(disp_gene_est, min_disp, max_disp)

    dds.set_row_data("dispGeneEst", _na_pad(disp_gene_est, nz), "intermediate",
                     "gene-wise estimates of dispersion")
    dds.set_row_data("dispGeneIter", _na_pad(disp_iter.astype(float), nz),
                     "intermediate", "number of iterations for gene-wise")
    dds.assays["mu"] = _na_pad_matrix(mu, nz)
    return dds


def _na_pad(values, nz_mask):
    out = np.full(len(nz_mask), np.nan)
    out[nz_mask] = values
    return out


def _na_pad_matrix(m, nz_mask):
    out = np.full((len(nz_mask), m.shape[1]), np.nan)
    out[nz_mask] = m
    return out


# ---------------------------------------------------------------------------
# trend fit
# ---------------------------------------------------------------------------

def parametric_dispersion_fit(means, disps):
    """Gamma-GLM fit of disp = asymptDisp + extraPois/mean with iterative
    outlier masking (reference parametricDispersionFit, R/core.R:2166-2189).

    The inner gamma GLM with identity link is IRLS with weights 1/mu^2 and
    working response y (R's glm.fit semantics, eps=1e-8, maxit=25)."""
    coefs = np.array([0.1, 1.0])
    it = 0
    while True:
        residuals = disps / (coefs[0] + coefs[1] / means)
        good = (residuals > 1e-4) & (residuals < 15)
        if good.sum() == 0:
            raise FloatingPointError("parametric dispersion fit failed")
        x = np.column_stack([np.ones(good.sum()), 1.0 / means[good]])
        y = disps[good]
        fit_coefs, converged = _gamma_glm_identity(x, y, start=coefs)
        oldcoefs = coefs
        coefs = fit_coefs
        if not np.all(coefs > 0):
            raise FloatingPointError("parametric dispersion fit failed")
        if np.sum(np.log(coefs / oldcoefs) ** 2) < 1e-6 and converged:
            break
        it += 1
        if it > 10:
            raise FloatingPointError("dispersion fit did not converge")
    coefs = np.asarray(coefs)

    def fn(q):
        return coefs[0] + coefs[1] / np.asarray(q, dtype=np.float64)

    return fn, coefs


def _gamma_glm_identity(x, y, start, maxit=25, eps=1e-8):
    """Gamma GLM, identity link, via IRLS (R glm.fit semantics: weights
    1/mu^2, working response y, deviance-relative convergence)."""
    beta = np.asarray(start, dtype=np.float64)
    mu = x @ beta
    if np.any(mu <= 0):
        raise FloatingPointError("cannot find valid starting values")
    dev_old = _gamma_deviance(y, mu)
    converged = False
    for _ in range(maxit):
        w = 1.0 / mu ** 2
        xtw = x.T * w
        beta = np.linalg.solve(xtw @ x, xtw @ y)
        mu = x @ beta
        if np.any(mu <= 0):
            raise FloatingPointError("gamma glm diverged to non-positive mu")
        dev = _gamma_deviance(y, mu)
        if abs(dev - dev_old) / (abs(dev) + 0.1) < eps:
            converged = True
            break
        dev_old = dev
    return beta, converged


def _gamma_deviance(y, mu):
    return 2.0 * np.sum((y - mu) / mu - np.log(y / mu))


def local_dispersion_fit(means, disps, min_disp):
    """Local regression of log disp on log mean, weighted by mean
    (reference localDispersionFit, R/core.R:2194-2203, which uses locfit).

    TPU-native substitution: tricube-weighted local quadratic regression
    (LOESS family 'gaussian', span 0.7 like locfit's default alpha) times
    the reference's prior weights = means.  Statistically equivalent to the
    locfit trend; not bit-identical (locfit is an adaptive-knot C
    implementation)."""
    if np.all(disps < min_disp * 10):
        return lambda m: np.full(np.shape(m), min_disp), None
    sel = disps >= min_disp * 10
    lx = np.log(means[sel])
    ly = np.log(disps[sel])
    pw = means[sel]  # prior weights, as in the reference call

    order = np.argsort(lx)
    lx_s, ly_s, pw_s = lx[order], ly[order], pw[order]

    def fitted_at(x0):
        x0 = np.atleast_1d(np.asarray(x0, dtype=np.float64))
        out = np.empty(len(x0))
        n = len(lx_s)
        k = max(int(np.ceil(0.7 * n)), 3)
        for i, xv in enumerate(x0):
            d = np.abs(lx_s - xv)
            idx = np.argpartition(d, min(k, n) - 1)[:k]
            h = d[idx].max()
            if h == 0:
                h = 1.0
            wloc = (1 - np.minimum(d[idx] / h, 1.0) ** 3) ** 3 * pw_s[idx]
            X = np.column_stack([np.ones(k), lx_s[idx] - xv,
                                 (lx_s[idx] - xv) ** 2])
            XtW = X.T * wloc
            try:
                beta = np.linalg.solve(XtW @ X, XtW @ ly_s[idx])
            except np.linalg.LinAlgError:
                beta = [np.average(ly_s[idx], weights=wloc)]
            out[i] = beta[0]
        return out

    def fn(m):
        m = np.asarray(m, dtype=np.float64)
        return np.exp(fitted_at(np.log(m)))

    return fn, None


def estimate_dispersions_fit(dds, fit_type="parametric", min_disp=1e-8,
                             quiet=True):
    """Fit the mean-dispersion trend and store the dispersion function
    (reference estimateDispersionsFit, R/core.R:864-939, and the
    dispersionFunction<- setter, R/methods.R:142-194)."""
    from .dataset import DispersionFunction

    dds = dds.copy()
    if "allZero" not in dds.row_data:
        dds = get_base_means_and_variances(dds)
    nz = ~dds.row_data["allZero"]
    gene_ests = dds.row_data["dispGeneEst"][nz]
    base_means = dds.row_data["baseMean"][nz]
    use_for_fit = gene_ests > 100 * min_disp
    if use_for_fit.sum() == 0:
        raise ValueError(
            "all gene-wise dispersion estimates are within 2 orders of "
            "magnitude from the minimum value; standard curve fitting "
            "techniques will not work. One can instead use the gene-wise "
            "estimates as final estimates.")

    if fit_type == "parametric":
        try:
            fn, coefs = parametric_dispersion_fit(base_means[use_for_fit],
                                                  gene_ests[use_for_fit])
            disp_fn = DispersionFunction(fn, "parametric", coefficients=coefs)
        except (FloatingPointError, np.linalg.LinAlgError):
            if not quiet:
                warnings.warn(
                    "the dispersion trend was not well captured by the "
                    "parametric function y = a/x + b; a local regression "
                    "fit was substituted")
            fit_type = "local"
    if fit_type == "local":
        fn, _ = local_dispersion_fit(base_means[use_for_fit],
                                     gene_ests[use_for_fit], min_disp)
        disp_fn = DispersionFunction(fn, "local")
    elif fit_type == "mean":
        use_for_mean = gene_ests > 10 * min_disp
        mean_disp = _trimmed_mean(gene_ests[use_for_mean], trim=0.001)
        disp_fn = DispersionFunction(lambda m: np.full(np.shape(m), mean_disp)
                                     if np.ndim(m) else mean_disp,
                                     "mean", mean=mean_disp)
    elif fit_type == "glmGamPoi":
        # local median trend with nearest-base-mean prediction
        # (reference R/core.R:906-925)
        from .gampoi import loc_median_fit, make_closest_index_disp_fn
        bm_fit = base_means[use_for_fit]
        medians = loc_median_fit(bm_fit, gene_ests[use_for_fit])
        fn = make_closest_index_disp_fn(bm_fit, medians)
        disp_fn = DispersionFunction(fn, "glmGamPoi")
    elif fit_type not in ("parametric", "local", "mean"):
        raise ValueError("unknown fitType")

    set_dispersion_function(dds, disp_fn)
    return dds


def set_dispersion_function(dds, disp_fn, estimate_var=True):
    """The dispersionFunction<- setter: computes dispFit on baseMean and
    varLogDispEsts = mad(log geneEst - log fit)^2 over non-zero genes
    (reference R/methods.R:142-194)."""
    dds.dispersion_function = disp_fn
    nz = ~dds.row_data["allZero"]
    base_means = dds.row_data["baseMean"]
    disp_fit = np.full(dds.n_genes, np.nan)
    disp_fit[nz] = np.asarray(disp_fn(base_means[nz]), dtype=np.float64)
    dds.set_row_data("dispFit", disp_fit, "intermediate",
                     "fitted values of dispersion")
    if estimate_var:
        gene_ests = dds.row_data["dispGeneEst"][nz]
        with np.errstate(divide="ignore", invalid="ignore"):
            resid = np.log(gene_ests) - np.log(disp_fit[nz])
        resid = resid[np.isfinite(resid)]
        disp_fn.var_log_disp_ests = _mad(resid) ** 2
    return dds


def _mad(x):
    """R's mad(): median absolute deviation * 1.4826."""
    med = np.median(x)
    return 1.4826 * np.median(np.abs(x - med))


def _trimmed_mean(x, trim):
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = len(x)
    k = int(np.floor(n * trim))
    if k > 0:
        x = x[k:n - k]
    return x.mean()


# ---------------------------------------------------------------------------
# prior variance and MAP shrinkage
# ---------------------------------------------------------------------------

def estimate_dispersions_prior_var(dds, min_disp=1e-8, model_matrix=None,
                                   rng_seed=2):
    """Variance of the log-normal dispersion prior
    (reference estimateDispersionsPriorVar, R/core.R:1135-1208)."""
    from scipy.special import polygamma

    nz = ~dds.row_data["allZero"]
    gene_ests = dds.row_data["dispGeneEst"][nz]
    above = gene_ests >= min_disp * 100
    if model_matrix is None:
        model_matrix, _ = dds.model_matrix()
    with np.errstate(divide="ignore", invalid="ignore"):
        disp_residuals = np.log(gene_ests) - np.log(dds.row_data["dispFit"][nz])
    if above.sum() == 0:
        raise ValueError("no data found which is greater than minDisp")
    var_log_disp_ests = dds.dispersion_function.var_log_disp_ests

    m, p = model_matrix.shape
    if (m - p) <= 3 and m > p:
        # Monte-Carlo KL matching of the residual histogram against
        # log chi^2_(m-p) + N(0, s) over a variance grid
        # (reference R/core.R:1157-1191).  The deviate stream is R's
        # exact set.seed(2) Mersenne-Twister with R's rchisq (GD/GS
        # gamma) and rnorm (inversion) algorithms (rng_r.py), consumed
        # in R's left-to-right evaluation order; histograms use R
        # hist()'s right-closed bins.  Remaining deviation: the final
        # smoothing is a direct local-quadratic loess rather than R
        # loess's surface="interpolate" kd-tree blend — it can move the
        # fine-grid argmin by ~0.01 at most.
        obs_dist = disp_residuals[above]
        brks = np.arange(-20, 21) / 2.0
        obs_dist = obs_dist[(obs_dist > brks[0]) & (obs_dist < brks[-1])]
        obs_var_grid = np.linspace(0, 8, 200)
        obs_hist = _hist_density_right(obs_dist, brks)
        chis, norms = _mc_kl_streams(rng_seed, m - p, len(obs_var_grid))
        kl_divs = np.empty(len(obs_var_grid))
        for i, v in enumerate(obs_var_grid):
            # rnorm(n, 0, sd) = sd * standard stream (R's rnorm scales
            # norm_rand()), so the cached standard draws are exact
            rand = (np.log(chis[i]) + np.sqrt(v) * norms[i]
                    - np.log(m - p))
            rand = rand[(rand > brks[0]) & (rand < brks[-1])]
            rand_hist = _hist_density_right(rand, brks)
            z = np.concatenate([obs_hist, rand_hist])
            small = z[z > 0].min()
            kl_divs[i] = np.sum(obs_hist * (np.log(obs_hist + small)
                                            - np.log(rand_hist + small)))
        fitted = _loess_quadratic(obs_var_grid, kl_divs, span=0.2)
        fine = np.linspace(0, 8, 1000)
        fitted_fine = np.interp(fine, obs_var_grid, fitted)
        argmin_kl = fine[np.argmin(fitted_fine)]
        return max(argmin_kl, 0.25)

    if m > p:
        exp_var_log_disp = polygamma(1, (m - p) / 2.0)
        return max(var_log_disp_ests - float(exp_var_log_disp), 0.25)
    return var_log_disp_ests


_MC_KL_CACHE = {}


def _mc_kl_streams(rng_seed, df, n_grid, n=10000):
    """R-exact set.seed(seed) deviate streams for the MC-KL branch,
    cached per (seed, df) across deseq() calls (ADVICE r3: the pure-
    Python scalar stream costs ~20 s; it depends only on seed and df —
    the rnorm sd scales the standard stream without changing the
    uniforms consumed — so one generation serves every call)."""
    key = (int(rng_seed), int(df), int(n_grid), int(n))
    hit = _MC_KL_CACHE.get(key)
    if hit is not None:
        return hit
    from .rng_r import RRandomState
    rng = RRandomState(rng_seed)
    chis = np.empty((n_grid, n))
    norms = np.empty((n_grid, n))
    for i in range(n_grid):
        chis[i] = rng.rchisq(n, df)
        norms[i] = rng.rnorm(n, 0.0, 1.0)
    if len(_MC_KL_CACHE) >= 4:   # ~32 MB per entry: keep a few
        _MC_KL_CACHE.pop(next(iter(_MC_KL_CACHE)))
    _MC_KL_CACHE[key] = (chis, norms)
    return chis, norms


def _hist_density_right(x, brks):
    """R hist() bin densities: right-closed intervals (a, b], lowest
    bin closed on both ends (include.lowest=TRUE)."""
    idx = np.searchsorted(brks, x, side="left") - 1
    idx = np.where((x == brks[0]), 0, idx)
    nb = len(brks) - 1
    counts = np.bincount(idx[(idx >= 0) & (idx < nb)], minlength=nb)
    widths = np.diff(brks)
    n = len(x)
    return counts / (max(n, 1) * widths)


def _loess_quadratic(x, y, span=0.2):
    """Simple loess (degree 2, tricube) used to smooth the KL curve."""
    n = len(x)
    k = max(int(np.ceil(span * n)), 4)
    out = np.empty(n)
    for i in range(n):
        d = np.abs(x - x[i])
        idx = np.argpartition(d, k - 1)[:k]
        h = d[idx].max()
        w = (1 - np.minimum(d[idx] / h, 1) ** 3) ** 3
        X = np.column_stack([np.ones(k), x[idx] - x[i], (x[idx] - x[i]) ** 2])
        XtW = X.T * w
        try:
            beta = np.linalg.solve(XtW @ X, XtW @ y[idx])
            out[i] = beta[0]
        except np.linalg.LinAlgError:
            out[i] = np.average(y[idx], weights=w)
    return out


def estimate_dispersions_map(dds, outlier_sd=None, disp_prior_var=None,
                             min_disp=None, kappa_0=None, disp_tol=None,
                             maxit=None, use_cr=None, weight_threshold=None,
                             model_matrix=None, quiet=True, type="DESeq2",
                             config=None):
    """MAP dispersion shrinkage toward the trend
    (reference estimateDispersionsMAP, R/core.R:943-1131)."""
    from .config import cfg
    outlier_sd = cfg(outlier_sd, "outlier_sd", config)
    min_disp = cfg(min_disp, "min_disp", config)
    kappa_0 = cfg(kappa_0, "kappa_0", config)
    disp_tol = cfg(disp_tol, "disp_tol", config)
    maxit = cfg(maxit, "maxit_disp", config)
    use_cr = cfg(use_cr, "use_cr", config)
    weight_threshold = cfg(weight_threshold, "weight_threshold", config)
    dds = dds.copy()
    if "allZero" not in dds.row_data:
        dds = get_base_means_and_variances(dds)
    if "dispersion" in dds.row_data:
        dds.remove_row_data(["dispersion", "dispOutlier", "dispMAP",
                             "dispIter", "dispConv"])
    if model_matrix is None:
        model_matrix, _ = dds.model_matrix()
    model_matrix = np.asarray(model_matrix, dtype=np.float64)

    nz = ~dds.row_data["allZero"]
    if disp_prior_var is None:
        if np.nansum(dds.row_data["dispGeneEst"] >= min_disp * 100) == 0:
            warnings.warn(
                f"all genes have dispersion estimates < {min_disp*10}, "
                f"returning disp = {min_disp*10}")
            disp = np.full(dds.n_genes, np.nan)
            disp[nz] = min_disp * 10
            dds.set_row_data("dispersion", disp, "intermediate",
                             "final estimates of dispersion")
            dds.dispersion_function.disp_prior_var = 0.25
            return dds
        disp_prior_var = estimate_dispersions_prior_var(
            dds, min_disp=min_disp, model_matrix=model_matrix)
    dds.dispersion_function.disp_prior_var = disp_prior_var

    dds, weights, use_weights = get_and_check_weights(
        dds, model_matrix, weight_threshold=weight_threshold)
    nz = ~dds.row_data["allZero"]
    obj_nz = dds.subset_genes(nz)
    w_nz = weights[nz] if weights is not None else None
    var_log_disp_ests = dds.dispersion_function.var_log_disp_ests

    mu = dds.assays["mu"][nz]
    gene_est = obj_nz.row_data["dispGeneEst"]
    disp_fit = obj_nz.row_data["dispFit"]

    if type == "glmGamPoi":
        # quasi-likelihood shrinkage instead of the log-normal-prior MAP
        # (reference R/core.R:1064-1096)
        if use_weights:
            raise ValueError("type='glmGamPoi' cannot handle weights")
        from .gampoi import overdispersion_shrinkage, ql_to_nb_alpha
        gene_means = obj_nz.row_data["baseMean"]
        df = dds.n_samples - model_matrix.shape[1]
        shrink = overdispersion_shrinkage(gene_est, gene_means, df, disp_fit)
        max_disp = max(10.0, dds.n_samples)
        disp_fit_corrected = ql_to_nb_alpha(
            shrink["ql_disp_trend"], gene_means, disp_fit, min_disp,
            max_disp)
        for name, vals, desc in (
                ("qlDispMLE", shrink["ql_disp_estimate"],
                 "quasi likelihood dispersion MLE"),
                ("qlDispFit", shrink["ql_disp_trend"],
                 "quasi likelihood dispersion Trend"),
                ("qlDispMAP", shrink["ql_disp_shrunken"],
                 "quasi likelihood dispersion MAP"),
                ("dispFitQLCorrected", disp_fit_corrected,
                 "dispersion trend corrected by quasi likelihood")):
            dds.set_row_data(name, _na_pad(vals, nz), "intermediate", desc)
        dds.attrs["quasiLikelihood_df0"] = shrink["ql_df0"]
        disp_map = ql_to_nb_alpha(shrink["ql_disp_shrunken"], gene_means,
                                  disp_fit, min_disp, max_disp)
        disp_iter = np.zeros(obj_nz.n_genes, dtype=np.int64)
        dispersion_final = disp_map.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            disp_outlier = (np.log(gene_est) > np.log(disp_fit)
                            + outlier_sd * np.sqrt(var_log_disp_ests))
        disp_outlier = np.where(np.isnan(disp_outlier), False,
                                disp_outlier).astype(bool)
        dispersion_final[disp_outlier] = gene_est[disp_outlier]
        dds.set_row_data("dispersion", _na_pad(dispersion_final, nz),
                         "intermediate", "final estimate of dispersion")
        dds.set_row_data("dispIter", _na_pad(disp_iter.astype(float), nz),
                         "intermediate", "number of iterations")
        disp_outlier_full = np.zeros(dds.n_genes, dtype=bool)
        disp_outlier_full[nz] = disp_outlier
        dds.set_row_data("dispOutlier", disp_outlier_full, "intermediate",
                         "dispersion flagged as outlier")
        dds.set_row_data("dispMAP", _na_pad(disp_map, nz), "intermediate",
                         "maximum a posteriori estimate")
        return dds

    # init at gene estimate unless an order of magnitude below the trend
    disp_init = np.where(gene_est > 0.1 * disp_fit, gene_est, disp_fit)
    disp_init = np.where(np.isnan(disp_init), disp_fit, disp_init)

    res = disp_ops.fit_disp_line_search(
        jnp.asarray(obj_nz.counts, jnp.float64), jnp.asarray(model_matrix),
        jnp.asarray(mu), jnp.asarray(np.log(disp_init)),
        jnp.asarray(np.log(disp_fit)), float(disp_prior_var),
        float(np.log(min_disp / 10)), kappa_0=kappa_0, tol=disp_tol,
        maxit=maxit, use_prior=True,
        weights=None if w_nz is None else jnp.asarray(w_nz),
        use_weights=use_weights, weight_threshold=weight_threshold,
        use_cr=use_cr)
    disp_map = np.exp(np.asarray(res["log_alpha"]))
    disp_iter = np.asarray(res["iter"])

    disp_conv = disp_iter < maxit
    refit = ~disp_conv
    if refit.sum() > 0:
        max_disp = max(10.0, dds.n_samples)
        grid = np.linspace(np.log(min_disp), np.log(max_disp), 20)
        w_sub = w_nz[refit] if w_nz is not None else None
        la = disp_ops.fit_disp_grid(
            jnp.asarray(obj_nz.counts[refit], jnp.float64),
            jnp.asarray(model_matrix), jnp.asarray(mu[refit]),
            jnp.asarray(grid), jnp.asarray(np.log(disp_fit[refit])),
            float(disp_prior_var), use_prior=True,
            weights=None if w_sub is None else jnp.asarray(w_sub),
            use_weights=use_weights, weight_threshold=weight_threshold,
            use_cr=True)
        disp_map[refit] = np.exp(np.asarray(la))

    max_disp = max(10.0, dds.n_samples)
    disp_map = np.clip(disp_map, min_disp, max_disp)
    dispersion_final = disp_map.copy()

    # outlier exemption: gene-wise estimates far above the trend keep their
    # own value (reference R/core.R:1105-1115)
    with np.errstate(divide="ignore", invalid="ignore"):
        disp_outlier = (np.log(gene_est) >
                        np.log(disp_fit) + outlier_sd * np.sqrt(var_log_disp_ests))
    disp_outlier = np.where(np.isnan(disp_outlier), False, disp_outlier).astype(bool)
    dispersion_final[disp_outlier] = gene_est[disp_outlier]

    dds.set_row_data("dispersion", _na_pad(dispersion_final, nz),
                     "intermediate", "final estimate of dispersion")
    dds.set_row_data("dispIter", _na_pad(disp_iter.astype(float), nz),
                     "intermediate", "number of iterations")
    disp_outlier_full = np.zeros(dds.n_genes, dtype=bool)
    disp_outlier_full[nz] = disp_outlier
    disp_outlier_full = np.where(nz, disp_outlier_full, False)
    dds.set_row_data("dispOutlier", disp_outlier_full, "intermediate",
                     "dispersion flagged as outlier")
    dds.set_row_data("dispMAP", _na_pad(disp_map, nz), "intermediate",
                     "maximum a posteriori estimate")
    return dds


def estimate_dispersions(dds, fit_type="parametric", min_disp=None,
                         quiet=True, model_matrix=None, min_mu=None,
                         config=None, **kw):
    """Three-step estimateDispersions method
    (reference R/methods.R:500-568)."""
    from .config import cfg
    min_disp = cfg(min_disp, "min_disp", config)
    min_mu = cfg(min_mu, "min_mu", config)
    if dds.size_factors is None and dds.normalization_factors is None:
        raise ValueError("first call estimate_size_factors")
    if "dispersion" in dds.row_data:
        if not quiet:
            warnings.warn("found already estimated dispersions, replacing")
        dds = dds.copy()
        dds.remove_row_data(["dispersion", "dispOutlier", "dispMAP",
                             "dispIter", "dispGeneEst", "dispGeneIter",
                             "dispFit"])
    # replicate check (reference checkForExperimentalReplicates)
    mm = model_matrix if model_matrix is not None else dds.model_matrix()[0]
    if np.asarray(mm).shape[0] == np.asarray(mm).shape[1]:
        raise ValueError(
            "the design matrix has the same number of samples and "
            "coefficients to fit, estimation of dispersion is not possible")
    # constant-row guard (reference R/methods.R:522-529)
    rng_rows = dds.counts.max(axis=1) - dds.counts.min(axis=1)
    if np.all(rng_rows == 0):
        raise ValueError("all genes have equal values for all samples; "
                         "will not be able to perform differential analysis")
    dds = estimate_dispersions_gene_est(dds, min_disp=min_disp, quiet=quiet,
                                        model_matrix=model_matrix,
                                        min_mu=min_mu, config=config, **kw)
    dds = estimate_dispersions_fit(dds, fit_type=fit_type, min_disp=min_disp,
                                   quiet=quiet)
    dds = estimate_dispersions_map(dds, min_disp=min_disp, quiet=quiet,
                                   model_matrix=model_matrix,
                                   type=("glmGamPoi" if fit_type ==
                                         "glmGamPoi" else "DESeq2"),
                                   config=config)
    return dds
