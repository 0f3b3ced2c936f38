"""NB GLM batch driver: the fitNbinomGLMs equivalent.

Reference: R/fitNbinomGLMs.R:29-236 (driver), 340-407 (optim fallback),
R/core.R:2697-2752 (weights checking).  The heavy lifting is the batched
IRLS kernel (ops/irls.py); this module supplies beta initialization, the
intercept-only closed form, log2<->natural-log conversions, and the
per-row L-BFGS-B fallback for rows the IRLS could not fit (host scipy —
the same Fortran L-BFGS-B that R's optim uses, and typically O(10) rows).
"""

from __future__ import annotations

import numpy as np
import scipy.optimize
from scipy.special import gammaln

import jax.numpy as jnp

from .formula import make_names, parse_formula, rename_model_matrix_columns
from .ops import irls

LOG2E = np.log2(np.e)
LN2 = np.log(2.0)


def nb_logpmf_np(y, mu, alpha):
    size = 1.0 / alpha
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(y > 0, y * (np.log(mu) - np.log(size + mu)), 0.0)
        out = (gammaln(y + size) - gammaln(size) - gammaln(y + 1.0)
               + size * (np.log(size) - np.log(size + mu)) + t)
    return out


def get_and_check_weights(dds, model_matrix, weight_threshold=1e-2):
    """Reference getAndCheckWeights (R/core.R:2697-2752).

    Normalizes weights rows to max 1; rows whose weights produce a
    rank-deficient design (or break the CR subset) are flagged
    weightsFail and demoted to allZero.
    Returns (dds, weights (G,S) or None, use_weights).
    """
    if "weights" not in dds.assays:
        return dds, None, False
    weights = np.asarray(dds.assays["weights"], dtype=np.float64)
    if np.any(weights < 0):
        raise ValueError("weights must be non-negative")
    weights = weights / weights.max(axis=1, keepdims=True)
    if not dds.attrs.get("weightsOK"):
        m = model_matrix.shape[1]
        full_rank = np.linalg.matrix_rank(model_matrix) == m
        G = weights.shape[0]
        weights_ok = np.ones(G, dtype=bool)
        if full_rank:
            for i in range(G):
                test1 = np.linalg.matrix_rank(
                    weights[i][:, None] * model_matrix) == m
                mm_sub = model_matrix[weights[i] > weight_threshold, :]
                mm_sub = mm_sub[:, np.abs(mm_sub).sum(axis=0) > 0]
                test2 = (mm_sub.size > 0 and
                         np.linalg.matrix_rank(mm_sub) == mm_sub.shape[1])
                weights_ok[i] = test1 and test2
        else:
            for j in range(m):
                num_zero = ((weights * model_matrix[None, :, j]) == 0).sum(axis=1)
                weights_ok &= num_zero != model_matrix.shape[0]
        if not np.all(weights_ok):
            import warnings
            if "allZero" in dds.row_data:
                dds.row_data["allZero"] = dds.row_data["allZero"] | ~weights_ok
            dds.set_row_data("weightsFail", ~weights_ok, "intermediate",
                             "weights fail to allow parameter estimation")
            warnings.warn(
                f"for {int((~weights_ok).sum())} row(s), the weights as "
                "supplied won't allow parameter estimation, producing a "
                "degenerate design matrix. These rows have been flagged "
                "in mcols(dds)$weightsFail and treated as if the row "
                "contained all zeros (mcols(dds)$allZero set to TRUE). "
                "If you are blocking for donors/organisms, consider "
                "design = ~0+donor+condition.")
        dds.attrs["weightsOK"] = True
    return dds, weights, True


def fit_nbinom_glms(dds, model_matrix=None, model_matrix_names=None,
                    model_formula=None, alpha_hat=None, lam=None,
                    rename_cols=True, beta_tol=None, maxit=None,
                    use_optim=None, use_qr=None, force_optim=False,
                    warn_nonpos_var=True, min_mu=None, config=None):
    """Batched fitNbinomGLMs (reference R/fitNbinomGLMs.R:29-236).

    Operates over the rows of `dds` as given (callers pass the non-zero
    subset).  Coefficients and SEs are returned on the log2 scale.
    """
    from .config import cfg
    beta_tol = cfg(beta_tol, "beta_tol", config)
    maxit = cfg(maxit, "maxit_beta", config)
    use_optim = cfg(use_optim, "use_optim", config)
    use_qr = cfg(use_qr, "use_qr", config)
    min_mu = cfg(min_mu, "min_mu", config)
    just_intercept = False
    if model_matrix is None:
        formula = dds.design if model_formula is None else parse_formula(model_formula)
        if isinstance(formula, np.ndarray):
            model_matrix = formula.astype(np.float64)
            names = [f"x{i+1}" for i in range(model_matrix.shape[1])]
        else:
            model_matrix, names = dds.model_matrix(formula)
            just_intercept = (not formula.terms) and formula.intercept
    else:
        model_matrix = np.asarray(model_matrix, dtype=np.float64)
        names = (list(model_matrix_names) if model_matrix_names is not None
                 else [f"x{i+1}" for i in range(model_matrix.shape[1])])
        just_intercept = (model_matrix.shape[1] == 1
                          and np.all(model_matrix == 1.0))
    if np.any(np.abs(model_matrix).sum(axis=0) == 0):
        raise ValueError("model matrix has all-zero column")

    names = ["Intercept" if n == "(Intercept)" else n for n in names]
    names = make_names(names)
    if rename_cols and not isinstance(dds.design, np.ndarray):
        conv = rename_model_matrix_columns(
            dds.col_data, dds.design if model_formula is None else model_formula)
        names = [conv.get(n, n) for n in names]

    nf = dds.size_or_norm_factors()
    if alpha_hat is None:
        alpha_hat = dds.row_data.get("dispersion")
        if alpha_hat is None:
            raise ValueError("no dispersions: first call estimate_dispersions")
    alpha_hat = np.asarray(alpha_hat, dtype=np.float64)
    if len(alpha_hat) != dds.n_genes:
        raise ValueError("alpha_hat needs length nrow(object)")
    p = model_matrix.shape[1]
    if lam is None:
        lam = np.full(p, 1e-6)
    lam = np.asarray(lam, dtype=np.float64)

    dds, weights, use_weights = get_and_check_weights(dds, model_matrix)
    counts = dds.counts.astype(np.float64)
    norm_counts = counts / nf
    # dispersions column used for the returned log-likelihood
    disp_col = dds.row_data.get("dispersion")

    # ---- intercept-only closed form (fitNbinomGLMs.R:99-137) -------------
    if just_intercept and np.all(lam <= 1e-6):
        G = dds.n_genes
        if use_weights:
            beta = np.log2(np.sum(weights * norm_counts, axis=1)
                           / np.sum(weights, axis=1))
        else:
            beta = np.log2(norm_counts.mean(axis=1))
        beta_matrix = beta[:, None]
        mu = nf * (2.0 ** beta)[:, None]
        ll_mat = nb_logpmf_np(counts, mu, alpha_hat[:, None])
        log_like = (np.sum(weights * ll_mat, axis=1) if use_weights
                    else np.sum(ll_mat, axis=1))
        w = 1.0 / (1.0 / mu + alpha_hat[:, None])
        if use_weights:
            w = weights * w
        xtwx = w.sum(axis=1)
        sigma = 1.0 / xtwx
        beta_se = (LOG2E * np.sqrt(sigma))[:, None]
        hat = w / xtwx[:, None]
        return dict(log_like=log_like, beta_conv=np.ones(G, bool),
                    beta_matrix=beta_matrix, beta_se=beta_se, mu=mu,
                    beta_iter=np.ones(G, int),
                    model_matrix=np.ones((dds.n_samples, 1)),
                    model_matrix_names=["Intercept"], nterms=1,
                    hat_diagonals=hat)

    # ---- beta initialization (fitNbinomGLMs.R:139-155) --------------------
    if np.linalg.matrix_rank(model_matrix) == p:
        q, r = np.linalg.qr(model_matrix)
        ylog = np.log(norm_counts + 0.1)
        beta_init = np.linalg.solve(r, (ylog @ q).T).T
    else:
        if "Intercept" in names:
            beta_init = np.zeros((dds.n_genes, p))
            with np.errstate(divide="ignore"):
                beta_init[:, names.index("Intercept")] = \
                    np.log(norm_counts.mean(axis=1))
        else:
            beta_init = np.ones((dds.n_genes, p))

    lambda_nat = lam / LN2 ** 2

    res = irls.fit_beta(
        jnp.asarray(dds.counts), jnp.asarray(model_matrix), jnp.asarray(nf),
        jnp.asarray(alpha_hat), jnp.asarray(beta_init),
        jnp.asarray(lambda_nat),
        weights=None if weights is None else jnp.asarray(weights),
        use_weights=use_weights, tol=beta_tol, maxit=maxit, min_mu=min_mu)
    beta_nat = np.asarray(res["beta"])
    beta_var = np.asarray(res["beta_var"])
    beta_iter = np.asarray(res["iter"])
    hat_diagonals = np.asarray(res["hat_diag"])

    # the returned mu is recomputed unclamped (fitNbinomGLMs.R:180)
    with np.errstate(over="ignore"):
        mu = nf * np.exp(beta_nat @ model_matrix.T)
    if disp_col is not None:
        ll_mat = nb_logpmf_np(counts, mu, np.asarray(disp_col)[:, None])
        log_like = (np.sum(weights * ll_mat, axis=1) if use_weights
                    else np.sum(ll_mat, axis=1))
    else:
        log_like = None

    row_stable = ~np.any(np.isnan(beta_nat), axis=1)
    row_var_positive = ~np.any(beta_var <= 0, axis=1)
    beta_conv = beta_iter < maxit
    beta_matrix = LOG2E * beta_nat
    beta_se = LOG2E * np.sqrt(np.maximum(beta_var, 0.0))

    if force_optim:
        rows_for_optim = np.arange(dds.n_genes)
    elif use_optim:
        rows_for_optim = np.where(~beta_conv | ~row_stable
                                  | ~row_var_positive)[0]
    else:
        rows_for_optim = np.where(~row_stable | ~row_var_positive)[0]

    if len(rows_for_optim) > 0:
        beta_matrix, beta_se, beta_conv, mu, log_like = _fit_glms_optim(
            dds.counts, model_matrix, lam, rows_for_optim, row_stable,
            nf, alpha_hat, weights, use_weights, beta_matrix, beta_se,
            beta_conv, beta_init, mu, log_like, min_mu=min_mu)

    if np.any(np.isnan(beta_se)):
        raise AssertionError("NA in beta standard errors")
    n_nonpos = np.sum(np.any(beta_se == 0, axis=1))
    if warn_nonpos_var and n_nonpos > 0:
        import warnings
        warnings.warn(f"{n_nonpos} rows had non-positive estimates of "
                      "variance for coefficients")

    return dict(log_like=log_like, beta_conv=beta_conv,
                beta_matrix=beta_matrix, beta_se=beta_se, mu=mu,
                beta_iter=beta_iter, model_matrix=model_matrix,
                model_matrix_names=names, nterms=p,
                hat_diagonals=hat_diagonals)


def _fit_glms_optim(counts, x, lam, rows, row_stable, nf, alpha_hat,
                    weights, use_weights, beta_matrix, beta_se, beta_conv,
                    beta_init_nat, mu, log_like, min_mu=0.5):
    """Per-row L-BFGS-B fallback on the log2-scale penalized likelihood
    (reference fitNbinomGLMsOptim, R/fitNbinomGLMs.R:340-407)."""
    lambda_nat = lam / LN2 ** 2
    large = 30.0
    sd_prior = np.sqrt(1.0 / lam)
    for row in rows:
        if row_stable[row] and np.all(np.abs(beta_matrix[row]) < large):
            beta_row = beta_matrix[row].copy()
        else:
            beta_row = beta_init_nat[row].copy()
        nfr = nf[row]
        k = counts[row].astype(np.float64)
        alpha = alpha_hat[row]
        wr = weights[row] if use_weights else None

        def objective(pvec):
            with np.errstate(over="ignore"):
                mu_row = nfr * 2.0 ** (x @ pvec)
            llv = nb_logpmf_np(k, mu_row, alpha)
            ll = np.sum(wr * llv) if wr is not None else np.sum(llv)
            log_prior = np.sum(-0.5 * np.log(2 * np.pi * sd_prior ** 2)
                               - 0.5 * (pvec / sd_prior) ** 2)
            neg = -(ll + log_prior)
            return neg if np.isfinite(neg) else 1e300

        o = scipy.optimize.minimize(objective, beta_row, method="L-BFGS-B",
                                    bounds=[(-large, large)] * x.shape[1])
        if o.success:
            beta_conv[row] = True
        beta_matrix[row] = o.x
        with np.errstate(over="ignore"):
            mu_row = nfr * 2.0 ** (x @ o.x)
        mu[row] = mu_row
        mu_row = np.maximum(mu_row, min_mu)
        w = 1.0 / (1.0 / mu_row + alpha)
        if wr is not None:
            w = wr * w
        xtwx = x.T @ (x * w[:, None])
        ridge = np.diag(lambda_nat) if len(lambda_nat) > 1 else \
            np.array([[lambda_nat[0]]])
        inv = np.linalg.inv(xtwx + ridge)
        sigma = inv @ xtwx @ inv
        beta_se[row] = LOG2E * np.sqrt(np.maximum(np.diag(sigma), 0.0))
        # note: the reference recomputes logLike here from the *clamped* mu
        # and alpha_hat (not the dispersion column), fitNbinomGLMs.R:398-403
        if log_like is not None:
            llv = nb_logpmf_np(k, mu_row, alpha)
            log_like[row] = (np.sum(wr * llv) if wr is not None
                             else np.sum(llv))
    return beta_matrix, beta_se, beta_conv, mu, log_like
