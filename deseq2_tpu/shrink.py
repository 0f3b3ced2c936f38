"""LFC shrinkage: normal prior refit, apeglm-style adaptive-t posterior
modes, ashr-style normal-mixture posterior means.

Reference: lfcShrink (R/lfcShrink.R:145-520).  type='normal' reuses the
reference's own machinery (estimateBetaPriorVar + nbinomWaldTest with
betaPrior).  type='apeglm' / type='ashr' call external packages in the
reference; here they are native TPU implementations of the same estimator
families:

- apeglm-style: heavy-tailed (Cauchy) prior on the coefficient of
  interest, scale adapted from the MLEs (Zhu, Ibrahim & Love 2018);
  posterior mode + SD by batched Newton iterations on device.
- ashr-style: adaptive shrinkage with a zero-centered normal mixture prior
  fitted by EM on (betahat, sebetahat) (Stephens 2016); posterior
  mean/SD/lfsr are analytic mixture updates.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import norm

import jax
import jax.numpy as jnp

from .ops.nb import nb_logpmf
from .results import DESeqResults, results
from .wald import estimate_beta_prior_var, nbinom_wald_test

LOG2E = np.log2(np.e)
LN2 = np.log(2.0)


def lfc_shrink(dds, coef=None, contrast=None, res=None, type="apeglm",
               lfc_threshold=0.0, svalue=False, return_fit=False,
               quiet=True, prior_df=1.0):
    """(reference lfcShrink, R/lfcShrink.R:145-520)"""
    if type not in ("apeglm", "ashr", "normal"):
        raise ValueError("unknown shrinkage type")
    if len(dds.results_names()) == 0:
        raise ValueError("first run deseq() before lfc_shrink()")
    if dds.attrs.get("betaPrior"):
        raise ValueError("lfc_shrink() should be used downstream of deseq() "
                         "with betaPrior=FALSE (the default)")
    res_names = dds.results_names()
    coef_num = None
    coef_alpha = None
    if coef is not None:
        if isinstance(coef, (int, np.integer)):
            # 1-based like the reference (R/lfcShrink.R:206-215) so that
            # reference scripts port unchanged; coef=0 is a loud error
            # rather than a silent off-by-one
            if coef < 1:
                raise ValueError(
                    "numeric coef is 1-based as in the reference "
                    "(lfcShrink(dds, coef=2) is the first non-intercept "
                    "coefficient); use a name from results_names() to be "
                    "explicit")
            coef_num = int(coef) - 1
            coef_alpha = res_names[coef_num]
        else:
            coef_alpha = coef
            coef_num = res_names.index(coef)
    if res is None:
        if coef is not None:
            res = results(dds, name=coef_alpha)
        elif contrast is not None:
            res = results(dds, contrast=contrast)
        else:
            raise ValueError("one of coef or contrast required if 'res' is "
                             "missing")
    if np.all(np.isnan(res.lfc_se)):
        raise ValueError("lfc_shrink requires standard errors")

    if type == "normal":
        return _shrink_normal(dds, coef, contrast, res, coef_alpha,
                              lfc_threshold, quiet)
    if type == "apeglm":
        if contrast is not None:
            raise ValueError("type='apeglm' shrinkage only for use with "
                             "'coef'")
        if coef is None:
            raise ValueError("type='apeglm' requires 'coef'")
        return _shrink_apeglm(dds, coef_num, coef_alpha, res, lfc_threshold,
                              svalue, return_fit, quiet, prior_df=prior_df)
    return _shrink_ashr(dds, res, lfc_threshold, svalue, return_fit, quiet)


# ---------------------------------------------------------------------------
# normal
# ---------------------------------------------------------------------------

def _shrink_normal(dds, coef, contrast, res, coef_alpha, lfc_threshold,
                   quiet):
    """(reference R/lfcShrink.R:221-327)

    On an accelerator backend the expanded-matrix (contrast-mode)
    refit routes through the fused engine's betaPrior pipeline
    (parallel/fused.py) — the same program DESeq(betaPrior=TRUE) runs,
    proven equal to the host two-pass fit by
    tests/test_fused_exact.py — so shrinkage at the headline shape
    costs one fused pass instead of a host-orchestrated MLE + refit.
    Falls back to the host path when counts were outlier-replaced (the
    reference's shrink-after-replacement uses original counts with
    post-replacement dispersions, which the one-shot pipeline cannot
    reproduce), for coef-mode (standard matrix), or on CPU."""
    if coef is None and contrast is None:
        raise ValueError("type='normal' requires either 'coef' or "
                         "'contrast'")
    if not isinstance(dds.design, np.ndarray):
        if any(o > 1 for o in dds.design.term_orders):
            raise ValueError("LFC shrinkage type='normal' not implemented "
                             "for designs with interactions")

    fused = _shrink_normal_fused(dds, contrast, res, lfc_threshold)
    if fused is not None:
        return fused

    dds = dds.copy()
    model_matrix_type = "standard" if contrast is None else "expanded"
    dds.attrs["modelMatrixType"] = model_matrix_type
    # rename the MLE coefficient columns (description "log2 fold change
    # (MLE)") to MLE_* for estimate_beta_prior_var, as the reference does
    # (R/lfcShrink.R:264-269)
    beta_cols = [n for n, (t, d) in dds.row_meta.items()
                 if "log2 fold change (MLE)" in d]
    if not beta_cols:
        raise ValueError("lfc_shrink type='normal' requires MLE "
                         "coefficients from deseq(beta_prior=False)")
    if not any(n.startswith("MLE_") for n in beta_cols):
        for n in beta_cols:
            dds.row_data[f"MLE_{n}"] = dds.row_data.pop(n)
            dds.row_meta[f"MLE_{n}"] = dds.row_meta.pop(n)
    nz = ~dds.row_data["allZero"]
    obj_nz = dds.subset_genes(nz)
    beta_prior_var, _ = estimate_beta_prior_var(obj_nz)
    dds_shr = nbinom_wald_test(dds, beta_prior=True,
                               beta_prior_var=beta_prior_var,
                               model_matrix_type=model_matrix_type,
                               quiet=True)
    if contrast is None:
        res_shr = results(dds_shr, name=coef_alpha,
                          lfc_threshold=lfc_threshold)
    else:
        res_shr = results(dds_shr, contrast=contrast,
                          lfc_threshold=lfc_threshold)
    out = DESeqResults(base_mean=res.base_mean,
                       log2_fold_change=res_shr.log2_fold_change,
                       lfc_se=res_shr.lfc_se,
                       stat=(res_shr.stat if lfc_threshold > 0 else res.stat),
                       pvalue=(res_shr.pvalue if lfc_threshold > 0
                               else res.pvalue),
                       padj=(res_shr.padj if lfc_threshold > 0 else res.padj),
                       row_names=res.row_names)
    out.metadata["lfcThreshold"] = lfc_threshold
    out.prior_info = dict(type="normal", package="deseq2_tpu",
                          betaPriorVar=beta_prior_var)
    return out


def _shrink_normal_fused(dds, contrast, res, lfc_threshold):
    """Device route for type='normal' contrast-mode shrinkage.

    Mirrors exactly what the host path computes when the prior variance
    is known and mu/H are stored (fit_glms_with_prior skips the MLE
    pass, R/fitNbinomGLMs.R:292-332): the beta prior variance from the
    STORED MLE coefficients (host quantile matching over (G,p) scalars),
    then ONE expanded-matrix ridge IRLS refit on the ORIGINAL counts at
    the STORED (post-replacement) dispersions with the contrast
    sandwich computed in-kernel — the same inputs the host feeds
    glm.fit_nbinom_glms, but with the counts staying device-resident
    (placement cache) and no (G,S) log-likelihood/mu materialization
    on the host.  ~0.5 s vs ~2 min host at 60k x 1024.

    Returns a DESeqResults or None (host fallback: CPU backend, coef
    mode, weights, numeric/list contrasts, lfc_threshold > 0)."""
    import jax
    import jax.numpy as jnp

    from .engine import _device_counts, resolve_engine
    from .expanded import make_expanded_model_matrix
    from .formula import Factor, make_names
    from .ops import irls as irls_ops
    from .wald import estimate_beta_prior_var

    if contrast is None or lfc_threshold != 0:
        return None
    eng = resolve_engine(None)
    if eng == "host" or (eng == "auto"
                         and jax.default_backend() == "cpu"):
        return None
    if "weights" in dds.assays or isinstance(dds.design, np.ndarray):
        return None
    if not (isinstance(contrast, (tuple, list)) and len(contrast) == 3
            and all(isinstance(c, str) for c in contrast)):
        return None
    factor_name, num_level, den_level = contrast
    fac = dds.col_data.get(factor_name)
    if not isinstance(fac, Factor) or num_level == den_level:
        return None

    # ---- prior variance from the stored MLEs (host, (G,p) scalars) ----
    dds2 = dds.copy(share_counts=True)
    dds2.attrs["modelMatrixType"] = "expanded"
    beta_cols = [n for n, (t, d) in dds2.row_meta.items()
                 if "log2 fold change (MLE)" in d]
    if not beta_cols:
        return None
    if not any(n.startswith("MLE_") for n in beta_cols):
        for n in beta_cols:
            dds2.row_data[f"MLE_{n}"] = dds2.row_data.pop(n)
            dds2.row_meta[f"MLE_{n}"] = dds2.row_meta.pop(n)
    nz = np.asarray(~dds2.row_data["allZero"])
    obj_nz = dds2.subset_genes(nz)
    prior_var, _ = estimate_beta_prior_var(obj_nz)
    x_e, names_e = make_expanded_model_matrix(dds2)
    if len(prior_var) != x_e.shape[1] or np.any(prior_var == 0):
        return None
    names_e = make_names(["Intercept" if n == "(Intercept)" else n
                          for n in names_e])
    num_col = make_names([f"{factor_name}{num_level}"])[0]
    den_col = make_names([f"{factor_name}{den_level}"])[0]
    if num_col not in names_e or den_col not in names_e:
        return None
    cvec = np.zeros(len(names_e))
    cvec[names_e.index(num_col)] = 1.0
    cvec[names_e.index(den_col)] = -1.0
    lam_nat = (1.0 / np.asarray(prior_var, np.float64)) / LN2 ** 2

    # ---- one expanded ridge refit on device ----
    nz_idx = np.where(nz)[0]
    y_dev = _device_counts(dds.counts)[jnp.asarray(nz_idx)]
    if dds.normalization_factors is not None:
        nf = np.asarray(dds.normalization_factors, np.float64)[nz]
    else:
        nf = np.asarray(dds.size_factors, np.float64)
    alpha = np.asarray(dds2.row_data["dispersion"])[nz]
    # expanded matrices are rank-deficient: glm.py's init rule is zeros
    # with the intercept at log(mean(normalized counts))
    mean_q = np.asarray(jax.device_get(jnp.mean(
        y_dev.astype(jnp.float32)
        / jnp.asarray(np.asarray(nf, np.float32)), axis=1)), np.float64)
    p_e = x_e.shape[1]
    beta_init = np.zeros((len(nz_idx), p_e))
    beta_init[:, names_e.index("Intercept")] = np.log(mean_q)
    out_fit = irls_ops.fit_beta(
        y_dev, jnp.asarray(np.asarray(x_e, np.float64)), jnp.asarray(nf),
        jnp.asarray(alpha), jnp.asarray(beta_init), jnp.asarray(lam_nat),
        contrast=jnp.asarray(cvec), tol=1e-8, maxit=100, min_mu=0.5)
    got = jax.device_get(dict(num=out_fit["contrast_num"],
                              den=out_fit["contrast_denom"]))
    lfc = np.full(dds.n_genes, np.nan)
    se = np.full(dds.n_genes, np.nan)
    lfc[nz] = LOG2E * np.asarray(got["num"], np.float64)
    se[nz] = LOG2E * np.asarray(got["den"], np.float64)

    # zero-zero rule (both involved groups all zero, R/results.R:1237-43)
    sel = np.where(np.isin(np.asarray(fac.codes),
                           [fac.levels.index(num_level),
                            fac.levels.index(den_level)]))[0]
    grp_sum = np.asarray(jax.device_get(jnp.sum(
        _device_counts(dds.counts)[:, jnp.asarray(sel)], axis=1)))
    zz = (grp_sum == 0) & nz
    lfc[zz] = 0.0
    # replaced-to-zero rows (R/results.R:567-575)
    replace = dds.row_data.get("replace")
    if replace is not None and np.nansum(replace) > 0:
        now_zero = np.asarray(replace, bool) & \
            (np.asarray(dds.row_data["baseMean"]) == 0)
        lfc[now_zero] = 0.0
        se[now_zero] = 0.0

    out = DESeqResults(base_mean=res.base_mean, log2_fold_change=lfc,
                       lfc_se=se, stat=res.stat, pvalue=res.pvalue,
                       padj=res.padj, row_names=res.row_names)
    out.descriptions["log2FoldChange"] = \
        f"log2 fold change (MAP): {factor_name} {num_level} vs {den_level}"
    out.metadata["lfcThreshold"] = lfc_threshold
    out.prior_info = dict(type="normal", package="deseq2_tpu",
                          betaPriorVar=prior_var)
    return out


# ---------------------------------------------------------------------------
# apeglm-style
# ---------------------------------------------------------------------------

def _apeglm_fit(y, x, nf_log, alpha, weights, coef_num, prior_scale,
                no_shrink_scale=15.0, beta_init=None, n_iter=50,
                prior_df=1.0):
    """Batched posterior mode for apeglm's adaptive Student-t prior on
    column `coef_num` and wide normal priors on the rest, via damped
    Newton on device.

    The prior family follows the published apeglm parametrization (Zhu,
    Ibrahim & Love 2018, Bioinformatics 35(12); apeglm defaults
    prior.df=1 — the Cauchy special case — prior.no.shrink.scale=15):
    log p(b) = -((df+1)/2) log(1 + b^2/(df S^2)) for the shrunk
    coefficient, N(0, no_shrink_scale) for the rest.  `prior_df`
    generalizes beyond the default exactly as apeglm's prior.control
    does.

    All betas on the natural-log scale.  Returns (map, sd) from the
    observed information at the mode (Laplace approximation), matching
    apeglm's 'nbinomCR' method family.
    """
    from .ops.padding import cascade_caps, cascade_while

    G, S = y.shape
    p = x.shape[1]
    dtype = jnp.float64
    y = y.astype(dtype) if hasattr(y, "astype") and not isinstance(
        y, np.ndarray) else jnp.asarray(np.asarray(y), dtype)
    x = jnp.asarray(x, dtype)
    nf_1d = np.ndim(nf_log) == 1
    nf_log = jnp.asarray(nf_log, dtype)
    alpha = jnp.asarray(alpha, dtype)
    use_w = weights is not None
    w_obs = None if weights is None else jnp.asarray(weights, dtype)
    is_coef = jnp.arange(p) == coef_num
    prior_scale = jnp.asarray(prior_scale, dtype)
    xx = (x[:, :, None] * x[:, None, :]).reshape(S, p * p)

    def make_fns(d):
        """Posterior pieces closed over the per-gene arrays in `d` —
        reusable on compacted straggler subsets (ops/padding)."""
        d_y = d["y"]
        d_alpha = d["alpha"]
        d_nfl = d.get("nf_log", nf_log)   # (S,) broadcasts to subsets
        d_w = d.get("w_obs")

        def grad_hess(beta):
            eta = beta @ x.T + d_nfl
            mu = jnp.exp(eta)
            size = 1.0 / d_alpha[:, None]
            # NB log-lik derivative wrt eta: y - mu*(y+size)/(mu+size)
            frac = (d_y + size) / (mu + size)
            dl_deta = d_y - mu * frac
            winfo = mu * frac * (size / (mu + size))
            if d_w is not None:
                dl_deta = d_w * dl_deta
                winfo = d_w * winfo
            grad_ll = jnp.einsum("gs,sp->gp", dl_deta, x)
            hess_ll = (winfo @ xx).reshape(beta.shape[0], p, p)
            # prior: Student-t(df, 0, prior_scale) on coef —
            # d/db log p = -(df+1) b / (df S^2 + b^2) — and
            # normal(0, no_shrink_scale) on the others
            b = beta
            ds2 = prior_df * prior_scale ** 2
            t_grad = -(prior_df + 1.0) * b / (ds2 + b ** 2)
            t_hess = ((prior_df + 1.0) * (b ** 2 - ds2)
                      / (ds2 + b ** 2) ** 2)
            norm_grad = -b / no_shrink_scale ** 2
            norm_hess = jnp.full_like(b, -1.0 / no_shrink_scale ** 2)
            pg = jnp.where(is_coef[None, :], t_grad, norm_grad)
            ph = jnp.where(is_coef[None, :], t_hess, norm_hess)
            return grad_ll + pg, hess_ll - _batch_diag(ph)

        def log_post(beta):
            eta = beta @ x.T + d_nfl
            mu = jnp.exp(eta)
            ll_mat = nb_logpmf(d_y, mu, d_alpha[:, None])
            if d_w is not None:
                ll_mat = d_w * ll_mat
            ll = jnp.sum(ll_mat, axis=-1)
            b = beta
            lp_c = -0.5 * (prior_df + 1.0) * jnp.log1p(
                b ** 2 / (prior_df * prior_scale ** 2))
            lp_n = -0.5 * b ** 2 / no_shrink_scale ** 2
            lp = jnp.where(is_coef[None, :], lp_c, lp_n).sum(axis=-1)
            return ll + lp

        return grad_hess, log_post

    def make_body(d):
        grad_hess, log_post = make_fns(d)

        def body(state):
            i, beta, step, active, lp0 = state
            g, h = grad_hess(beta)
            h = h + jnp.eye(p, dtype=dtype)[None] * 1e-8
            delta = _chol_solve_safe(h, g)

            # backtracking: halve until improvement (3 tries,
            # vectorized); lp0 carried from the previous accept
            def try_step(s):
                cand = beta + s[:, None] * delta
                return cand, log_post(cand)

            cand1, lp1 = try_step(step)
            ok1 = lp1 >= lp0
            cand2, lp2 = try_step(step * 0.5)
            ok2 = lp2 >= lp0
            cand3, lp3 = try_step(step * 0.25)
            ok3 = lp3 >= lp0
            new_beta = jnp.where(
                ok1[:, None], cand1,
                jnp.where(ok2[:, None], cand2,
                          jnp.where(ok3[:, None], cand3, beta)))
            new_lp = jnp.where(ok1, lp1,
                               jnp.where(ok2, lp2,
                                         jnp.where(ok3, lp3, lp0)))
            new_step = jnp.where(ok1, jnp.minimum(step * 1.5, 1.0),
                                 jnp.where(ok2 | ok3, step * 0.5,
                                           step * 0.25))
            new_beta = jnp.where(active[:, None], new_beta, beta)
            new_lp = jnp.where(active, new_lp, lp0)
            new_step = jnp.where(active, new_step, step)
            # converged once an ACCEPTED step stops moving the mode (a
            # full reject only shrinks the step and stays active)
            eps = jnp.finfo(dtype).eps
            dmax = jnp.max(jnp.abs(new_beta - beta), axis=-1)
            scale = 1.0 + jnp.max(jnp.abs(new_beta), axis=-1)
            accepted = ok1 | ok2 | ok3
            converged = accepted & ((dmax <= 8.0 * eps * scale)
                                    | (dmax <= 1e-8))
            active = active & ~converged
            return i + 1, new_beta, new_step, active, new_lp

        return body

    beta = jnp.zeros((G, p), dtype) if beta_init is None else \
        jnp.asarray(beta_init, dtype)
    data = dict(y=y, alpha=alpha)
    if not nf_1d:
        data["nf_log"] = nf_log
    if use_w:
        data["w_obs"] = w_obs
    _, log_post_full = make_fns(data)
    state = (jnp.zeros((), jnp.int32), beta, jnp.ones(G, dtype),
             jnp.ones(G, bool), log_post_full(beta))
    state = cascade_while(make_body, lambda s: s[3], data, state,
                          n_iter, cascade_caps(G))
    _, beta, _, _, _ = state
    grad_hess_full, _ = make_fns(data)
    _, hess = grad_hess_full(beta)
    cov = jnp.linalg.inv(hess + jnp.eye(p, dtype=dtype)[None] * 1e-10)
    sd = jnp.sqrt(jnp.clip(jnp.diagonal(cov, axis1=-2, axis2=-1), 0.0,
                           jnp.inf))
    return np.asarray(beta), np.asarray(sd)


def _batch_diag(v):
    p = v.shape[-1]
    return v[..., None] * jnp.eye(p, dtype=v.dtype)[None]


def _chol_solve_safe(h, g):
    from .ops.linalg import chol_solve
    return chol_solve(h, g[..., None])[..., 0]


def apeglm_svalue(lfsr):
    """Cumulative mean of sorted local FSR (reference apeglm_svalue,
    R/lfcShrink.R:523-528)."""
    lfsr = np.asarray(lfsr, dtype=np.float64)
    order = np.argsort(np.where(np.isnan(lfsr), np.inf, lfsr), kind="stable")
    sorted_l = lfsr[order]
    cum = np.nancumsum(sorted_l) / np.arange(1, len(lfsr) + 1)
    out = np.empty_like(cum)
    out[order] = cum
    out[np.isnan(lfsr)] = np.nan
    return out


def _shrink_apeglm(dds, coef_num, coef_alpha, res, lfc_threshold, svalue,
                   return_fit, quiet, prior_df=1.0):
    nz = ~dds.row_data["allZero"]
    obj = dds
    if jax.default_backend() != "cpu":
        from .engine import _device_counts
        y = _device_counts(obj.counts)   # placement-cached upload
    else:
        y = obj.counts
    if isinstance(dds.design, np.ndarray):
        x = dds.design
    elif dds.attrs.get("modelMatrixType") == "user-supplied":
        x = dds.attrs["modelMatrix"]
    else:
        x, _ = dds.renamed_model_matrix()
    disps = np.asarray(obj.row_data["dispersion"]).copy()
    disps = np.where(np.isnan(disps), 1.0, disps)
    # shared per-sample factors ride as an (S,) row (broadcasts in the
    # fit, incl. on compacted straggler subsets); (G,S) only for
    # gene x sample normalization factors
    nf = (obj.normalization_factors if obj.normalization_factors
          is not None else np.asarray(obj.size_factors))
    weights = obj.assays.get("weights")
    # Adaptive Cauchy prior scale from the MLEs (natural-log scale),
    # following the moment-matching idea of Zhu, Ibrahim & Love (2018):
    # E[betahat^2] = E[beta^2] + E[se^2], so the positive excess
    # betahat^2 - se^2 estimates the per-gene signal variance; the prior
    # scale is the RMS of the positive excesses, capped at 1 (natural
    # log) as in apeglm's default adaptive prior.
    # NOTE: this is the same prior FAMILY as apeglm (Cauchy, prior.df=1,
    # no.shrink normals at scale 15) but not a line-for-line port of
    # apeglm's priorVar() estimator, which could not be consulted or
    # validated in this build environment (no R / apeglm available);
    # posterior modes agree with apeglm qualitatively (see
    # tests/test_shrink.py behavioral checks), not numerically.
    mle = LN2 * np.column_stack([res.log2_fold_change, res.lfc_se])
    fin = np.isfinite(mle[:, 0]) & np.isfinite(mle[:, 1])
    var_est = mle[fin, 0] ** 2 - mle[fin, 1] ** 2
    pos = var_est > 0
    if pos.sum() == 0:
        prior_scale = 1.0
    else:
        prior_scale = float(np.sqrt(np.mean(var_est[pos])))
    prior_scale = min(prior_scale, 1.0)

    beta_init = None
    # initialize at the MLE fit (natural log scale) when available
    coef_cols = dds.results_names()
    if all(c in dds.row_data for c in coef_cols):
        beta_init = LN2 * np.column_stack(
            [np.nan_to_num(dds.row_data[c], nan=0.0) for c in coef_cols])

    bmap, bsd = _apeglm_fit(y, x, np.log(nf), disps, weights, coef_num,
                            prior_scale, beta_init=beta_init,
                            prior_df=prior_df)
    lfc = LOG2E * bmap[:, coef_num]
    se = LOG2E * bsd[:, coef_num]
    lfc[~nz] = np.nan
    se[~nz] = np.nan

    out = DESeqResults(base_mean=res.base_mean,
                       log2_fold_change=lfc, lfc_se=se,
                       stat=res.stat, pvalue=res.pvalue, padj=res.padj,
                       row_names=res.row_names)
    out.descriptions["log2FoldChange"] = \
        f"log2 fold change (MAP): {coef_alpha.replace('_', ' ')}"
    out.descriptions["lfcSE"] = \
        f"posterior SD: {coef_alpha.replace('_', ' ')}"
    # local false-sign rate via the Laplace approximation
    if lfc_threshold > 0:
        T = lfc_threshold
        fsos = (norm.cdf((T - lfc) / se) - norm.cdf((-T - lfc) / se))
        lfsr = np.clip(fsos, 0.0, 1.0)
        out.svalue = apeglm_svalue(lfsr)
        out.stat = out.pvalue = out.padj = None
        svalue = True
    elif svalue:
        lfsr = norm.cdf(-np.abs(lfc) / se)
        out.svalue = apeglm_svalue(lfsr)
        out.stat = out.pvalue = out.padj = None
    out.metadata["lfcThreshold"] = lfc_threshold
    out.prior_info = dict(type="apeglm", package="deseq2_tpu",
                          prior_scale=prior_scale,
                          prior_control=dict(prior_scale=prior_scale,
                                             prior_df=prior_df,
                                             prior_no_shrink_scale=15))
    if return_fit:
        return out, dict(map=bmap, sd=bsd, prior_scale=prior_scale)
    return out


# ---------------------------------------------------------------------------
# ashr-style
# ---------------------------------------------------------------------------

def _ash_normal_mix(betahat, sebetahat, npoint=None, max_iter=2000,
                    tol=1e-7):
    """Fit pi over a zero-centered normal mixture by EM
    (ashr method='shrink', mixcompdist='normal'; Stephens 2016)."""
    ok = np.isfinite(betahat) & np.isfinite(sebetahat) & (sebetahat > 0)
    b, s = betahat[ok], sebetahat[ok]
    # autoselect.mixsd grid
    smin = np.min(s) / 10.0
    excess = b ** 2 - s ** 2
    if np.any(excess > 0):
        smax = 2.0 * np.sqrt(np.max(excess[excess > 0]))
    else:
        smax = 8.0 * smin
    grid = [0.0]
    v = smin
    while v < smax:
        grid.append(v)
        v *= np.sqrt(2.0)
    grid.append(v)
    sigmas = np.asarray(grid)
    K = len(sigmas)
    # marginal likelihood of each observation under each component
    tot_var = sigmas[None, :] ** 2 + s[:, None] ** 2
    loglik = (-0.5 * np.log(2 * np.pi * tot_var)
              - 0.5 * b[:, None] ** 2 / tot_var)
    lmax = loglik.max(axis=1, keepdims=True)
    lik = np.exp(loglik - lmax)

    # EM as one jitted while_loop: the host loop dispatches 2000 tiny
    # (n,K) passes (~15 s at 60k genes); on device the whole fit is a
    # single program
    @jax.jit
    def em(lik):
        K = lik.shape[1]
        pi0 = jnp.full(K, 1.0 / K, lik.dtype)

        def body(state):
            i, pi, _ = state
            w = lik * pi[None, :]
            w = w / jnp.sum(w, axis=1, keepdims=True)
            pi_new = jnp.mean(w, axis=0)
            done = jnp.max(jnp.abs(pi_new - pi)) < tol
            return i + 1, pi_new, done

        state = (jnp.zeros((), jnp.int32), pi0,
                 jnp.zeros((), bool))
        state = jax.lax.while_loop(
            lambda st: (st[0] < max_iter) & ~st[2], body, state)
        return state[1]

    pi = np.asarray(jax.device_get(em(jnp.asarray(lik))), np.float64)
    return sigmas, pi, ok


def _ash_posterior(betahat, sebetahat, sigmas, pi):
    """Posterior mean/SD and lfsr under the fitted mixture."""
    b, s = betahat, sebetahat
    tot_var = sigmas[None, :] ** 2 + s[:, None] ** 2
    loglik = (-0.5 * np.log(2 * np.pi * tot_var)
              - 0.5 * b[:, None] ** 2 / tot_var)
    lmax = loglik.max(axis=1, keepdims=True)
    resp = np.exp(loglik - lmax) * pi[None, :]
    resp /= resp.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        post_var_k = 1.0 / (1.0 / np.maximum(sigmas[None, :] ** 2, 1e-300)
                            + 1.0 / s[:, None] ** 2)
        post_mean_k = post_var_k * b[:, None] / s[:, None] ** 2
    # sigma=0 component: point mass at 0
    zero_comp = sigmas == 0
    post_var_k[:, zero_comp] = 0.0
    post_mean_k[:, zero_comp] = 0.0
    mean = np.sum(resp * post_mean_k, axis=1)
    second = np.sum(resp * (post_var_k + post_mean_k ** 2), axis=1)
    sd = np.sqrt(np.maximum(second - mean ** 2, 0.0))
    # probability of positive / negative sign
    with np.errstate(divide="ignore", invalid="ignore"):
        z = post_mean_k / np.sqrt(post_var_k)
    p_pos = np.where(post_var_k > 0, norm.sf(-z), 0.0)
    p_neg = np.where(post_var_k > 0, norm.cdf(-z), 0.0)
    prob_pos = np.sum(resp * p_pos, axis=1)
    prob_neg = np.sum(resp * p_neg, axis=1)
    lfsr = np.minimum(1.0, np.minimum(1 - prob_pos, 1 - prob_neg)
                      + np.sum(resp[:, zero_comp], axis=1) * 0.0)
    lfsr = np.minimum(prob_pos, prob_neg) + resp[:, zero_comp].sum(axis=1)
    lfsr = np.minimum(lfsr, 1.0)
    return mean, sd, lfsr


def cdf_post_mixture(betahat, sebetahat, sigmas, pi, x):
    """P(beta <= x | data) under the fitted mixture (ashr cdf_post)."""
    b, s = betahat, sebetahat
    tot_var = sigmas[None, :] ** 2 + s[:, None] ** 2
    loglik = (-0.5 * np.log(2 * np.pi * tot_var)
              - 0.5 * b[:, None] ** 2 / tot_var)
    lmax = loglik.max(axis=1, keepdims=True)
    resp = np.exp(loglik - lmax) * pi[None, :]
    resp /= resp.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        post_var_k = 1.0 / (1.0 / np.maximum(sigmas[None, :] ** 2, 1e-300)
                            + 1.0 / s[:, None] ** 2)
        post_mean_k = post_var_k * b[:, None] / s[:, None] ** 2
    zero_comp = sigmas == 0
    cdf_k = np.where(post_var_k > 0,
                     norm.cdf((x - post_mean_k)
                              / np.sqrt(np.maximum(post_var_k, 1e-300))),
                     (x >= 0).astype(float) if np.isscalar(x)
                     else (x >= 0).astype(float))
    cdf_k[:, zero_comp] = (x >= 0) * 1.0
    return np.sum(resp * cdf_k, axis=1)


def _shrink_ashr(dds, res, lfc_threshold, svalue, return_fit, quiet):
    betahat = res.log2_fold_change
    sebetahat = res.lfc_se
    sigmas, pi, ok = _ash_normal_mix(betahat, sebetahat)
    mean = np.full_like(betahat, np.nan)
    sd = np.full_like(betahat, np.nan)
    lfsr = np.full_like(betahat, np.nan)
    mean[ok], sd[ok], lfsr[ok] = _ash_posterior(betahat[ok], sebetahat[ok],
                                                sigmas, pi)
    out = DESeqResults(base_mean=res.base_mean, log2_fold_change=mean,
                       lfc_se=sd, stat=res.stat, pvalue=res.pvalue,
                       padj=res.padj, row_names=res.row_names)
    out.descriptions["log2FoldChange"] = "log2 fold change (MMSE)"
    out.descriptions["lfcSE"] = "posterior SD"
    if lfc_threshold > 0:
        cdf_pos = np.full_like(betahat, np.nan)
        cdf_neg = np.full_like(betahat, np.nan)
        cdf_pos[ok] = cdf_post_mixture(betahat[ok], sebetahat[ok], sigmas,
                                       pi, lfc_threshold)
        cdf_neg[ok] = cdf_post_mixture(betahat[ok], sebetahat[ok], sigmas,
                                       pi, -lfc_threshold)
        lfsr_t = np.where(mean > 0, cdf_pos, 1.0 - cdf_neg)
        out.svalue = apeglm_svalue(lfsr_t)
        out.stat = out.pvalue = out.padj = None
    elif svalue:
        out.svalue = apeglm_svalue(lfsr)
        out.stat = out.pvalue = out.padj = None
    out.metadata["lfcThreshold"] = lfc_threshold
    out.prior_info = dict(type="ashr", package="deseq2_tpu",
                          fitted_g=dict(sd=sigmas, pi=pi))
    if return_fit:
        return out, dict(sigmas=sigmas, pi=pi, lfsr=lfsr)
    return out
