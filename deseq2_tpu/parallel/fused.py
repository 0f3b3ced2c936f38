"""Fused on-device DESeq Wald pipeline: one jitted program over the mesh.

This is the production hot path for the default bulk configuration
(group-like design, no weights, parametric trend): gene-wise dispersion
MLE -> parametric trend -> MAP shrinkage -> ridge IRLS -> Wald statistics,
entirely on device, genes axis sharded across the mesh.  The cross-gene
reductions (trend fit sums, MAD, prior variance) are sharded jnp
reductions -> XLA all-reduces over ICI; everything else is embarrassingly
gene-parallel (SURVEY.md sections 2.7, 7).

The host-orchestrated deseq() remains the reference-exact path (it adds
the optim/grid fallback ladders, Cook's filtering heuristics, and the
statistical long tail); this fused program implements the same default
math (same kernels, same clamps, same convergence rules) for speed-of-
light throughput and for multi-chip dry runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc, polygamma

from ..ops.disp import (fit_disp_grid, fit_disp_line_search,
                        _fit_disp_grid_core, _fit_disp_line_search_core)
from ..ops.pallas_disp import fit_disp_grid_pallas, pallas_grid_supported
from ..ops.irls import _fit_beta_core
from ..ops.linalg import chol_solve
from ..ops.padding import compact_live_indices, straggler_capacity

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _use_pallas_grid(S, p, dtype):
    """Route the grid fallback through the Pallas kernel on TPU (f32).

    env DESEQ2_TPU_PALLAS: auto (default; TPU + supported shape),
    0/false (always XLA), 1 (same as auto).  The XLA path stays the
    f64 reference-parity implementation.
    """
    import os
    flag = os.environ.get("DESEQ2_TPU_PALLAS", "auto").lower()
    if flag in ("0", "false", "off"):
        return False
    if not pallas_grid_supported(S, p, dtype):
        return False
    return jax.default_backend() not in ("cpu",)


def _ls_fitted(y, x):
    """Least-squares fitted values via SPD solve: y X (X'X)^-1 X'.

    Equivalent to the reference's QR 'Huber rewrite' (R/core.R:2454-2463);
    Cholesky of the p x p normal equations is the TPU-friendly form."""
    xtx = x.T @ x
    coef = chol_solve(xtx, (y @ x).T).T  # (G,p)
    return coef @ x.T


def _gamma_trend_fit(means, disps, use_mask):
    """Parametric dispersion trend on device (reference
    parametricDispersionFit, R/core.R:2166-2189): gamma GLM with identity
    link disp ~ 1/mean, iterative outlier masking.  All sums over the
    sharded genes axis become all-reduces."""
    ones = jnp.ones_like(means)
    inv_means = jnp.where(use_mask, 1.0 / means, 0.0)
    X0 = ones
    X1 = inv_means

    def inner_glm(coefs, good):
        """Gamma-identity IRLS, fixed 25 iterations with masked weights."""
        def body(i, state):
            a, b = state
            mu = a + b * X1
            mu = jnp.maximum(mu, 1e-30)
            w = jnp.where(good, 1.0 / mu ** 2, 0.0)
            s00 = jnp.sum(w * X0 * X0)
            s01 = jnp.sum(w * X0 * X1)
            s11 = jnp.sum(w * X1 * X1)
            r0 = jnp.sum(w * X0 * disps)
            r1 = jnp.sum(w * X1 * disps)
            det = s00 * s11 - s01 * s01
            a_new = (s11 * r0 - s01 * r1) / det
            b_new = (s00 * r1 - s01 * r0) / det
            return a_new, b_new

        return jax.lax.fori_loop(0, 25, body, (coefs[0], coefs[1]))

    def outer_body(state):
        coefs, _, it, _ = state
        mu = coefs[0] + coefs[1] * X1
        resid = jnp.where(use_mask, disps / jnp.maximum(mu, 1e-30), 0.0)
        good = use_mask & (resid > 1e-4) & (resid < 15.0)
        a_new, b_new = inner_glm(coefs, good)
        new = jnp.stack([a_new, b_new])
        delta = jnp.sum(jnp.log(jnp.abs(new) / jnp.abs(coefs)) ** 2)
        done = (delta < 1e-6) | (it >= 10)
        ok = (a_new > 0) & (b_new > 0)
        return new, coefs, it + 1, done | ~ok

    def outer_cond(state):
        return ~state[3]

    init = (jnp.array([0.1, 1.0], dtype=means.dtype),
            jnp.array([0.1, 1.0], dtype=means.dtype),
            jnp.array(0, jnp.int32), jnp.array(False))
    coefs, _, _, _ = jax.lax.while_loop(outer_cond, outer_body, init)
    return coefs  # (asymptDisp, extraPois)


def _masked_median(v, mask):
    big = jnp.where(mask, v, jnp.nan)
    return jnp.nanmedian(big)


def _bh_adjust(p, valid):
    """BH over valid entries (sharded sort -> all-gather, G scalars)."""
    n = jnp.sum(valid)
    pv = jnp.where(valid, p, jnp.inf)
    order = jnp.argsort(pv)
    ranked = pv[order]
    G = p.shape[0]
    i = jnp.arange(1, G + 1, dtype=p.dtype)
    scaled = jnp.where(jnp.isfinite(ranked), ranked * n / i, jnp.inf)
    rev_cummin = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.where(jnp.isfinite(scaled), scaled, jnp.inf))))
    adj = jnp.minimum(rev_cummin, 1.0)
    out = jnp.zeros(G, dtype=p.dtype).at[order].set(adj)
    return jnp.where(valid, out, jnp.nan)


@partial(jax.jit, static_argnames=("maxit", "min_disp_pow", "mesh"))
def fused_wald_pipeline(counts, x, size_factors, grid, maxit=100,
                        min_disp_pow=-8, mesh=None):
    """counts: (G,S) int; x: (S,p); size_factors: (S,); grid: (20,) log
    alpha grid.  Returns per-gene results dict (log2 scale LFC/SE/stat/p,
    plus dispersions and diagnostics).

    With `mesh` (a 1-D 'genes' device mesh), the three per-gene hot
    solvers (dispersion MLE/MAP line searches, IRLS) and the grid
    fallback run under shard_map: each shard iterates only until ITS
    genes converge and compacts its own stragglers locally — no
    collectives inside the solver loops (GSPMD cannot partition the
    gather/scatter compaction pattern, and lockstep trip counts would
    be the max over all shards anyway).  The cross-gene reductions
    (trend fit, MAD, prior variance, BH) stay in the auto-sharded outer
    program where XLA inserts the all-reduces."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    p = x.shape[1]
    min_disp = 10.0 ** min_disp_pow
    max_disp = jnp.maximum(10.0, S).astype(dtype)
    min_mu = 0.5

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec
        gP = PartitionSpec("genes")
        rP = PartitionSpec()

        def smap(f, in_specs, out_specs=None):
            # check_vma=False: loop carries seeded from replicated scalars
            # (jnp.full) trip the varying-axes check against the per-shard
            # body outputs; the solvers are per-gene so VMA adds nothing.
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=gP if out_specs is None
                                 else out_specs, check_vma=False)
    else:
        def smap(f, in_specs, out_specs=None):
            return f
        gP = rP = None

    y = counts.astype(dtype)
    sf = size_factors.astype(dtype)
    x = x.astype(dtype)
    nf = jnp.broadcast_to(sf[None, :], (G, S))
    norm_counts = y / sf[None, :]

    base_mean = norm_counts.mean(axis=1)
    base_var = norm_counts.var(axis=1, ddof=1)
    all_zero = jnp.sum(y, axis=1) == 0

    # ---- gene-wise dispersion init (R/core.R:709-728) --------------------
    mu_ls = jnp.maximum(_ls_fitted(norm_counts, x), 1.0)
    rough = jnp.maximum(jnp.sum(((norm_counts - mu_ls) ** 2 - mu_ls)
                                / mu_ls ** 2, axis=1) / (S - p), 0.0)
    xim = jnp.mean(1.0 / sf)
    moments = (base_var - xim * base_mean) / base_mean ** 2
    alpha_init = jnp.minimum(rough, jnp.where(all_zero, rough, moments))
    alpha_init = jnp.clip(jnp.where(jnp.isnan(alpha_init), min_disp,
                                    alpha_init), min_disp, max_disp)

    # mu for dispersion fitting: LS projection * nf (linearMu fast path,
    # exact for group-like designs; R/core.R:754-764)
    mu_disp = jnp.maximum(_ls_fitted(norm_counts, x) * sf[None, :], min_mu)
    y_safe = jnp.where(all_zero[:, None], 1.0, y)
    mu_safe = jnp.where(all_zero[:, None], 1.0, mu_disp)

    # ---- gene-wise MLE line search (R/core.R:770-848) ---------------------
    import math
    min_la = math.log(min_disp / 10.0)
    la0 = jnp.log(alpha_init)

    def _mle_fn(y_, mu_, la_, x_):
        return _fit_disp_line_search_core(y_, x_, mu_, la_, la_, 1.0,
                                          min_la, maxit=maxit,
                                          use_prior=False)

    mle = smap(_mle_fn, (gP, gP, gP, rP))(y_safe, mu_safe, la0, x)
    alpha_mle = jnp.minimum(jnp.exp(mle["log_alpha"]), max_disp)
    no_increase = mle["last_lp"] < mle["initial_lp"] + \
        jnp.abs(mle["initial_lp"]) / 1e6
    disp_gene_est = jnp.where(no_increase, alpha_init, alpha_mle)
    conv = (mle["iter"] < maxit) & (mle["iter"] != 1)
    refit = ~conv & (disp_gene_est > min_disp * 10)

    def _grid_fb(use_prior):
        def fb(disp_cur, need, prior_mean_arr, prior_var, y_, mu_, x_, grid_):
            """Grid-search fallback only on the `need` genes: gather them
            into a small static buffer when few (the common case), full
            batch otherwise.  Exact — the grid is per-gene independent.
            Shapes are per-shard under shard_map, so the capacity and the
            compaction are local to each device."""
            g_local = y_.shape[0]
            capg = straggler_capacity(g_local, frac=16, floor=1024)

            def grid_solve(yy, mm, pm):
                if _use_pallas_grid(yy.shape[1], x_.shape[1], dtype):
                    return fit_disp_grid_pallas(
                        yy, x_, mm, grid_.astype(dtype), pm, prior_var,
                        use_prior=use_prior)
                return _fit_disp_grid_core(yy, x_, mm, grid_.astype(dtype),
                                           pm, prior_var,
                                           use_prior=use_prior)

            def full_fn(_):
                la = grid_solve(y_, mu_, prior_mean_arr)
                return jnp.where(need, jnp.exp(la), disp_cur)

            if capg == 0:
                return jax.lax.cond(jnp.any(need), full_fn,
                                    lambda _: disp_cur, operand=None)

            def compact_fn(_):
                idx = compact_live_indices(need, capg)
                la = grid_solve(y_[idx], mu_[idx], prior_mean_arr[idx])
                new = jnp.where(need[idx], jnp.exp(la), disp_cur[idx])
                return disp_cur.at[idx].set(new)

            n = jnp.sum(need)
            return jax.lax.cond(
                n == 0, lambda _: disp_cur,
                lambda _: jax.lax.cond(n > capg, full_fn, compact_fn,
                                       operand=None), operand=None)
        return fb

    grid_specs = (gP, gP, gP, rP, gP, gP, rP, rP)

    def grid_fallback(disp_cur, need, prior_mean_arr, prior_var, use_prior):
        pv = jnp.asarray(prior_var, dtype)
        return smap(_grid_fb(use_prior), grid_specs)(
            disp_cur, need, prior_mean_arr, pv, y_safe, mu_safe, x, grid)

    disp_gene_est = grid_fallback(disp_gene_est, refit,
                                  jnp.zeros(G, dtype), 1.0, False)
    disp_gene_est = jnp.clip(disp_gene_est, min_disp, max_disp)

    # ---- parametric trend (cross-gene reduction) --------------------------
    use_for_fit = (disp_gene_est > 100 * min_disp) & ~all_zero
    coefs = _gamma_trend_fit(base_mean, disp_gene_est, use_for_fit)
    disp_fit = coefs[0] + coefs[1] / jnp.where(all_zero, 1.0, base_mean)

    # varLogDispEsts: MAD^2 over non-zero genes (R/methods.R:172-184)
    resid = jnp.log(disp_gene_est) - jnp.log(disp_fit)
    med = _masked_median(resid, ~all_zero)
    var_log_disp = (1.4826 * _masked_median(jnp.abs(resid - med),
                                            ~all_zero)) ** 2
    exp_var = polygamma(1, (S - p) / 2.0).astype(dtype)
    disp_prior_var = jnp.maximum(var_log_disp - exp_var, 0.25)

    # ---- MAP shrinkage (R/core.R:1016-1115) --------------------------------
    disp_init = jnp.where(disp_gene_est > 0.1 * disp_fit, disp_gene_est,
                          disp_fit)

    def _map_fn(y_, mu_, la_, pm_, pv_, x_):
        return _fit_disp_line_search_core(y_, x_, mu_, la_, pm_, pv_,
                                          min_la, maxit=maxit,
                                          use_prior=True)

    map_res = smap(_map_fn, (gP, gP, gP, gP, rP, rP))(
        y_safe, mu_safe, jnp.log(disp_init), jnp.log(disp_fit),
        disp_prior_var, x)
    disp_map = jnp.exp(map_res["log_alpha"])
    refit_map = map_res["iter"] >= maxit
    disp_map = grid_fallback(disp_map, refit_map, jnp.log(disp_fit),
                             disp_prior_var, True)
    disp_map = jnp.clip(disp_map, min_disp, max_disp)
    disp_outlier = jnp.log(disp_gene_est) > jnp.log(disp_fit) + \
        2.0 * jnp.sqrt(var_log_disp)
    dispersion = jnp.where(disp_outlier, disp_gene_est, disp_map)

    # ---- NB GLM + Wald (R/core.R:1400-1508) --------------------------------
    beta_init = chol_solve(x.T @ x, (jnp.log(norm_counts + 0.1) @ x).T).T
    lam_nat = jnp.full(p, 1e-6 / LN2 ** 2, dtype=dtype)

    def _irls_fn(y_, nf_, al_, b0_, x_, lam_):
        return _fit_beta_core(y_, x_, nf_, al_, b0_, lam_,
                              maxit=maxit, min_mu=min_mu)

    fit = smap(_irls_fn, (gP, gP, gP, gP, rP, rP))(
        y_safe, nf, dispersion, beta_init, x, lam_nat)
    beta_log2 = LOG2E * fit["beta"]
    se_log2 = LOG2E * jnp.sqrt(jnp.maximum(fit["beta_var"], 0.0))
    wald_stat = beta_log2 / se_log2
    wald_p = erfc(jnp.abs(wald_stat) / jnp.sqrt(2.0).astype(dtype))

    # BH on the last coefficient's p-values (default results contrast)
    padj_last = _bh_adjust(wald_p[:, -1], ~all_zero)

    nanmask = lambda v: jnp.where(all_zero, jnp.nan, v)
    return dict(
        baseMean=base_mean, baseVar=base_var, allZero=all_zero,
        dispGeneEst=nanmask(disp_gene_est), dispFit=nanmask(disp_fit),
        dispersion=nanmask(dispersion), dispMAP=nanmask(disp_map),
        dispOutlier=disp_outlier & ~all_zero,
        trendCoefs=coefs, dispPriorVar=disp_prior_var,
        varLogDispEsts=var_log_disp,
        beta=jnp.where(all_zero[:, None], jnp.nan, beta_log2),
        betaSE=jnp.where(all_zero[:, None], jnp.nan, se_log2),
        stat=jnp.where(all_zero[:, None], jnp.nan, wald_stat),
        pvalue=jnp.where(all_zero[:, None], jnp.nan, wald_p),
        betaIter=fit["iter"], betaConv=fit["iter"] < maxit,
        mu=fit["mu"], hatDiag=fit["hat_diag"],
        deviance=nanmask(fit["deviance"]), padjLast=padj_last)


def run_fused_sharded(counts, x, size_factors, mesh, maxit=100,
                      min_disp=1e-8):
    """Run the fused pipeline with the genes axis sharded over `mesh`."""
    import numpy as np
    from .sharding import pad_to_multiple, replicated, shard_genes

    n_dev = mesh.devices.size
    counts_p, G = pad_to_multiple(np.asarray(counts), n_dev, 0)
    gshard = shard_genes(mesh)
    rep = replicated(mesh)
    counts_d = jax.device_put(counts_p, gshard)
    x_d = jax.device_put(np.asarray(x, dtype=np.float64), rep)
    sf_d = jax.device_put(np.asarray(size_factors, dtype=np.float64), rep)
    grid = np.linspace(np.log(min_disp),
                       np.log(max(10.0, counts.shape[1])), 20)
    grid_d = jax.device_put(grid, rep)
    out = fused_wald_pipeline(counts_d, x_d, sf_d, grid_d, maxit=maxit,
                              mesh=mesh if n_dev > 1 else None)
    return {k: np.asarray(v)[:G] if np.ndim(v) and np.shape(v)[0] ==
            counts_p.shape[0] else np.asarray(v) for k, v in out.items()}
