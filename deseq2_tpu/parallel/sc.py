"""Single-cell scale fused pipeline: sample-axis streaming (BASELINE #5).

At 30k genes x 50k cells a resident (G,S) f32 intermediate is ~6 GB, so
the bulk pipeline's materialize-mu design cannot keep several live
buffers in HBM.  This variant exploits the group-like design structure
(the only design class DESeq2's single-cell path targets): the fitted
mean factorizes as mu[g,s] = q[g, cell(s)] * sf[s], so persistent state
is (G,C) group means plus (G,p) betas, and every per-sample quantity is
recomputed on the fly inside `lax.scan` passes over sample chunks —
counts are the only (G,S) array, read from HBM once per solver sweep.

Math is identical to the bulk fused pipeline (same clamps/convergence
rules; reference: src/DESeq2.cpp:163-465, R/core.R:657-1508) with the
single-cell defaults minmu=1e-6 and no outlier replacement — the
reference disables replacement for its single-cell path
(R/core.R:297-303).  The genes axis remains embarrassingly parallel
(shard the counts rows and run one pipeline per shard; the cross-gene
reductions are the same trend/MAD/BH as the bulk path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, erfc, gammaln, polygamma

from .fused import LN2, LOG2E, _bh_adjust, _gamma_trend_fit, _masked_median

DEFAULT_CHUNK = 2048

__all__ = ["fused_sc_pipeline", "DEFAULT_CHUNK"]


@partial(jax.jit, static_argnames=("n_groups", "maxit", "min_disp_pow",
                                   "min_mu", "chunk"))
def fused_sc_pipeline(counts, cells, size_factors, grid, n_groups,
                      maxit=100, min_disp_pow=-8, min_mu=1e-6,
                      chunk=DEFAULT_CHUNK):
    """counts: (G,S) int; cells: (S,) int32 group codes (0..C-1);
    size_factors: (S,); grid: (20,) log-alpha grid; n_groups: static C.

    The design matrix is the intercept + treatment-coded indicators of
    `cells` (standard model matrix of one factor), so p = C.  Returns
    the per-gene results dict (log2 LFC/SE/stat/p of the last level vs
    the first, dispersions, diagnostics)."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    G, S = counts.shape
    C = p = n_groups
    min_disp = 10.0 ** min_disp_pow
    max_disp = jnp.maximum(10.0, S).astype(dtype)

    sf = size_factors.astype(dtype)
    cells = cells.astype(jnp.int32)

    n_chunks = -(-S // chunk)
    pad = n_chunks * chunk - S
    counts_p = jnp.pad(counts, ((0, 0), (0, pad))) if pad else counts
    sf_p = jnp.pad(sf, (0, pad), constant_values=1.0)
    cells_p = jnp.pad(cells, (0, pad))
    valid_p = jnp.pad(jnp.ones(S, dtype), (0, pad))
    Sp = S + pad
    # intercept + treatment indicators of the group factor: (Sp, p)
    x_p = jnp.concatenate(
        [jnp.ones((Sp, 1), dtype),
         (cells_p[:, None] == jnp.arange(1, C, dtype=jnp.int32)[None, :]
          ).astype(dtype)], axis=1)
    # The counts stay in their natural (G, Sp) layout — no transposed
    # stacked copy (at 30k x 50k that copy alone is another ~6 GB of
    # HBM).  Scans iterate over the chunk index and dynamic-slice the
    # sample window out of the resident matrix; the small per-sample
    # vectors are stacked per chunk as before.
    idxs = jnp.arange(n_chunks, dtype=jnp.int32)

    def chunk_of(cnt, i):
        zero = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_slice(
            cnt, (zero, (i * chunk).astype(jnp.int32)),
            (cnt.shape[0], chunk))

    sfs = sf_p.reshape(n_chunks, chunk)
    cls = cells_p.reshape(n_chunks, chunk)
    vs = valid_p.reshape(n_chunks, chunk)
    xs = x_p.reshape(n_chunks, chunk, p)
    # precomputed per-chunk design outer products: (n_chunks, chunk, p*p)
    xxs = (xs[..., :, None] * xs[..., None, :]).reshape(
        n_chunks, chunk, p * p)
    n_valid = jnp.asarray(S, dtype)
    ridge = jnp.diag(jnp.full(p, 1e-6 / LN2 ** 2, dtype=dtype))

    # ---- base stats + group means q (G,C): one streamed pass ----
    def stats_body(carry, xc):
        s_yn, s_yn2, s_qn, tot, n_c = carry
        i_c, sf_c, cl_c, v_c = xc
        y_c = chunk_of(counts_p, i_c)
        yn = y_c.astype(dtype) / sf_c[None, :]
        oh = (jax.nn.one_hot(cl_c, C, dtype=dtype) * v_c[:, None])
        s_yn += yn.sum(axis=1)
        s_yn2 += (yn * yn).sum(axis=1)
        s_qn += jnp.dot(yn * v_c[None, :], oh,
                        preferred_element_type=dtype)      # (G,C)
        tot += y_c.astype(dtype).sum(axis=1)
        n_c += oh.sum(axis=0)
        return (s_yn, s_yn2, s_qn, tot, n_c), None

    z_g = jnp.zeros(G, dtype)
    (s_yn, s_yn2, q_num, tot, n_c), _ = jax.lax.scan(
        stats_body, (z_g, z_g, jnp.zeros((G, C), dtype), z_g,
                     jnp.zeros(C, dtype)), (idxs, sfs, cls, vs))
    base_mean = s_yn / n_valid
    base_var = (s_yn2 - n_valid * base_mean ** 2) / (n_valid - 1.0)
    all_zero = tot == 0
    q = q_num / n_c[None, :]              # (G,C) normalized group means

    xim = jnp.sum(jnp.where(valid_p > 0, 1.0 / sf_p, 0.0)) / n_valid

    # ---- dispersion init (R/core.R:709-728) ----
    q_ls = jnp.maximum(q, 1.0)

    def rough_body(acc, xc):
        i_c, sf_c, cl_c, v_c = xc
        y_c = chunk_of(counts_p, i_c)
        yn = y_c.astype(dtype) / sf_c[None, :]
        mu_ls = q_ls[:, cl_c]
        acc += jnp.sum(v_c[None, :] * ((yn - mu_ls) ** 2 - mu_ls)
                       / mu_ls ** 2, axis=1)
        return acc, None

    rough_sum, _ = jax.lax.scan(rough_body, z_g, (idxs, sfs, cls, vs))
    rough = jnp.maximum(rough_sum / (S - p), 0.0)
    moments = (base_var - xim * base_mean) / base_mean ** 2
    alpha_init = jnp.minimum(rough, jnp.where(all_zero, rough, moments))
    alpha_init = jnp.clip(jnp.where(jnp.isnan(alpha_init), min_disp,
                                    alpha_init), min_disp, max_disp)

    # mu for dispersion fitting: q gather * sf, clamped (linearMu fast
    # path — exact for the group design; R/core.R:754-764)
    q_mu = jnp.where(all_zero[:, None], 1.0, q)

    def make_lp_dlp(cnt, q_, row_idx=None):
        """Streamed fused log-posterior + derivative for a gene block
        (cnt: (G, Sp) resident counts; q_: (g, C) clamped group means;
        row_idx: optional (g,) compacted gene indices).  Compacted
        blocks gather their rows per streamed chunk — gathering from
        the whole (G, Sp) matrix at 30k x 50k makes XLA materialize
        half-matrix slice temporaries (~2.8 GB each) plus a relayout
        copy of the full counts, which OOMs a 16 GB chip."""
        def lp_dlp(la, use_prior, pm, pv):
            g = la.shape[0]
            alpha = jnp.exp(la)
            inv_a = 1.0 / alpha

            def body(carry, xc):
                ll, s1, b, db = carry
                i_c, sf_c, cl_c, v_c, xx_c = xc
                y_blk = chunk_of(cnt, i_c)
                if row_idx is not None:
                    y_blk = jnp.take(y_blk, row_idx, axis=0)
                y_f = y_blk.astype(dtype)
                mu = jnp.maximum(q_[:, cl_c] * sf_c[None, :], min_mu)
                mu = jnp.where(v_c[None, :] > 0, mu, 1.0)
                mu_inv_a = mu + inv_a[:, None]
                mua = mu * alpha[:, None]
                l1p = jnp.log1p(mua)
                ll += jnp.sum(v_c[None, :] * (
                    gammaln(y_f + inv_a[:, None]) - y_f * jnp.log(mu_inv_a)
                    - inv_a[:, None] * l1p), axis=1)
                s1 += jnp.sum(v_c[None, :] * (
                    l1p - mua / (1.0 + mua) + y_f / mu_inv_a
                    - digamma(y_f + inv_a[:, None])), axis=1)
                w = v_c[None, :] / (1.0 / mu + alpha[:, None])
                b += jnp.dot(w, xx_c, preferred_element_type=dtype)
                db += jnp.dot(-w * w, xx_c, preferred_element_type=dtype)
                return (ll, s1, b, db), None

            z_pp = jnp.zeros((g, p * p), dtype)
            (ll, s1, b, db), _ = jax.lax.scan(
                body, (-n_valid * gammaln(inv_a),
                       n_valid * digamma(inv_a), z_pp, z_pp),
                (idxs, sfs, cls, vs, xxs))
            bm = b.reshape(g, p, p)
            _, logdet = jnp.linalg.slogdet(bm)
            binv = jnp.linalg.inv(bm)
            tr = jnp.einsum("gij,gji->g", binv, db.reshape(g, p, p))
            lp = ll - 0.5 * logdet
            dlp = (s1 / (alpha * alpha) - 0.5 * tr) * alpha
            if use_prior:
                lp = lp - 0.5 * (la - pm) ** 2 / pv
                dlp = dlp - (la - pm) / pv
            return lp, dlp

        return lp_dlp

    def line_search(la0, use_prior, pm, pv):
        """Armijo backtracking ascent (cpp:163-277), streamed, with
        straggler compaction: once the live set fits G//8, gather those
        genes' count rows and finish on the compacted block — tail
        iterations then cost cap/G of a full HBM sweep."""
        lp_dlp = make_lp_dlp(counts_p, q_mu)
        lp0, dlp0 = lp_dlp(la0, use_prior, pm, pv)
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        tol = jnp.maximum(1e-6, jnp.abs(lp0) * 50.0 * eps)
        min_la = jnp.log(jnp.asarray(min_disp / 10.0, dtype))
        state = (jnp.asarray(0, jnp.int32), la0, jnp.ones_like(la0),
                 lp0, dlp0, jnp.zeros(G, jnp.int32),
                 jnp.zeros(G, jnp.int32), jnp.zeros(G, dtype),
                 jnp.asarray(tol, dtype) * jnp.ones(G, dtype)
                 if jnp.ndim(tol) == 0 else tol)

        def make_body(lp_dlp_, pm_, pv_):
            def body(s):
                t, a, kappa, lp, dlp, iters, iacc, donef, tol_ = s
                done = donef > 0.5
                live = ~done
                iters = iters + live.astype(jnp.int32)
                a_pr = a + kappa * dlp
                kappa = jnp.where(a_pr < -30.0, (-30.0 - a) / dlp, kappa)
                kappa = jnp.where(a_pr > 10.0, (10.0 - a) / dlp, kappa)
                a_new = a + kappa * dlp
                lp_new, dlp_next = lp_dlp_(a_new, use_prior, pm_, pv_)
                accept = -lp_new <= -lp - kappa * 1e-4 * dlp * dlp
                upd = live & accept
                iacc = iacc + upd.astype(jnp.int32)
                change = lp_new - lp
                conv = change < tol_
                under = a_new < min_la
                a = jnp.where(upd, a_new, a)
                lp = jnp.where(upd & (conv | ~under), lp_new, lp)
                if jnp.finfo(dtype).eps > 1e-10:
                    stalled = live & ~accept & (kappa * dlp * dlp < tol_)
                else:
                    stalled = jnp.zeros_like(live)
                newly = (upd & (conv | under)) | stalled
                cont = upd & ~conv & ~under
                dlp = jnp.where(cont, dlp_next, dlp)
                kap = jnp.minimum(kappa * 1.1, 1.0)
                kap = jnp.where(iacc % 5 == 0, kap / 2.0, kap)
                kappa = jnp.where(cont, kap,
                                  jnp.where(live & ~accept, kappa / 2.0,
                                            kappa))
                donef = jnp.maximum(donef, newly.astype(dtype))
                return (t + 1, a, kappa, lp, dlp, iters, iacc, donef,
                        tol_)

            return body

        from ..ops.padding import compact_live_indices
        cap = min(1 << (max(G // 8, 512) - 1).bit_length(), G)
        body_full = make_body(lp_dlp, pm, pv)
        if cap * 2 >= G:
            s = jax.lax.while_loop(
                lambda s: (s[0] < maxit) & (jnp.max(1.0 - s[7]) > 0.5),
                body_full, state)
        else:
            s = jax.lax.while_loop(
                lambda s: (s[0] < maxit) &
                (jnp.sum(1.0 - s[7]) > cap), body_full, state)
            live = s[7] < 0.5
            idx = compact_live_indices(live, cap)
            q_c = q_mu[idx]
            pm_c = pm[idx] if jnp.ndim(pm) else pm
            sub = (s[0],) + tuple(v[idx] for v in s[1:])
            body_sub = make_body(make_lp_dlp(counts_p, q_c, idx), pm_c, pv)
            sub = jax.lax.while_loop(
                lambda s_: (s_[0] < maxit) &
                (jnp.max(1.0 - s_[7]) > 0.5), body_sub, sub)
            s = (sub[0],) + tuple(
                full.at[idx].set(part)
                for full, part in zip(s[1:], sub[1:]))
        return dict(log_alpha=s[1], last_lp=s[3], initial_lp=lp0,
                    iter=s[5])

    def grid_search_subset(idx, pm, pv, use_prior):
        """Two-stage grid search (cpp:468-513) on a compacted gene
        subset (idx: (cap,) gene indices)."""
        lp_dlp = make_lp_dlp(counts_p, q_mu[idx], idx)
        g = idx.shape[0]
        pm_c = pm[idx] if jnp.ndim(pm) else pm

        def argmax_over(points):
            def body(carry, la_j):
                best_lp, best_a = carry
                lp, _ = lp_dlp(la_j, use_prior, pm_c, pv)
                better = lp > best_lp
                return (jnp.where(better, lp, best_lp),
                        jnp.where(better, la_j, best_a)), None

            init = (jnp.full(g, -jnp.inf, dtype), jnp.zeros(g, dtype))
            (_, best_a), _ = jax.lax.scan(body, init, points)
            return best_a

        gridv = grid.astype(dtype)
        coarse = jnp.broadcast_to(gridv[:, None], (gridv.shape[0], g))
        a_hat = argmax_over(coarse)
        delta = gridv[1] - gridv[0]
        frac = jnp.linspace(0.0, 1.0, gridv.shape[0], dtype=dtype)
        fine = a_hat[None, :] - delta + 2.0 * delta * frac[:, None]
        return argmax_over(fine)

    def grid_fallback(disp_cur, need, pm, pv, use_prior):
        """Run the grid only on the `need` genes (compacted)."""
        from ..ops.padding import compact_live_indices
        cap = min(1 << (max(G // 16, 256) - 1).bit_length(), G)

        def run(_):
            idx = compact_live_indices(need, cap)
            la = grid_search_subset(idx, pm, pv, use_prior)
            new = jnp.where(need[idx], jnp.exp(la), disp_cur[idx])
            return disp_cur.at[idx].set(new)

        # over-capacity overflow: two passes cover 2*cap genes; beyond
        # that (pathological) the remainder keeps the line-search value
        def run2(_):
            d1 = run(None)
            still = need & (d1 == disp_cur)
            idx = compact_live_indices(still, cap)
            la = grid_search_subset(idx, pm, pv, use_prior)
            new = jnp.where(still[idx], jnp.exp(la), d1[idx])
            return d1.at[idx].set(new)

        n = jnp.sum(need)
        return jax.lax.cond(
            n == 0, lambda _: disp_cur,
            lambda _: jax.lax.cond(n > cap, run2, run, operand=None),
            operand=None)

    # ---- gene-wise MLE (R/core.R:770-848) ----
    la0 = jnp.log(alpha_init)
    mle = line_search(la0, False, la0, jnp.asarray(1.0, dtype))
    alpha_mle = jnp.minimum(jnp.exp(mle["log_alpha"]), max_disp)
    no_inc = mle["last_lp"] < mle["initial_lp"] + \
        jnp.abs(mle["initial_lp"]) / 1e6
    disp_gene_est = jnp.where(no_inc, alpha_init, alpha_mle)
    conv = (mle["iter"] < maxit) & (mle["iter"] != 1)
    need_grid = ~conv & (disp_gene_est > min_disp * 10)
    disp_gene_est = grid_fallback(disp_gene_est, need_grid,
                                  jnp.zeros(G, dtype),
                                  jnp.asarray(1.0, dtype), False)
    disp_gene_est = jnp.clip(disp_gene_est, min_disp, max_disp)

    # ---- trend + prior variance (cross-gene; R/core.R:864-939) ----
    use_for_fit = (disp_gene_est > 100 * min_disp) & ~all_zero
    coefs = _gamma_trend_fit(base_mean, disp_gene_est, use_for_fit)
    disp_fit = coefs[0] + coefs[1] / jnp.where(all_zero, 1.0, base_mean)
    resid = jnp.log(disp_gene_est) - jnp.log(disp_fit)
    med = _masked_median(resid, ~all_zero)
    var_log_disp = (1.4826 * _masked_median(jnp.abs(resid - med),
                                            ~all_zero)) ** 2
    exp_var = polygamma(1, (S - p) / 2.0).astype(dtype)
    disp_prior_var = jnp.maximum(var_log_disp - exp_var, 0.25)

    # ---- MAP shrinkage (R/core.R:1016-1115) ----
    disp_init = jnp.where(disp_gene_est > 0.1 * disp_fit, disp_gene_est,
                          disp_fit)
    pm = jnp.log(disp_fit)
    map_res = line_search(jnp.log(disp_init), True, pm, disp_prior_var)
    disp_map = jnp.exp(map_res["log_alpha"])
    need_map = map_res["iter"] >= maxit
    disp_map = grid_fallback(disp_map, need_map, pm, disp_prior_var, True)
    disp_map = jnp.clip(disp_map, min_disp, max_disp)
    disp_outlier = jnp.log(disp_gene_est) > pm + \
        2.0 * jnp.sqrt(var_log_disp)
    dispersion = jnp.where(disp_outlier, disp_gene_est, disp_map)

    # ---- streamed ridge IRLS + Wald (cpp:282-465, R/core.R:1400-1508) --
    # beta init via QR-equivalent LS on log(norm_counts + 0.1): for the
    # one-factor design the LS solution is the per-group mean of
    # log(yn + 0.1), accumulated in one streamed pass
    def logls_body(acc, xc):
        i_c, sf_c, cl_c, v_c = xc
        yn = chunk_of(counts_p, i_c).astype(dtype) / sf_c[None, :]
        oh = (jax.nn.one_hot(cl_c, C, dtype=dtype) * v_c[:, None])
        acc += jnp.dot(jnp.log(yn + 0.1), oh,
                       preferred_element_type=dtype)
        return acc, None

    logq, _ = jax.lax.scan(logls_body, jnp.zeros((G, C), dtype),
                           (idxs, sfs, cls, vs))
    logq = logq / n_c[None, :]            # (G,C) group means of log
    beta0 = jnp.concatenate([logq[:, :1], logq[:, 1:] - logq[:, :1]],
                            axis=1)
    y_alpha = jnp.where(all_zero, 1.0, dispersion)
    size = 1.0 / y_alpha

    def dev_const_body(acc, xc):
        i_c, v_c = xc
        y_f = chunk_of(counts_p, i_c).astype(dtype)
        acc += jnp.sum(v_c[None, :] * (gammaln(y_f + size[:, None])
                                       - gammaln(y_f + 1.0)), axis=1)
        return acc, None

    dc, _ = jax.lax.scan(dev_const_body, z_g, (idxs, vs))
    dev_const = -2.0 * (dc + n_valid * (size * jnp.log(size)
                                        - gammaln(size)))

    def irls_pass(beta):
        """One streamed sweep: (X'WX (G,p,p), X'Wz (G,p), deviance)."""
        def body(carry, xc):
            A, r, dev = carry
            i_c, sf_c, v_c, x_c, xx_c = xc
            y_f = chunk_of(counts_p, i_c).astype(dtype)
            mu = jnp.maximum(sf_c[None, :] * jnp.exp(beta @ x_c.T),
                             min_mu)
            w = v_c[None, :] * mu / (1.0 + y_alpha[:, None] * mu)
            z = jnp.log(mu / sf_c[None, :]) + (y_f - mu) / mu
            A += jnp.dot(w, xx_c, preferred_element_type=dtype)
            r += jnp.dot(w * z, x_c, preferred_element_type=dtype)
            t = jnp.where(y_f > 0.0, y_f * (jnp.log(mu)
                                            - jnp.log(size[:, None] + mu)),
                          0.0)
            dev += -2.0 * jnp.sum(v_c[None, :] * (
                -size[:, None] * jnp.log(size[:, None] + mu) + t), axis=1)
            return (A, r, dev), None

        (A, r, dev), _ = jax.lax.scan(
            body, (jnp.zeros((G, p * p), dtype), jnp.zeros((G, p), dtype),
                   z_g), (idxs, sfs, vs, xs, xxs))
        return A.reshape(G, p, p), r, dev_const + dev

    eps = jnp.finfo(dtype).eps
    beta_tol = jnp.maximum(1e-8, 30.0 * eps)

    def irls_cond(s):
        return (s[0] < maxit) & (jnp.max(s[5]) > 0.5)

    def irls_body(s):
        t, beta, dev_old, iters, dev, activef = s
        active = activef > 0.5
        iters = iters + active.astype(jnp.int32)
        A, r, _ = irls_pass(beta)
        beta_new = jnp.linalg.solve(A + ridge[None], r[..., None])[..., 0]
        diverged = jnp.max(jnp.abs(beta_new), axis=1) > 30.0
        beta_out = jnp.where(active[:, None], beta_new, beta)
        cont = active & ~diverged
        _, _, dev_new = irls_pass(beta_new)
        dev = jnp.where(cont, dev_new, dev)
        ct = jnp.abs(dev_new - dev_old) / (jnp.abs(dev_new) + 0.1)
        bad = jnp.isnan(ct)
        convd = (t > 0) & (ct < beta_tol)
        if eps > 1e-10:  # f32-only beta-stall exit (ops/irls.py rule)
            dbeta = jnp.max(jnp.abs(beta_new - beta), axis=1)
            bmax = jnp.max(jnp.abs(beta_new), axis=1)
            convd = convd | ((t > 0) & (dbeta < 32.0 * eps * (1.0 + bmax)))
        iters = jnp.where(active & (diverged | (bad & ~diverged)),
                          maxit, iters)
        activef = (cont & ~bad & ~convd).astype(dtype)
        dev_old = jnp.where(cont, dev_new, dev_old)
        return (t + 1, beta_out, dev_old, iters, dev, activef)

    state = (jnp.asarray(0, jnp.int32), beta0, z_g,
             jnp.zeros(G, jnp.int32), z_g, jnp.ones(G, dtype))
    _, beta, _, beta_iter, deviance, _ = jax.lax.while_loop(
        irls_cond, irls_body, state)

    # post-fit sigma sandwich diagonal (cpp:429-455)
    A, _, _ = irls_pass(beta)
    Ainv = jnp.linalg.inv(A + ridge[None])
    sigma = Ainv @ A @ Ainv
    beta_var = jnp.diagonal(sigma, axis1=1, axis2=2)

    beta_log2 = LOG2E * beta
    se_log2 = LOG2E * jnp.sqrt(jnp.maximum(beta_var, 0.0))
    stat = beta_log2 / se_log2
    pval = erfc(jnp.abs(stat) / jnp.sqrt(2.0).astype(dtype))
    padj = _bh_adjust(jnp.where(all_zero, jnp.nan, pval[:, -1]),
                      ~all_zero)

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
        stat=jnp.where(all_zero[:, None], jnp.nan, stat),
        pvalue=jnp.where(all_zero[:, None], jnp.nan, pval),
        betaIter=beta_iter, betaConv=beta_iter < maxit,
        deviance=nanmask(deviance), padjLast=padj)
