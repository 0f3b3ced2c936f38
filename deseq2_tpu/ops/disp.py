"""Batched dispersion estimation kernels.

TPU-native replacement for the reference's per-gene serial dispersion code
(src/DESeq2.cpp:31-277, 468-513).  The three posterior functions become
pure batched JAX functions of (log_alpha (G,), y (G,S), mu (G,S), X (S,p));
the Cox-Reid log-det is a batched p x p Cholesky instead of a per-gene
LAPACK det; the Armijo backtracking line search runs all genes in lockstep
with per-gene accept masks and the exact accept/step-size rules of the
reference (cpp:202-258); the two-stage grid search is a masked running
argmax (cpp:492-510).

All math matches the reference's exact expressions, including the
log-likelihood *form* (cpp:52-56) — it omits the lgamma(y+1) constant, and
the gene-est "noIncrease" rule (R/core.R:827-830) compares raw lp values,
so the constant convention matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln, polygamma

from .linalg import spd_inverse, spd_logdet
from .nb import digamma_diff, lgamma_diff_centered, trigamma_diff
from .padding import bucket_size, pad_rows

EPSILON_ARMIJO = 1.0e-4  # cpp:175


def _trigamma(z):
    return polygamma(1, z)


def make_cr_masks(x, weights, weight_threshold, use_weights):
    """Row/column masks for the weighted Cox-Reid term.

    The reference subsets design rows with weight > threshold and drops
    all-zero columns per gene (cpp:38-44).  Batched equivalent: a per-gene
    row mask (G,S) and column mask (G,p); dropped columns contribute 0 to
    the log-det via an identity diagonal.  Masks depend only on the fixed
    weights, so they are computed once per stage.
    """
    if not use_weights or weights is None:
        return None, None
    row_mask = weights > weight_threshold  # (G,S)
    # column active iff any selected row has |x| > 0
    col_mask = jnp.einsum("gs,sp->gp", row_mask.astype(x.dtype),
                          jnp.abs(x)) > 0.0
    return row_mask, col_mask


def _cr_b_matrices(x, w_diag, row_mask, col_mask, orders=1):
    """b = X' diag(w) X and its alpha-derivative versions, column-masked.

    w_diag here is a tuple of (G,S) diagonals (w, dw, d2w as needed).
    Returns list of (G,p,p) matrices; the first (b) gets identity on
    dropped columns so logdet of the submatrix is preserved.
    """
    p = x.shape[1]
    mats = []
    for i, w in enumerate(w_diag):
        if row_mask is not None:
            w = jnp.where(row_mask, w, 0.0)
        S = x.shape[0]
        xx = (x[:, :, None] * x[:, None, :]).reshape(S, p * p)
        b = (w @ xx).reshape(-1, p, p)
        if col_mask is not None:
            cm = col_mask.astype(b.dtype)
            b = b * (cm[:, :, None] * cm[:, None, :])
            if i == 0:
                # unit diagonal on dropped columns: logdet of the kept
                # submatrix is unchanged
                b = b + jnp.einsum("gp,pq->gpq", 1.0 - cm,
                                   jnp.eye(p, dtype=b.dtype))
        mats.append(b)
    return mats


def log_posterior(log_alpha, y, mu, x, prior_mean, prior_var, use_prior,
                  weights=None, use_weights=False, row_mask=None,
                  col_mask=None, use_cr=True):
    """Batched NB log-posterior of dispersion (cpp:31-64).

    log_alpha, prior_mean: (G,); y, mu: (G,S); x: (S,p); prior_var scalar.
    """
    alpha = jnp.exp(log_alpha)[:, None]  # (G,1)
    inv_alpha = 1.0 / alpha
    if use_cr:
        w = 1.0 / (1.0 / mu + alpha)
        (b,) = _cr_b_matrices(x, (w,), row_mask, col_mask)
        cr = -0.5 * spd_logdet(b)
    else:
        cr = 0.0
    # difference form: lgamma(y+c)-lgamma(c) - y*log(mu+c) - c*log1p(mu*a)
    # == [lgamma(y+c)-lgamma(c)-y*log(c)] - (y+c)*log1p(mu*a); the
    # centered first bracket stays finite-precision-stable when
    # c = 1/alpha >> y (see ops/nb.py:lgamma_diff_centered — the f32
    # direct form let the line search race to the min-alpha clamp)
    l1p = jnp.log1p(mu * alpha)
    ll_terms = (lgamma_diff_centered(y, inv_alpha)
                - (y + inv_alpha) * l1p)
    if use_weights and weights is not None:
        ll = jnp.sum(weights * ll_terms, axis=-1)
    else:
        ll = jnp.sum(ll_terms, axis=-1)
    la = log_alpha
    prior = jnp.where(use_prior,
                      -0.5 * (la - prior_mean) ** 2 / prior_var, 0.0)
    return ll + prior + cr


def dlog_posterior(log_alpha, y, mu, x, prior_mean, prior_var, use_prior,
                   weights=None, use_weights=False, row_mask=None,
                   col_mask=None, use_cr=True):
    """d/d(log alpha) of the log-posterior (cpp:68-107)."""
    alpha_v = jnp.exp(log_alpha)
    alpha = alpha_v[:, None]
    inv_alpha = 1.0 / alpha
    if use_cr:
        denom = 1.0 / mu + alpha
        w = 1.0 / denom
        dw = -1.0 / denom ** 2
        b, db = _cr_b_matrices(x, (w, dw), row_mask, col_mask)
        b_inv = spd_inverse(b)
        # trace(b^-1 db); dropped columns have db == 0 rows/cols
        dcr = -0.5 * jnp.einsum("gpq,gqp->g", b_inv, db)
    else:
        dcr = 0.0
    terms = (jnp.log1p(mu * alpha)
             - mu * alpha / (1.0 + mu * alpha)
             - digamma_diff(y, inv_alpha) + y / (mu + inv_alpha))
    if use_weights and weights is not None:
        s = jnp.sum(weights * terms, axis=-1)
    else:
        s = jnp.sum(terms, axis=-1)
    ll_part = s / alpha_v ** 2
    prior = jnp.where(use_prior, -(log_alpha - prior_mean) / prior_var, 0.0)
    return (ll_part + dcr) * alpha_v + prior


def d2log_posterior(log_alpha, y, mu, x, prior_mean, prior_var, use_prior,
                    weights=None, use_weights=False, row_mask=None,
                    col_mask=None, use_cr=True):
    """d2/d(log alpha)^2 of the log-posterior (cpp:111-158)."""
    alpha_v = jnp.exp(log_alpha)
    alpha = alpha_v[:, None]
    inv_alpha = 1.0 / alpha
    if use_cr:
        denom = 1.0 / mu + alpha
        w = 1.0 / denom
        dw = -1.0 / denom ** 2
        d2w = 2.0 / denom ** 3
        b, db, d2b = _cr_b_matrices(x, (w, dw, d2w), row_mask, col_mask)
        b_inv = spd_inverse(b)
        tr_bidb = jnp.einsum("gpq,gqp->g", b_inv, db)
        bidb = b_inv @ db
        tr_sq = jnp.einsum("gpq,gqp->g", bidb, bidb)
        tr_bid2b = jnp.einsum("gpq,gqp->g", b_inv, d2b)
        # ddetb/detb = tr_bidb ; d2detb/detb = tr_bidb^2 - tr_sq + tr_bid2b
        cr2 = 0.5 * tr_bidb ** 2 - 0.5 * (tr_bidb ** 2 - tr_sq + tr_bid2b)
    else:
        cr2 = 0.0
    terms1 = (jnp.log1p(mu * alpha)
              - mu * alpha / (1.0 + mu * alpha)
              - digamma_diff(y, inv_alpha) + y / (mu + inv_alpha))
    inv_a2 = 1.0 / alpha ** 2
    terms2 = (inv_a2 * trigamma_diff(y, inv_alpha)
              + mu ** 2 * alpha / (1.0 + mu * alpha) ** 2
              + inv_a2 * y / (mu + inv_alpha) ** 2)
    if use_weights and weights is not None:
        s1 = jnp.sum(weights * terms1, axis=-1)
        s2 = jnp.sum(weights * terms2, axis=-1)
    else:
        s1 = jnp.sum(terms1, axis=-1)
        s2 = jnp.sum(terms2, axis=-1)
    ll_part = -2.0 * s1 / alpha_v ** 3 + s2 / alpha_v ** 2
    dlp_noprior = dlog_posterior(log_alpha, y, mu, x, prior_mean, prior_var,
                                 False, weights, use_weights, row_mask,
                                 col_mask, use_cr)
    prior = jnp.where(use_prior, -1.0 / prior_var, 0.0)
    return (ll_part + cr2) * alpha_v ** 2 + dlp_noprior + prior


def fit_disp_line_search(y, x, mu, log_alpha_init, prior_mean, prior_var,
                         min_log_alpha, kappa_0=1.0, tol=1e-6, maxit=100,
                         use_prior=False, weights=None, use_weights=False,
                         weight_threshold=1e-2, use_cr=True):
    """Batched fitDisp with genes-axis bucketing (see ops/padding.py).

    Under an active `use_gene_mesh` (ops/placement.py) the gene-axis
    inputs upload sharded so the solve runs data-parallel (the exact
    path's DESeqParallel equivalent, incl. weighted fits)."""
    import numpy as np
    from .placement import (active_gene_mesh, place_gene_axis,
                            round_up_to_multiple)
    G = np.asarray(y).shape[0]
    gp = bucket_size(G)
    mesh = active_gene_mesh()
    if mesh is not None:
        gp = round_up_to_multiple(gp, mesh.devices.size)
    if gp != G:
        y = pad_rows(np.asarray(y), gp, 1.0)
        mu = pad_rows(np.asarray(mu), gp, 1.0)
        log_alpha_init = pad_rows(np.asarray(log_alpha_init), gp, 0.0)
        prior_mean = pad_rows(np.asarray(prior_mean), gp, 0.0)
        if weights is not None:
            weights = pad_rows(np.asarray(weights), gp, 1.0)
    y, mu, log_alpha_init, prior_mean, weights = place_gene_axis(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(log_alpha_init),
        jnp.asarray(prior_mean),
        None if weights is None else jnp.asarray(weights))
    out = _fit_disp_line_search_core(
        y, jnp.asarray(x), mu,
        log_alpha_init, prior_mean, prior_var,
        min_log_alpha, kappa_0=kappa_0, tol=tol, maxit=maxit,
        use_prior=use_prior,
        weights=weights,
        use_weights=use_weights, weight_threshold=weight_threshold,
        use_cr=use_cr)
    if gp != G:
        out = {k: v[:G] for k, v in out.items()}
    return out


def _ls_body_factory(data, x, prior_var, use_prior, use_weights, use_cr,
                     min_log_alpha, kappa_0, dtype):
    """Build (lp_fn, dlp_fn, body) closed over the per-gene `data` dict.

    Keeping the per-gene arrays in a dict makes the loop body reusable on
    a compacted (gathered) subset of genes — the straggler pass below.
    """
    y, mu, prior_mean, tol_eff = (data["y"], data["mu"], data["prior_mean"],
                                  data["tol_eff"])
    kw = dict(weights=data.get("weights"), use_weights=use_weights,
              row_mask=data.get("row_mask"), col_mask=data.get("col_mask"),
              use_cr=use_cr)

    def lp_fn(a):
        return log_posterior(a, y, mu, x, prior_mean, prior_var, use_prior,
                             **kw)

    def dlp_fn(a):
        return dlog_posterior(a, y, mu, x, prior_mean, prior_var, use_prior,
                              **kw)

    def body(state):
        (t, a, kappa, lp, dlp, iters, iter_accept, change, done) = state
        live = ~done
        iters = iters + live.astype(jnp.int32)
        a_propose = a + kappa * dlp
        # step clamps so log alpha stays in [-30, 10] (cpp:216-224)
        kappa = jnp.where(a_propose < -30.0, (-30.0 - a) / dlp, kappa)
        kappa = jnp.where(a_propose > 10.0, (10.0 - a) / dlp, kappa)
        a_new = a + kappa * dlp
        lp_new = lp_fn(a_new)
        theta_kappa = -lp_new
        theta_hat_kappa = -lp - kappa * EPSILON_ARMIJO * dlp ** 2
        accept = theta_kappa <= theta_hat_kappa
        upd = live & accept
        iter_accept = iter_accept + upd.astype(jnp.int32)
        change_new = lp_new - lp
        # stop conditions (cpp:236-244): small change -> converged (lp
        # updated); log alpha under min -> stop (lp NOT updated)
        conv = change_new < tol_eff
        under = a_new < min_log_alpha
        a = jnp.where(upd, a_new, a)
        change = jnp.where(upd, change_new, change)
        lp = jnp.where(upd & (conv | ~under), lp_new, lp)
        # f32 only: a rejected step whose best-case improvement is below
        # the rounding noise floor can never be accepted (the Armijo test
        # cancels to zero), so the gene is converged at its current point.
        # Disabled in f64 where the serial reference semantics (halve
        # kappa until accept) terminate fine on their own.
        if jnp.finfo(dtype).eps > 1e-10:
            stalled = live & ~accept & (kappa * dlp ** 2 < tol_eff)
        else:
            stalled = jnp.zeros_like(live)
        newly_done = (upd & (conv | under)) | stalled
        cont_accept = upd & ~conv & ~under
        dlp_next = dlp_fn(a)
        dlp = jnp.where(cont_accept, dlp_next, dlp)
        kap_acc = jnp.minimum(kappa * 1.1, kappa_0)
        kap_acc = jnp.where(iter_accept % 5 == 0, kap_acc / 2.0, kap_acc)
        kappa = jnp.where(cont_accept, kap_acc,
                          jnp.where(live & ~accept, kappa / 2.0, kappa))
        done = done | newly_done
        return (t + 1, a, kappa, lp, dlp, iters, iter_accept, change, done)

    return lp_fn, dlp_fn, body


@partial(jax.jit, static_argnames=("maxit", "use_prior", "use_weights", "use_cr"))
def _fit_disp_line_search_core(y, x, mu, log_alpha_init, prior_mean, prior_var,
                         min_log_alpha, kappa_0=1.0, tol=1e-6, maxit=100,
                         use_prior=False, weights=None, use_weights=False,
                         weight_threshold=1e-2, use_cr=True):
    """Batched Armijo backtracking ascent on log(alpha) (cpp:163-277).

    Returns dict(log_alpha, iter, iter_accept, last_change, initial_lp,
    initial_dlp, last_lp, last_dlp, last_d2lp) matching the Rcpp list.

    Cascading straggler compaction (see ops/padding.py:cascade_while):
    the live set is repeatedly gathered into smaller static buffers as
    genes converge, so tail trips don't pay the full (G,S) cost.
    Gather -> same body -> scatter is exact, not an approximation.
    """
    from .padding import cascade_caps, cascade_while

    G = y.shape[0]
    dtype = mu.dtype
    y = y.astype(dtype)
    row_mask, col_mask = make_cr_masks(x, weights, weight_threshold,
                                       use_weights)
    kw = dict(weights=weights, use_weights=use_weights, row_mask=row_mask,
              col_mask=col_mask, use_cr=use_cr)

    a0 = log_alpha_init.astype(dtype)
    data = dict(y=y, mu=mu, prior_mean=prior_mean)
    if weights is not None:
        data["weights"] = weights
        if row_mask is not None:
            data["row_mask"], data["col_mask"] = row_mask, col_mask

    lp_fn0, dlp_fn0, _ = _ls_body_factory(
        dict(data, tol_eff=jnp.zeros(G, dtype)), x, prior_var, use_prior,
        use_weights, use_cr, min_log_alpha, kappa_0, dtype)
    lp0 = lp_fn0(a0)
    dlp0 = dlp_fn0(a0)

    # dtype-aware tolerance: lp is O(1e2-1e5), so in f32 an absolute
    # change below |lp|*eps is pure rounding noise — the reference's
    # 1e-6 absolute tol would never be met and every gene would grind
    # through kappa-halving to maxit.  No-op in f64 for practical |lp|.
    tol_eff = jnp.maximum(tol, jnp.abs(lp0) * 50.0 * jnp.finfo(dtype).eps)
    data["tol_eff"] = tol_eff

    def make_body(d):
        return _ls_body_factory(d, x, prior_var, use_prior, use_weights,
                                use_cr, min_log_alpha, kappa_0, dtype)[2]

    kappa_init = jnp.full(G, kappa_0, dtype=dtype)
    state = (jnp.array(0, jnp.int32), a0, kappa_init, lp0, dlp0,
             jnp.zeros(G, jnp.int32), jnp.zeros(G, jnp.int32),
             jnp.full(G, -1.0, dtype=dtype), jnp.zeros(G, dtype=bool))

    state = cascade_while(make_body, lambda s: ~s[8], data, state, maxit,
                          cascade_caps(G))

    (_, a, _, lp, dlp, iters, iter_accept, change, _) = state

    d2 = d2log_posterior(a, y, mu, x, prior_mean, prior_var, use_prior, **kw)
    return dict(log_alpha=a, iter=iters, iter_accept=iter_accept,
                last_change=change, initial_lp=lp0, initial_dlp=dlp0,
                last_lp=lp, last_dlp=dlp, last_d2lp=d2)


def fit_disp_grid(y, x, mu, disp_grid, prior_mean, prior_var,
                  use_prior=False, weights=None, use_weights=False,
                  weight_threshold=1e-2, use_cr=True, grid_n=20):
    """Batched fitDispGrid with genes-axis bucketing (see ops/padding.py).

    Shards over an active `use_gene_mesh` like fit_disp_line_search."""
    import numpy as np
    from .placement import (active_gene_mesh, place_gene_axis,
                            round_up_to_multiple)
    G = np.asarray(y).shape[0]
    gp = bucket_size(G)
    mesh = active_gene_mesh()
    if mesh is not None:
        gp = round_up_to_multiple(gp, mesh.devices.size)
    if gp != G:
        y = pad_rows(np.asarray(y), gp, 1.0)
        mu = pad_rows(np.asarray(mu), gp, 1.0)
        prior_mean = pad_rows(np.asarray(prior_mean), gp, 0.0)
        if weights is not None:
            weights = pad_rows(np.asarray(weights), gp, 1.0)
    y, mu, prior_mean, weights = place_gene_axis(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(prior_mean),
        None if weights is None else jnp.asarray(weights))
    out = _fit_disp_grid_core(
        y, jnp.asarray(x), mu,
        jnp.asarray(disp_grid), prior_mean, prior_var,
        use_prior=use_prior,
        weights=weights,
        use_weights=use_weights, weight_threshold=weight_threshold,
        use_cr=use_cr, grid_n=grid_n)
    if gp != G:
        out = out[:G]
    return out


@partial(jax.jit, static_argnames=("grid_n", "use_prior", "use_weights", "use_cr"))
def _fit_disp_grid_core(y, x, mu, disp_grid, prior_mean, prior_var,
                  use_prior=False, weights=None, use_weights=False,
                  weight_threshold=1e-2, use_cr=True, grid_n=20):
    """Two-stage grid search over log alpha (cpp:468-513).

    disp_grid: (grid_n,) shared coarse grid of log-alpha values.
    Memory-conscious: evaluates one grid point at a time (each eval builds
    (G,S) temporaries), keeping a running argmax.
    """
    G = y.shape[0]
    dtype = mu.dtype
    y = y.astype(dtype)
    row_mask, col_mask = make_cr_masks(x, weights, weight_threshold,
                                       use_weights)
    kw = dict(weights=weights, use_weights=use_weights, row_mask=row_mask,
              col_mask=col_mask, use_cr=use_cr)

    def lp_at(a_vec):
        return log_posterior(a_vec, y, mu, x, prior_mean, prior_var,
                             use_prior, **kw)

    delta = disp_grid[1] - disp_grid[0]

    def scan_grid(grid_for_gene):
        """grid_for_gene: (grid_n, G) -> argmax value per gene (first max)."""
        def step(carry, a_row):
            best_lp, best_a = carry
            lp = lp_at(a_row)
            better = lp > best_lp
            return (jnp.where(better, lp, best_lp),
                    jnp.where(better, a_row, best_a)), None

        init = (jnp.full(G, -jnp.inf, dtype=dtype),
                jnp.zeros(G, dtype=dtype))
        (best_lp, best_a), _ = jax.lax.scan(step, init, grid_for_gene)
        return best_a

    coarse = jnp.broadcast_to(disp_grid[:, None], (grid_n, G)).astype(dtype)
    a_hat = scan_grid(coarse)
    # fine grid: grid_n points spanning a_hat +- delta, per gene
    frac = jnp.linspace(0.0, 1.0, grid_n, dtype=dtype)
    fine = (a_hat[None, :] - delta) + (2.0 * delta) * frac[:, None]
    log_alpha = scan_grid(fine)
    return log_alpha
