"""Batched ridge-penalized NB GLM IRLS over the genes axis — the hot kernel.

TPU-native replacement for the reference's per-gene serial IRLS
(fitBeta, src/DESeq2.cpp:282-465).  Where the reference loops genes and does
an (S+p) x p QR per gene per iteration, we run *all genes at once* as
batched matmuls on the MXU with per-gene convergence masks:

    mu    = nf * exp(X beta)           clamped at minmu   (cpp:324-327,361-364)
    W     = wts * mu / (1 + alpha mu)                      (cpp:337-341)
    z     = log(mu/nf) + (y - mu)/mu                       (cpp:349,397)
    A     = X'WX + diag(ridge)  ;  beta <- A^-1 X'Wz       (cpp:397-398)
    dev   = -2 sum wts * dnbinom_mu(y; 1/alpha, mu)        (cpp:365-373)
    stop when |dev - dev_old| / (|dev| + 0.1) < tol        (cpp:374-381)
    divergence guard |beta| > 30 -> iter := maxit          (cpp:357-359)

The QR and normal-equation paths of the reference solve the same ridge
system; we use one batched Cholesky solve (p is 2-10, S up to 50k).
Post-fit quantities match the cpp contract exactly: hat diagonals
(cpp:437-450), sandwich covariance sigma (cpp:452), contrast num/denom
(cpp:453-454), per-coefficient variances (cpp:455).

A mu-independent part of the NB log-pmf is hoisted out of the loop
(y, alpha are fixed during IRLS) — the reference pays 3 lgammas per element
per iteration for it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .linalg import chol_solve, spd_inverse
from .nb import nb_lgamma_const
from .padding import bucket_size, pad_rows

LARGE_BETA = 30.0


def _xtwx(x, w):
    """Batched X' diag(w_g) X: (G,S),(S,p) -> (G,p,p) as a single matmul."""
    S, p = x.shape
    xx = (x[:, :, None] * x[:, None, :]).reshape(S, p * p)  # (S, p*p)
    return (w @ xx).reshape(-1, p, p)


def fit_beta(y, x, nf, alpha, beta_init, ridge, weights=None, contrast=None,
             tol=1e-8, maxit=100, min_mu=0.5, use_weights=False):
    """Batched fitBeta with genes-axis bucketing (see ops/padding.py).

    Under an active `use_gene_mesh` context (ops/placement.py) the
    gene-axis inputs are uploaded sharded over the mesh, so the jitted
    solve runs data-parallel across devices — the exact-path equivalent
    of DESeqParallel's row sharding (R/parallel.R:6-74) for every
    configuration including weighted fits.
    """
    import numpy as np
    from .placement import (active_gene_mesh, place_gene_axis,
                            round_up_to_multiple)

    def pad_any(a, gp, fill):
        # device-resident inputs (e.g. counts kept on device for novel
        # contrasts) are padded with jnp — no host round trip
        if isinstance(a, jax.Array) and not isinstance(a, np.ndarray):
            widths = [(0, gp - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill)
        return pad_rows(np.asarray(a), gp, fill)

    G = y.shape[0]
    # a 1-D nf (shared per-sample size factors) broadcasts inside the
    # core against (G,S) — never materialize the (G,S) copy
    nf_1d = np.ndim(nf) == 1
    gp = bucket_size(G)
    mesh = active_gene_mesh()
    if mesh is not None:
        gp = round_up_to_multiple(gp, mesh.devices.size)
    if gp != G:
        y = pad_any(y, gp, 1)
        if not nf_1d:
            nf = pad_any(nf, gp, 1.0)
        alpha = pad_rows(np.asarray(alpha), gp, 1.0)
        beta_init = pad_rows(np.asarray(beta_init), gp, 0.0)
        if weights is not None:
            weights = pad_any(weights, gp, 1.0)
    y, alpha, beta_init, weights = place_gene_axis(
        jnp.asarray(y), jnp.asarray(alpha),
        jnp.asarray(beta_init),
        None if weights is None else jnp.asarray(weights))
    if not nf_1d:
        (nf,) = place_gene_axis(jnp.asarray(nf))
    else:
        nf = jnp.asarray(nf)
    out = _fit_beta_core(y, jnp.asarray(x), nf,
                         alpha, beta_init,
                         jnp.asarray(ridge),
                         weights=weights,
                         contrast=None if contrast is None else jnp.asarray(contrast),
                         tol=tol, maxit=maxit, min_mu=min_mu,
                         use_weights=use_weights)
    if gp != G:
        out = {k: v[:G] for k, v in out.items()}
    return out


@partial(jax.jit, static_argnames=("maxit", "use_weights"))
def _fit_beta_core(y, x, nf, alpha, beta_init, ridge, weights=None, contrast=None,
             tol=1e-8, maxit=100, min_mu=0.5, use_weights=False):
    """Batched fitBeta. All quantities on the natural-log scale.

    y, nf: (G,S); x: (S,p); alpha: (G,); beta_init: (G,p); ridge: (p,)
    weights: (G,S) observation weights or None; contrast: (p,) or None.

    Returns dict(beta, beta_var, iter, hat_diag, deviance,
                 contrast_num, contrast_denom) matching the Rcpp list
    (src/DESeq2.cpp:458-464).
    """
    G, S = y.shape
    p = x.shape[1]
    dtype = beta_init.dtype
    y = y.astype(dtype)
    nf = nf.astype(dtype)
    if weights is None or not use_weights:
        wts = None
    else:
        wts = weights.astype(dtype)

    size = 1.0 / alpha  # (G,)
    # mu-independent part of the deviance (see module docstring)
    lg_const = nb_lgamma_const(y, alpha[:, None])
    if wts is not None:
        dev_const = -2.0 * jnp.sum(wts * lg_const, axis=-1)
    else:
        dev_const = -2.0 * jnp.sum(lg_const, axis=-1)

    log_nf = jnp.log(nf)
    ridge_mat = jnp.diag(ridge.astype(dtype))

    def make_fns(data):
        """IRLS step closures over the per-gene `data` dict — reusable on
        a compacted (gathered) straggler subset."""
        # a 1-D nf is shared across genes: broadcast from the enclosing
        # scope (also correct for gathered straggler subsets) instead of
        # being gathered along the gene axis
        d_y = data["y"]
        d_nf = data.get("nf", nf)
        d_lognf = data.get("log_nf", log_nf)
        d_alpha, d_size, d_devc = data["alpha"], data["size"], data["dev_const"]
        d_wts = data.get("wts")

        def compute_mu(beta):
            return jnp.maximum(d_nf * jnp.exp(beta @ x.T), min_mu)

        def compute_w(mu):
            w = mu / (1.0 + d_alpha[:, None] * mu)
            if d_wts is not None:
                w = d_wts * w
            return w

        def deviance(mu):
            # -2*sum_s wts*[lg_const - size*log(size+mu) + y*log(mu/(size+mu))]
            sz = d_size[:, None]
            t = jnp.where(d_y > 0, d_y * (jnp.log(mu) - jnp.log(sz + mu)), 0.0)
            core = -sz * jnp.log(sz + mu) + t
            if d_wts is not None:
                core = d_wts * core
            return d_devc + (-2.0) * jnp.sum(core, axis=-1)

        def solve_beta(mu):
            w = compute_w(mu)
            z = jnp.log(mu) - d_lognf + (d_y - mu) / mu
            A = _xtwx(x, w) + ridge_mat[None]
            rhs = (w * z) @ x  # (G,p)
            return chol_solve(A, rhs[..., None])[..., 0]

        def body(state):
            t, beta, mu, dev_old, iters, active, dev = state
            iters = iters + active.astype(jnp.int32)
            beta_new = solve_beta(mu)
            diverged = jnp.any(jnp.abs(beta_new) > LARGE_BETA, axis=-1)
            # diverged rows keep the diverged beta but the previous mu,
            # and are stamped iter = maxit (cpp:357-359)
            take = active
            beta_prev = beta
            beta = jnp.where(take[:, None], beta_new, beta)
            cont = active & ~diverged
            mu_new = compute_mu(beta_new)
            mu = jnp.where(cont[:, None], mu_new, mu)
            dev_new = deviance(mu_new)
            dev = jnp.where(cont, dev_new, dev)
            conv_test = jnp.abs(dev_new - dev_old) / (jnp.abs(dev_new) + 0.1)
            bad = jnp.isnan(conv_test)
            converged = (t > 0) & (conv_test < tol)
            # f32 only: the deviance is a sum of S large lgamma terms, so
            # its rounding noise (~S terms x term-magnitude x eps) can
            # exceed the relative tol and the deviance test then never
            # fires.  The fit itself is still converged once beta stops
            # moving at f32 resolution — test that directly.  Disabled in
            # f64 where the reference's deviance test resolves fine.
            if jnp.finfo(dtype).eps > 1e-10:
                eps = jnp.finfo(dtype).eps
                dbeta = jnp.max(jnp.abs(beta_new - beta_prev), axis=-1)
                scale = 1.0 + jnp.max(jnp.abs(beta_new), axis=-1)
                converged = converged | ((t > 0) & (dbeta < 32.0 * eps * scale))
            iters = jnp.where(active & (diverged | (bad & ~diverged)), maxit,
                              iters)
            active = cont & ~bad & ~converged
            dev_old = jnp.where(cont, dev_new, dev_old)
            return t + 1, beta, mu, dev_old, iters, active, dev

        return compute_mu, compute_w, body

    data = dict(y=y, alpha=alpha, size=size, dev_const=dev_const)
    if nf.ndim == 2:
        data["nf"] = nf
        data["log_nf"] = log_nf
    if wts is not None:
        data["wts"] = wts
    compute_mu, compute_w, body = make_fns(data)
    mu0 = compute_mu(beta_init)

    # dtype-aware tolerance: the relative-deviance test cannot resolve
    # below ~machine epsilon; in f32 the reference's 1e-8 would only exit
    # on exact equality (wasting ~50 extra iterations per gene).  No-op
    # in f64 (30*eps = 6.7e-15 < any practical tol).
    tol = jnp.maximum(tol, 30.0 * jnp.finfo(dtype).eps)

    if maxit == 0:
        beta, mu = beta_init, mu0
        iters = jnp.zeros(G, dtype=jnp.int32)
        dev = jnp.zeros(G, dtype=dtype)
    else:
        from .padding import cascade_caps, cascade_while

        state = (jnp.array(0, dtype=jnp.int32), beta_init, mu0,
                 jnp.zeros(G, dtype=dtype), jnp.zeros(G, dtype=jnp.int32),
                 jnp.ones(G, dtype=bool), jnp.zeros(G, dtype=dtype))
        state = cascade_while(lambda d: make_fns(d)[2], lambda s: s[5],
                              data, state, maxit, cascade_caps(G))
        _, beta, mu, _, iters, _, dev = state

    # ---- post-fit quantities from the final (beta, mu) (cpp:429-455) ----
    w = compute_w(mu)
    XtWX = _xtwx(x, w)
    A = XtWX + ridge_mat[None]
    Ainv = spd_inverse(A)
    # hat_jj = w_j * x_j' A^-1 x_j
    xa = jnp.einsum("gpq,sq->gsp", Ainv, x)
    hat_diag = w * jnp.einsum("gsp,sp->gs", xa, x)
    sigma = Ainv @ XtWX @ Ainv
    beta_var = jnp.diagonal(sigma, axis1=-2, axis2=-1)
    if contrast is None:
        contrast_num = jnp.zeros(G, dtype=dtype)
        contrast_denom = jnp.zeros(G, dtype=dtype)
    else:
        c = contrast.astype(dtype)
        contrast_num = beta @ c
        contrast_denom = jnp.sqrt(jnp.einsum("p,gpq,q->g", c, sigma, c))

    return dict(beta=beta, beta_var=beta_var, iter=iters, hat_diag=hat_diag,
                deviance=dev, mu=mu, contrast_num=contrast_num,
                contrast_denom=contrast_denom)
