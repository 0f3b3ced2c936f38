"""Pallas TPU kernel: fused ridge-IRLS NB GLM solve (fitBeta contract).

The XLA path (`ops/irls.py:_fit_beta_core`) streams the (G,S) count and
normalization matrices from HBM on every IRLS sweep, and its per-gene
p x p solves go through XLA's batched Cholesky/TriangularSolve, which
lower poorly for tiny matrices on TPU.  This kernel keeps a gene block
VMEM-resident for the WHOLE solve (y/nf read from HBM once), runs the
p x p ridge solve as unrolled element-wise Cholesky on (BG,1) columns
(p = 2-8 is static), and exits per block as soon as all of its genes
converge.

Math and update/convergence rules are identical to ops/irls.py
(reference: src/DESeq2.cpp:282-465):

    mu    = nf * exp(X beta)           clamped at minmu  (cpp:324-327,361-364)
    W     = mu / (1 + alpha mu)                          (cpp:337-341)
    z     = log(mu/nf) + (y - mu)/mu                     (cpp:349,397)
    A     = X'WX + diag(ridge); beta <- A^-1 X'Wz        (cpp:397-398)
    dev   = -2 sum dnbinom_mu(y; 1/alpha, mu)            (cpp:365-373)
    stop when |dev - dev_old| / (|dev| + 0.1) < tol      (cpp:374-381)
    |beta| > 30 -> iter := maxit                         (cpp:357-359)

plus the f32-only beta-stall early exit from ops/irls.py.  Post-fit
quantities (hat diagonals cpp:437-450, sandwich sigma cpp:452, beta_var)
are computed in-kernel from the final (beta, mu).

lgamma for the mu-independent deviance constant is the Lanczos
approximation shared with ops/pallas_disp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_disp import _lgamma_pos
from .pallas_ls import _anchored_full, _chol_logdet_inv

__all__ = ["fit_beta_pallas", "pallas_irls_supported"]

_LANE = 128
LARGE_BETA = 30.0


def _chol_solve_cols(a_cols, rhs_cols, p):
    """Solve A x = rhs for (BG,1)-column SPD A (row-major p*p columns)."""
    L = [[None] * p for _ in range(p)]
    for i in range(p):
        for j in range(i + 1):
            s = a_cols[i * p + j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    # forward solve L w = rhs
    wv = [None] * p
    for i in range(p):
        s = rhs_cols[i]
        for k in range(i):
            s = s - L[i][k] * wv[k]
        wv[i] = s / L[i][i]
    # back solve L^T x = w
    xv = [None] * p
    for i in range(p - 1, -1, -1):
        s = wv[i]
        for k in range(i + 1, p):
            s = s - L[k][i] * xv[k]
        xv[i] = s / L[i][i]
    return xv


def _irls_kernel(y_ref, nf_ref, w_ref, alpha_ref, b0_ref, xx_ref, xT_ref,
                 xxT_ref, ridge_ref, scal_ref, beta_ref, bvar_ref,
                 dev_ref, it_ref, mu_ref, hat_ref, mu_scr, *, p, maxit,
                 nf_row, use_w):
    alpha = alpha_ref[:]              # (BG, 1)
    s_valid = scal_ref[0]
    tol = scal_ref[1]
    min_mu = scal_ref[2]

    BG, Sp = y_ref.shape
    dtype = y_ref.dtype
    n_valid = s_valid.astype(dtype)
    n_chunks = Sp // _LANE

    # The samples axis is consumed in lane-width chunks read straight
    # from the VMEM refs, so the elementwise-temporary footprint is
    # independent of S (same scheme as ops/pallas_ls.py).
    def chunks():
        for c in range(n_chunks):
            sl = slice(c * _LANE, (c + 1) * _LANE)
            col = jax.lax.broadcasted_iota(jnp.int32, (BG, _LANE), 1) \
                + c * _LANE
            fv = (col < s_valid.astype(jnp.int32)).astype(dtype)
            yield sl, fv

    def nf_chunk(sl):
        return nf_ref[0:1, sl] if nf_row else nf_ref[:, sl]

    def w_chunk(sl, fv):
        return fv * w_ref[:, sl] if use_w else fv

    size = 1.0 / alpha                # (BG,1)
    # mu-independent deviance part: -2 * sum_s w*[lgamma(y+sz)
    #   - lgamma(sz) - lgamma(y+1) + sz*log(sz)]; gene-constant terms
    # hoisted (unweighted: their per-sample weight is 1)
    dev_const = jnp.zeros_like(alpha)
    szl = size * jnp.log(size) - _lgamma_pos(size)
    if not use_w:
        dev_const = -2.0 * n_valid * szl
    for sl, fv in chunks():
        y = y_ref[:, sl]
        wv = w_chunk(sl, fv)
        terms = _lgamma_pos(y + size) - _lgamma_pos(y + 1.0)
        if use_w:
            terms = terms + szl
        dev_const = dev_const - 2.0 * jnp.sum(wv * terms,
                                              axis=1, keepdims=True)

    beta0 = [b0_ref[:, k:k + 1] for k in range(p)]
    ridge = [ridge_ref[k] for k in range(p)]

    def store_mu_and_dev(beta_cols, keep):
        """mu_scr[g,:] <- max(nf exp(X beta), minmu) where keep[g], and the
        deviance of the NEW mu (computed for every gene regardless of
        keep, matching the XLA path)."""
        dev = dev_const
        for sl, fv in chunks():
            y = y_ref[:, sl]
            xb = beta_cols[0] * xT_ref[0:1, sl]
            for k in range(1, p):
                xb = xb + beta_cols[k] * xT_ref[k:k + 1, sl]
            mu_new = jnp.maximum(nf_chunk(sl) * jnp.exp(xb), min_mu)
            t = jnp.where(y > 0.0,
                          y * (jnp.log(mu_new) - jnp.log(size + mu_new)),
                          0.0)
            dev = dev - 2.0 * jnp.sum(
                w_chunk(sl, fv) * (-size * jnp.log(size + mu_new) + t),
                axis=1, keepdims=True)
            mu_scr[:, sl] = jnp.where(keep, mu_new, mu_scr[:, sl])
        return dev

    # seed scratch mu from beta_init (keep=True everywhere)
    ones_keep = alpha > -1.0
    store_mu_and_dev(beta0, ones_keep)

    eps = jnp.finfo(dtype).eps
    tol = jnp.maximum(tol, 30.0 * eps)

    def weighted_normal_eqs():
        """(X'WX columns, X'Wz columns) accumulated over S-chunks."""
        a_flat = rhs = None
        for sl, fv in chunks():
            y = y_ref[:, sl]
            mu = mu_scr[:, sl]
            w = w_chunk(sl, fv) * mu / (1.0 + alpha * mu)
            z = jnp.log(mu) - jnp.log(nf_chunk(sl)) + (y - mu) / mu
            a_c = jnp.dot(w, xx_ref[sl, :], preferred_element_type=dtype)
            r_c = jnp.dot(w * z, xT_ref[:, sl].T,
                          preferred_element_type=dtype)
            a_flat = a_c if a_flat is None else a_flat + a_c   # (BG,p*p)
            rhs = r_c if rhs is None else rhs + r_c            # (BG,p)
        return a_flat, rhs

    zero = _anchored_full(dev_const, 0.0, dtype)
    # active mask carried as 0/1 float: Mosaic cannot legalize bool (i1)
    # vector carries in scf.while (scf.yield legalization failure)
    state = (jnp.asarray(0, jnp.int32), tuple(beta0), zero,
             _anchored_full(dev_const, 0, jnp.int32),
             _anchored_full(dev_const, 1.0, dtype), zero)

    def cond(state):
        t, activef = state[0], state[4]
        return (t < maxit) & (jnp.max(activef) > 0.5)

    def body(state):
        t, beta, dev_old, iters, activef, dev = state
        active = activef > 0.5
        iters = iters + active.astype(jnp.int32)
        a_flat, rhs = weighted_normal_eqs()
        a_cols = [a_flat[:, k:k + 1] for k in range(p * p)]
        for k in range(p):
            a_cols[k * p + k] = a_cols[k * p + k] + ridge[k]
        rhs_cols = [rhs[:, k:k + 1] for k in range(p)]
        beta_new = _chol_solve_cols(a_cols, rhs_cols, p)
        absmax = jnp.abs(beta_new[0])
        for k in range(1, p):
            absmax = jnp.maximum(absmax, jnp.abs(beta_new[k]))
        diverged = absmax > LARGE_BETA
        beta_out = tuple(jnp.where(active, bn, b)
                         for bn, b in zip(beta_new, beta))
        cont = active & ~diverged
        dev_new = store_mu_and_dev(beta_new, cont)
        dev = jnp.where(cont, dev_new, dev)
        conv_test = jnp.abs(dev_new - dev_old) / (jnp.abs(dev_new) + 0.1)
        bad = jnp.isnan(conv_test)
        converged = (t > 0) & (conv_test < tol)
        if eps > 1e-10:  # f32-only beta-stall exit (ops/irls.py rule)
            dbeta = jnp.abs(beta_new[0] - beta[0])
            bmax = jnp.abs(beta_new[0])
            for k in range(1, p):
                dbeta = jnp.maximum(dbeta, jnp.abs(beta_new[k] - beta[k]))
                bmax = jnp.maximum(bmax, jnp.abs(beta_new[k]))
            converged = converged | ((t > 0) & (dbeta < 32.0 * eps *
                                                (1.0 + bmax)))
        iters = jnp.where(active & (diverged | (bad & ~diverged)),
                          maxit, iters)
        activef = (cont & ~bad & ~converged).astype(activef.dtype)
        dev_old = jnp.where(cont, dev_new, dev_old)
        return (t + 1, beta_out, dev_old, iters, activef, dev)

    state = jax.lax.while_loop(cond, body, state)
    _, beta, _, iters, _, dev = state

    # ---- post-fit from final (beta, mu) (cpp:429-455) ----
    # pass 1: accumulate X'WX over chunks
    xtwx_flat = None
    for sl, fv in chunks():
        mu = mu_scr[:, sl]
        w = w_chunk(sl, fv) * mu / (1.0 + alpha * mu)
        c = jnp.dot(w, xx_ref[sl, :], preferred_element_type=dtype)
        xtwx_flat = c if xtwx_flat is None else xtwx_flat + c
    a_cols = [xtwx_flat[:, k:k + 1] for k in range(p * p)]
    for k in range(p):
        a_cols[k * p + k] = a_cols[k * p + k] + ridge[k]
    _, ainv = _chol_logdet_inv(a_cols, p)
    # sigma = Ainv XtWX Ainv (unrolled p x p products on columns)
    xtwx_cols = [xtwx_flat[:, k:k + 1] for k in range(p * p)]
    tmp = [None] * (p * p)  # Ainv @ XtWX
    for i in range(p):
        for j in range(p):
            s = 0.0
            for k in range(p):
                s = s + ainv[i * p + k] * xtwx_cols[k * p + j]
            tmp[i * p + j] = s
    for k in range(p):
        s = 0.0
        for m in range(p):
            s = s + tmp[k * p + m] * ainv[m * p + k]
        bvar_ref[:, k:k + 1] = s
        beta_ref[:, k:k + 1] = beta[k]
    # pass 2: hat_jj = w_j * x_j' Ainv x_j = w * sum_kl Ainv_kl (x_k x_l)_j
    for sl, fv in chunks():
        mu = mu_scr[:, sl]
        w = mu / (1.0 + alpha * mu)
        if use_w:
            w = w_ref[:, sl] * w
        q = ainv[0] * xxT_ref[0:1, sl]
        for k in range(1, p * p):
            q = q + ainv[k] * xxT_ref[k:k + 1, sl]
        hat_ref[:, sl] = w * q
        mu_ref[:, sl] = mu
    dev_ref[:] = dev
    it_ref[:] = iters


_MAX_CHUNKS = 16  # unrolled S-chunks per sweep: caps compile size


def pallas_irls_supported(S, p, dtype, use_weights=False,
                          vmem_budget=12 * 1024 * 1024):
    """Whether the Pallas IRLS kernel applies to this problem shape.
    Observation weights stream as one more (bg, Sp) VMEM block
    (src/DESeq2.cpp:337-341: weights multiply W and the deviance)."""
    # p == 1 (intercept-only designs, e.g. blind transforms) hits a
    # Mosaic multi_reduction limitation ("only constant accumulators
    # supported"); the XLA path handles that shape
    if p < 2 or p > 8 or dtype == jnp.float64:
        return False
    Sp = -(-S // _LANE) * _LANE
    if Sp // _LANE > _MAX_CHUNKS:
        return False
    return _block_g(Sp, jnp.dtype(dtype).itemsize, vmem_budget,
                    use_weights) >= 64


def _block_g(Sp, itemsize, vmem_budget=12 * 1024 * 1024,
             use_weights=False):
    """Largest power-of-two gene block fitting scoped VMEM.

    Per-gene bytes ~ 50 lane-width elementwise temporaries (live per
    S-chunk only) + double-buffered y input and mu/hat output blocks
    (3 arrays x 2) + the resident mu scratch + slack for nf (+ the
    double-buffered weights block when streaming weights)."""
    per_gene = ((70 * _LANE + 9 * Sp) + (2 * Sp if use_weights else 0)) \
        * itemsize
    bg = 512
    while bg >= 64 and bg * per_gene > vmem_budget:
        bg //= 2
    return bg


@functools.partial(jax.jit, static_argnames=("maxit", "interpret"))
def fit_beta_pallas(y, x, nf, alpha, beta_init, ridge, tol=1e-8, maxit=100,
                    min_mu=0.5, interpret=False, weights=None):
    """Batched fitBeta as a single fused Pallas kernel.

    Same contract as ops/irls.py:_fit_beta_core minus contrast support
    (the fused pipeline's default path never passes one): returns
    dict(beta, beta_var, iter, hat_diag, deviance, mu).

    nf may be (G,S) or (S,) — a shared per-sample normalization row
    (the common size-factors-only case) skips one (G,S) HBM stream.
    `weights`: optional (G,S) observation weights (max-1 normalized by
    the caller) multiplying W, the deviance and the hat diagonals
    (src/DESeq2.cpp:337-341).
    """
    G, S = y.shape
    p = x.shape[1]
    dtype = beta_init.dtype
    y = y.astype(dtype)
    x = x.astype(dtype)
    nf_row = nf.ndim == 1
    use_w = weights is not None

    Sp = -(-S // _LANE) * _LANE
    bg = _block_g(Sp, jnp.dtype(dtype).itemsize, use_weights=use_w)
    Gp = -(-G // bg) * bg
    y_p = jnp.pad(y, ((0, Gp - G), (0, Sp - S)))
    if nf_row:
        nf_p = jnp.pad(nf.astype(dtype)[None, :], ((0, 0), (0, Sp - S)),
                       constant_values=1.0)
    else:
        nf_p = jnp.pad(nf.astype(dtype), ((0, Gp - G), (0, Sp - S)),
                       constant_values=1.0)
    alpha_p = jnp.pad(alpha.astype(dtype)[:, None], ((0, Gp - G), (0, 0)),
                      constant_values=1.0)
    b0_p = jnp.pad(beta_init.astype(dtype), ((0, Gp - G), (0, 0)))
    xx = (x[:, :, None] * x[:, None, :]).reshape(S, p * p)
    xx_p = jnp.pad(xx, ((0, Sp - S), (0, 0)))
    xT_p = jnp.pad(x.T, ((0, 0), (0, Sp - S)))
    xxT_p = xx_p.T

    if use_w:
        w_p = jnp.pad(weights.astype(dtype), ((0, Gp - G), (0, Sp - S)),
                      constant_values=1.0)
    else:
        # unused dummy: a (1, Sp) row keeps the operand list static
        w_p = jnp.ones((1, Sp), dtype)
    scal = jnp.stack([jnp.asarray(S, dtype), jnp.asarray(tol, dtype),
                      jnp.asarray(min_mu, dtype)])
    ridge_v = ridge.astype(dtype)

    kernel = functools.partial(_irls_kernel, p=p, maxit=maxit,
                               nf_row=nf_row, use_w=use_w)
    nf_spec = (pl.BlockSpec((1, Sp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM) if nf_row else
               pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM))
    w_spec = (pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM) if use_w else
              pl.BlockSpec((1, Sp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM))
    beta_o, bvar_o, dev_o, it_o, mu_o, hat_o = pl.pallas_call(
        kernel,
        grid=(Gp // bg,),
        in_specs=[
            pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            nf_spec,
            w_spec,
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, p * p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, Sp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p * p, Sp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Gp, p), dtype),
            jax.ShapeDtypeStruct((Gp, p), dtype),
            jax.ShapeDtypeStruct((Gp, 1), dtype),
            jax.ShapeDtypeStruct((Gp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Gp, Sp), dtype),
            jax.ShapeDtypeStruct((Gp, Sp), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bg, Sp), dtype)],
        interpret=interpret,
    )(y_p, nf_p, w_p, alpha_p, b0_p, xx_p, xT_p, xxT_p, ridge_v, scal)
    return dict(beta=beta_o[:G], beta_var=bvar_o[:G],
                deviance=dev_o[:G, 0], iter=it_o[:G, 0],
                mu=mu_o[:G, :S], hat_diag=hat_o[:G, :S])
