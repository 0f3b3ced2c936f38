"""Pallas TPU kernel: fused dispersion line search (fitDisp contract).

The XLA path (`ops/disp.py:_fit_disp_line_search_core`) iterates the
Armijo backtracking ascent with the whole (G,S) count/mean matrices
streamed from HBM on every trip — at 60k x 1k that is ~0.5 GB of reads
per iteration, repeated 10-100 times.  This kernel tiles the genes axis
into VMEM-resident blocks and runs the COMPLETE line search while the
block stays on-chip: y and mu are read from HBM exactly once per gene,
and each block exits its while-loop as soon as all of ITS genes have
converged (block-level early exit replaces the XLA path's cascading
straggler compaction).

Per iteration the log-posterior and its derivative are evaluated in ONE
fused pass at the proposed point: the reference evaluates lp(a_new) for
the Armijo test and then, on acceptance, dlp at the updated point — the
same point a_new — so lp and dlp share alpha, w = 1/(1/mu+alpha), the
Cox-Reid b-matrices, and the log/log1p terms (reference math:
src/DESeq2.cpp:31-107; acceptance rules cpp:202-258).

Transcendentals not native to Mosaic are implemented here:
- lgamma: Lanczos(g=7) (shared with ops/pallas_disp.py);
- digamma: 8 unrolled recurrence shifts (psi(z) = psi(z+1) - 1/z) onto
  z >= 8, then the Stirling asymptotic series through z^-8 (|err| <
  8e-12 at z=8).  z = 1/alpha or y + 1/alpha is always > 0, and
  log(alpha) <= 10 bounds 1/alpha >= 4.5e-5, so eight shifts always
  reach the asymptotic regime.

Used by the fused pipeline on TPU (f32); the XLA path remains the
reference-parity (f64) implementation and the fallback for shapes that
don't fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_disp import _lgamma_diff_centered, _lgamma_pos

__all__ = ["fit_disp_line_search_pallas", "pallas_ls_supported",
           "digamma_pos"]

_LANE = 128
EPSILON_ARMIJO = 1.0e-4  # cpp:175


def _anchored_full(anchor, value, dtype):
    """Constant array with a concrete (non-replicated) Mosaic layout.

    jnp.zeros/jnp.full produce lane-replicated vectors; using those as
    while-loop carry inits trips "Invalid relayout: ... replicated in
    destination but not in source" when the body computes a concrete
    layout.  Deriving the constant from runtime data (`anchor`, any
    finite float column) pins the layout and cannot be constant-folded.
    """
    z = anchor * 0.0
    if dtype == jnp.bool_:
        return (z + (1.0 if value else 0.0)) > 0.5
    return (z + value).astype(dtype)


def digamma_pos(z):
    """digamma(z) for z > 0: recurrence shifts + Stirling series (VPU ops)."""
    acc = jnp.zeros_like(z)
    for _ in range(8):
        small = z < 8.0
        acc = acc - jnp.where(small, 1.0 / z, 0.0)
        z = jnp.where(small, z + 1.0, z)
    inv = 1.0 / z
    inv2 = inv * inv
    # psi(z) ~ ln z - 1/(2z) - 1/(12 z^2) + 1/(120 z^4) - 1/(252 z^6)
    #          + 1/(240 z^8); truncation error ~ 1/(132 z^10) < 8e-12 at z=8
    series = (jnp.log(z) - 0.5 * inv
              - inv2 * (1.0 / 12.0
                        - inv2 * (1.0 / 120.0
                                  - inv2 * (1.0 / 252.0 - inv2 / 240.0))))
    return acc + series


def _digamma_diff(y, c):
    """digamma(y+c) - digamma(c) with the large-c series branch
    (mirror of ops/nb.py:digamma_diff; see _lgamma_diff_centered)."""
    direct = digamma_pos(y + c) - digamma_pos(c)
    s1 = y * (y - 1.0) / 2.0
    s2 = (y - 1.0) * y * (2.0 * y - 1.0) / 6.0
    s3 = s1 * s1
    s4 = s2 * (3.0 * y * y - 3.0 * y - 1.0) / 5.0
    ci = 1.0 / c
    series = ci * (y - ci * (s1 - ci * (s2 - ci * (s3 - ci * s4))))
    return jnp.where(c > 16.0 * jnp.maximum(y, 1.0), series, direct)


def _chol_logdet_inv(b_cols, p):
    """(logdet, inverse columns) of (BG,1)-column SPD matrices, unrolled.

    b_cols: row-major list of p*p columns.  Returns (logdet (BG,1),
    binv_cols row-major list).  p is static and small (2-8)."""
    L = [[None] * p for _ in range(p)]
    logdet = 0.0
    for i in range(p):
        for j in range(i + 1):
            s = b_cols[i * p + j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                diag = jnp.sqrt(jnp.maximum(s, 1e-30))
                L[i][j] = diag
                logdet = logdet + 2.0 * jnp.log(diag)
            else:
                L[i][j] = s / L[j][j]
    # invert L (lower triangular), then binv = L^-T L^-1
    Li = [[None] * p for _ in range(p)]
    for i in range(p):
        Li[i][i] = 1.0 / L[i][i]
        for j in range(i - 1, -1, -1):
            s = 0.0
            for k in range(j, i):
                s = s + L[i][k] * Li[k][j]
            Li[i][j] = -s * Li[i][i]
    binv = [None] * (p * p)
    for i in range(p):
        for j in range(i + 1):
            s = 0.0
            for k in range(max(i, j), p):
                s = s + Li[k][i] * Li[k][j]
            binv[i * p + j] = s
            binv[j * p + i] = s
    return logdet, binv


def _ls_kernel(y_ref, mu_ref, w_ref, xx_ref, la0_ref, pm_ref, scal_ref,
               outf_ref, outi_ref, *, p, maxit, use_prior, use_cr,
               use_w):
    a0 = la0_ref[:]         # (BG, 1)
    pm = pm_ref[:]          # (BG, 1)
    s_valid = scal_ref[0]
    prior_var = scal_ref[1]
    kappa_0 = scal_ref[2]
    tol = scal_ref[3]
    min_la = scal_ref[4]
    w_thr = scal_ref[5]

    BG, Sp = y_ref.shape
    dtype = y_ref.dtype
    n_valid = s_valid.astype(dtype)
    n_chunks = Sp // _LANE

    # weighted Cox-Reid masks (make_cr_masks, ops/disp.py:37-52):
    # rows with weight <= threshold leave the CR term; columns with no
    # selected support drop out via an identity diagonal.  Computed
    # once per block from the fixed weights.
    cm = None
    if use_w and use_cr:
        col_acc = [None] * p
        for c in range(n_chunks):
            sl = slice(c * _LANE, (c + 1) * _LANE)
            col = jax.lax.broadcasted_iota(jnp.int32, (BG, _LANE), 1) \
                + c * _LANE
            fv = (col < s_valid.astype(jnp.int32)).astype(dtype)
            rm = fv * (w_ref[:, sl] > w_thr).astype(dtype)
            for k in range(p):
                # |x_k| support under the selected rows; xx diag column
                # k*p+k is x_k^2 >= 0 with the same support as |x_k|
                acc = jnp.sum(rm * xx_ref[sl, k * p + k][None, :],
                              axis=1, keepdims=True)
                col_acc[k] = acc if col_acc[k] is None \
                    else col_acc[k] + acc
        cm = [(a > 0.0).astype(dtype) for a in col_acc]

    def lp_dlp(la):
        """Fused log-posterior + derivative at la ((BG,1) -> two (BG,1)).

        The samples axis is consumed in lane-width chunks read straight
        from the VMEM refs: the ~45 elementwise temporaries (Lanczos
        lgamma, digamma recurrence, logs) are live per chunk only, so the
        kernel's scoped-VMEM footprint is independent of S.
        """
        alpha = jnp.exp(la)
        inv_a = 1.0 / alpha
        # stable difference form (see ops/nb.py): identical values to
        # cpp:52-56,93-97 with the gene-constant -lgamma(c)/+digamma(c)
        # terms regrouped into per-sample differences — no catastrophic
        # f32 cancellation at c = 1/alpha >> y
        ll = s1 = None
        b = db = None
        for c in range(n_chunks):
            sl = slice(c * _LANE, (c + 1) * _LANE)
            y = y_ref[:, sl]                     # (BG, LANE)
            mu = mu_ref[:, sl]
            col = jax.lax.broadcasted_iota(jnp.int32, (BG, _LANE), 1) \
                + c * _LANE
            fvalid = (col < s_valid.astype(jnp.int32)).astype(dtype)
            wts = fvalid * w_ref[:, sl] if use_w else fvalid
            mu_inv_a = mu + inv_a
            mua = mu * alpha
            log1p_mua = jnp.log1p(mua)
            ll_c = jnp.sum(
                wts * (_lgamma_diff_centered(y, inv_a)
                       - (y + inv_a) * log1p_mua),
                axis=1, keepdims=True)
            ll = ll_c if ll is None else ll + ll_c
            s1_c = jnp.sum(
                wts * (log1p_mua - mua / (1.0 + mua)
                       + y / mu_inv_a - _digamma_diff(y, inv_a)),
                axis=1, keepdims=True)
            s1 = s1_c if s1 is None else s1 + s1_c
            if use_cr:
                w = 1.0 / (1.0 / mu + alpha)   # padded cols: xx row is 0
                if use_w:
                    # the reference SUBSETS CR rows (weight > threshold)
                    # rather than weighting them (cpp:38-44)
                    w = w * (w_ref[:, sl] > w_thr).astype(dtype) * fvalid
                xx_c = xx_ref[sl, :]
                b_c = jnp.dot(w, xx_c, preferred_element_type=dtype)
                db_c = jnp.dot(-w * w, xx_c, preferred_element_type=dtype)
                b = b_c if b is None else b + b_c            # (BG,p*p)
                db = db_c if db is None else db + db_c
        lp = ll
        dlp = s1 / (alpha * alpha)
        if use_cr:
            b_cols = [b[:, k:k + 1] for k in range(p * p)]
            db_cols = [db[:, k:k + 1] for k in range(p * p)]
            if cm is not None:
                # column-mask the CR matrices (identity-embed dropped
                # columns of b so the kept submatrix's logdet survives;
                # db dropped rows/cols are 0 — _cr_b_matrices)
                for i in range(p):
                    for j in range(p):
                        m = cm[i] * cm[j]
                        b_cols[i * p + j] = b_cols[i * p + j] * m
                        db_cols[i * p + j] = db_cols[i * p + j] * m
                    b_cols[i * p + i] = b_cols[i * p + i] + (1.0 - cm[i])
            logdet, binv = _chol_logdet_inv(b_cols, p)
            lp = lp - 0.5 * logdet
            tr = 0.0
            for k in range(p * p):  # b, db symmetric: tr(b^-1 db)
                tr = tr + binv[k] * db_cols[k]
            dlp = dlp - 0.5 * tr
        dlp = dlp * alpha
        if use_prior:
            lp = lp - 0.5 * (la - pm) ** 2 / prior_var
            dlp = dlp - (la - pm) / prior_var
        return lp, dlp

    lp0, dlp0 = lp_dlp(a0)
    eps32 = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    tol_eff = jnp.maximum(tol, jnp.abs(lp0) * 50.0 * eps32)

    zero_i = _anchored_full(lp0, 0, jnp.int32)
    # done mask carried as 0/1 float: Mosaic cannot legalize bool (i1)
    # vector carries in scf.while (scf.yield legalization failure)
    state = (jnp.asarray(0, jnp.int32), a0,
             _anchored_full(lp0, 0.0, dtype) + kappa_0,
             lp0, dlp0, zero_i, zero_i,
             _anchored_full(lp0, -1.0, dtype),
             _anchored_full(lp0, 0.0, dtype))

    def cond(state):
        t, donef = state[0], state[8]
        return (t < maxit) & (jnp.max(1.0 - donef) > 0.5)

    def body(state):
        (t, a, kappa, lp, dlp, iters, iter_accept, change, donef) = state
        done = donef > 0.5
        live = ~done
        iters = iters + live.astype(jnp.int32)
        a_propose = a + kappa * dlp
        # step clamps so log alpha stays in [-30, 10] (cpp:216-224)
        kappa = jnp.where(a_propose < -30.0, (-30.0 - a) / dlp, kappa)
        kappa = jnp.where(a_propose > 10.0, (10.0 - a) / dlp, kappa)
        a_new = a + kappa * dlp
        lp_new, dlp_next = lp_dlp(a_new)
        accept = -lp_new <= -lp - kappa * EPSILON_ARMIJO * dlp * dlp
        upd = live & accept
        iter_accept = iter_accept + upd.astype(jnp.int32)
        change_new = lp_new - lp
        conv = change_new < tol_eff
        under = a_new < min_la
        a = jnp.where(upd, a_new, a)
        change = jnp.where(upd, change_new, change)
        lp = jnp.where(upd & (conv | ~under), lp_new, lp)
        # f32 only: rejected step whose best-case improvement is below
        # rounding noise can never be accepted -> converged (same rule
        # and gating as ops/disp.py:_ls_body_factory)
        if jnp.finfo(dtype).eps > 1e-10:
            stalled = live & ~accept & (kappa * dlp * dlp < tol_eff)
        else:
            stalled = jnp.zeros_like(live)
        newly_done = (upd & (conv | under)) | stalled
        cont_accept = upd & ~conv & ~under
        # dlp_next was evaluated at a_new == updated a for accepted genes
        dlp = jnp.where(cont_accept, dlp_next, dlp)
        kap_acc = jnp.minimum(kappa * 1.1, kappa_0)
        kap_acc = jnp.where(iter_accept % 5 == 0, kap_acc / 2.0, kap_acc)
        kappa = jnp.where(cont_accept, kap_acc,
                          jnp.where(live & ~accept, kappa / 2.0, kappa))
        donef = jnp.maximum(donef, newly_done.astype(donef.dtype))
        return (t + 1, a, kappa, lp, dlp, iters, iter_accept, change, donef)

    state = jax.lax.while_loop(cond, body, state)
    (_, a, _, lp, dlp, iters, iter_accept, change, _) = state

    outf_ref[:, 0:1] = a
    outf_ref[:, 1:2] = lp0
    outf_ref[:, 2:3] = dlp0
    outf_ref[:, 3:4] = lp
    outf_ref[:, 4:5] = dlp
    outf_ref[:, 5:6] = change
    outi_ref[:, 0:1] = iters
    outi_ref[:, 1:2] = iter_accept


_MAX_CHUNKS = 16  # unrolled S-chunks per lp/dlp eval: caps compile size


def pallas_ls_supported(S, p, dtype, use_weights=False,
                        vmem_budget=12 * 1024 * 1024):
    """Whether the Pallas line-search kernel applies to this shape.
    Observation weights stream as one more (bg, Sp) VMEM block (the
    weighted Cox-Reid row subset + column drops run masked in-kernel,
    cpp:38-44)."""
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

    Per-gene bytes ~ 70 lane-width elementwise temporaries (live per
    S-chunk only; measured ~64 on v5e) + double-buffered y/mu input
    blocks (2 arrays x 2) (+ the weights block when streaming)."""
    per_gene = ((70 * _LANE + 4 * Sp)
                + (2 * Sp if use_weights else 0)) * itemsize
    bg = 1024
    while bg >= 64 and bg * per_gene > vmem_budget:
        bg //= 2
    return bg


@functools.partial(jax.jit, static_argnames=(
    "maxit", "use_prior", "use_cr", "interpret"))
def fit_disp_line_search_pallas(y, x, mu, log_alpha_init, prior_mean,
                                prior_var, min_log_alpha, kappa_0=1.0,
                                tol=1e-6, maxit=100, use_prior=False,
                                use_cr=True, interpret=False,
                                weights=None, weight_threshold=1e-2):
    """Batched fitDisp as a single fused Pallas kernel.

    Same contract as ops/disp.py:_fit_disp_line_search_core (minus the
    d2lp output, which the fused pipeline does not consume): returns
    dict(log_alpha, iter, iter_accept, last_change, initial_lp,
    initial_dlp, last_lp, last_dlp).
    """
    G, S = y.shape
    p = x.shape[1]
    dtype = mu.dtype
    y = y.astype(dtype)
    x = x.astype(dtype)
    use_w = weights is not None

    Sp = -(-S // _LANE) * _LANE
    bg = _block_g(Sp, jnp.dtype(dtype).itemsize, use_weights=use_w)
    Gp = -(-G // bg) * bg
    # padded genes: y=1, mu=1 converge instantly and stay finite
    y_p = jnp.pad(y, ((0, Gp - G), (0, Sp - S)), constant_values=0.0)
    mu_p = jnp.pad(mu, ((0, Gp - G), (0, Sp - S)), constant_values=1.0)
    if Gp > G:
        y_p = y_p.at[G:, :].set(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (Gp - G, Sp), 1) < S, 1.0,
            0.0))
    la0_p = jnp.pad(log_alpha_init.astype(dtype)[:, None],
                    ((0, Gp - G), (0, 0)))
    pm_p = jnp.pad(prior_mean.astype(dtype)[:, None], ((0, Gp - G), (0, 0)))
    xx = (x[:, :, None] * x[:, None, :]).reshape(S, p * p)
    xx_p = jnp.pad(xx, ((0, Sp - S), (0, 0)))

    if use_w:
        w_p = jnp.pad(weights.astype(dtype), ((0, Gp - G), (0, Sp - S)),
                      constant_values=1.0)
    else:
        w_p = jnp.ones((1, Sp), dtype)   # dummy replicated row
    scal = jnp.stack([jnp.asarray(S, dtype),
                      jnp.asarray(prior_var, dtype),
                      jnp.asarray(kappa_0, dtype),
                      jnp.asarray(tol, dtype),
                      jnp.asarray(min_log_alpha, dtype),
                      jnp.asarray(weight_threshold, dtype)])

    kernel = functools.partial(_ls_kernel, p=p, maxit=maxit,
                               use_prior=use_prior, use_cr=use_cr,
                               use_w=use_w)
    w_spec = (pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                           memory_space=pltpu.VMEM) if use_w else
              pl.BlockSpec((1, Sp), lambda i: (0, 0),
                           memory_space=pltpu.VMEM))
    outf, outi = pl.pallas_call(
        kernel,
        grid=(Gp // bg,),
        in_specs=[
            pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((Sp, p * p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((bg, 6), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bg, 2), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Gp, 6), dtype),
                   jax.ShapeDtypeStruct((Gp, 2), jnp.int32)),
        interpret=interpret,
    )(y_p, mu_p, w_p, xx_p, la0_p, pm_p, scal)
    return dict(log_alpha=outf[:G, 0], initial_lp=outf[:G, 1],
                initial_dlp=outf[:G, 2], last_lp=outf[:G, 3],
                last_dlp=outf[:G, 4], last_change=outf[:G, 5],
                iter=outi[:G, 0], iter_accept=outi[:G, 1])
