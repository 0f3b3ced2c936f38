"""Pallas TPU kernel: fused two-stage dispersion grid search.

The XLA path (`ops/disp.py:_fit_disp_grid_core`) evaluates the NB
Cox-Reid log-posterior at 2 x 20 grid points as a `lax.scan`, so each
evaluation re-reads the (G,S) count/mean matrices from HBM — 40 full
passes of bandwidth for what is arithmetically one pass of data.  This
kernel tiles the genes axis into VMEM-resident blocks and evaluates the
complete two-stage search (coarse shared grid -> per-gene argmax -> fine
per-gene grid -> argmax; reference src/DESeq2.cpp:468-513) while the
block stays on-chip: y and mu are read from HBM exactly once.

Design notes (see /opt/skills/guides/pallas_guide.md):
- the Cox-Reid term needs b = X' W(alpha) X per gene per grid point; we
  precompute the design outer-products xx = (x_s x_s')_flat (S, p*p) on
  the host so b is one (BG,S)x(S,p*p) MXU matmul per evaluation, and the
  log-det of the p x p system is an unrolled Cholesky on (BG,1) column
  slices (p is 2-10 — static).
- lgamma is not a Mosaic primitive, so it is implemented here with a
  Lanczos(g=7) approximation — pure VPU element-wise ops.  z is always
  positive (z = 1/alpha or y + 1/alpha) so no reflection is needed.
- the samples axis is padded to a lane multiple; padded columns carry
  (y=0, mu=1) and zeroed xx rows, and the log-likelihood terms are
  masked with a broadcasted-iota column test, so padding is exact.

Used by the fused pipeline's grid fallback on TPU (f32); the XLA path
remains the reference-parity (f64) implementation and the fallback for
shapes that don't fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fit_disp_grid_pallas", "pallas_grid_supported"]

_LANE = 128
_HALF_LOG_2PI = 0.9189385332046727

# Lanczos g=7, n=9 coefficients (Boost/GSL standard set)
_LANCZOS_G = 7.0
_LANCZOS_C = (
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)


def _lgamma_pos(z):
    """log Gamma(z) for z > 0 via Lanczos — element-wise VPU ops only.

    |rel err| ~ 1e-7 in f64; in f32 limited by arithmetic rounding, which
    matches the accuracy of the XLA f32 lgamma this kernel replaces.
    """
    zm1 = z - 1.0
    x = jnp.full_like(z, _LANCZOS_C[0])
    for i, c in enumerate(_LANCZOS_C[1:], start=1):
        x = x + c / (zm1 + i)
    t = zm1 + _LANCZOS_G + 0.5
    return _HALF_LOG_2PI + (zm1 + 0.5) * jnp.log(t) - t + jnp.log(x)


def _lgamma_diff_centered(y, c):
    """lgamma(y+c) - lgamma(c) - y*log(c) with the large-c series branch
    (elementwise VPU ops; mirror of ops/nb.py:lgamma_diff_centered).

    The direct form cancels catastrophically in f32 once c >> y — the
    exact failure that let the dispersion search race to the min-alpha
    clamp; the 4-term series of sum_{j<y} log(1+j/c) is exact to below
    f32 noise past the c > 16*y crossover."""
    direct = _lgamma_pos(y + c) - _lgamma_pos(c) - y * jnp.log(c)
    s1 = y * (y - 1.0) / 2.0
    s2 = (y - 1.0) * y * (2.0 * y - 1.0) / 6.0
    s3 = s1 * s1
    s4 = s2 * (3.0 * y * y - 3.0 * y - 1.0) / 5.0
    ci = 1.0 / c
    series = ci * (s1 - ci * (s2 / 2.0 - ci * (s3 / 3.0 - ci * s4 / 4.0)))
    return jnp.where(c > 16.0 * jnp.maximum(y, 1.0), series, direct)


def _chol_logdet_cols(b_cols, p):
    """log det of (BG, p, p) SPD matrices given as p*p column slices.

    b_cols: list of p*p arrays of shape (BG, 1), row-major.  Unrolled
    Cholesky — p is static and small, so this is p(p+1)/2 element-wise
    vector ops, no batched linalg needed.
    """
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
    return logdet  # (BG, 1)


def _grid_kernel(y_ref, mu_ref, xx_ref, grid_ref, frac_ref, pm_ref,
                 scal_ref, out_ref, *, p, grid_n, use_prior, use_cr):
    pm = pm_ref[:]          # (BG, 1) prior mean (log alpha)
    s_valid = scal_ref[0]   # number of real samples
    prior_var = scal_ref[1]
    delta = scal_ref[2]     # coarse grid step

    BG, Sp = y_ref.shape
    dtype = y_ref.dtype
    n_valid = s_valid.astype(dtype)
    n_chunks = Sp // _LANE

    def log_posterior(la):
        """la: (BG,1) log alpha -> (BG,1) log posterior.

        The samples axis is consumed in lane-width chunks read straight
        from the VMEM refs so the Lanczos-lgamma temporaries are live
        per chunk only — scoped-VMEM footprint independent of S (same
        scheme as ops/pallas_ls.py)."""
        alpha = jnp.exp(la)
        inv_a = 1.0 / alpha
        # stable difference form: [lgamma(y+c)-lgamma(c)-y*log(c)]
        # - (y+c)*log1p(mu*alpha), identical value to cpp:52-56 (the
        # per-sample -lgamma(c) and y*log(c) regrouped exactly)
        ll = None
        b = None
        for c in range(n_chunks):
            sl = slice(c * _LANE, (c + 1) * _LANE)
            y = y_ref[:, sl]
            mu = mu_ref[:, sl]
            col = jax.lax.broadcasted_iota(jnp.int32, (BG, _LANE), 1) \
                + c * _LANE
            fvalid = (col < s_valid.astype(jnp.int32)).astype(dtype)
            ll_c = jnp.sum(
                fvalid * (_lgamma_diff_centered(y, inv_a)
                          - (y + inv_a) * jnp.log1p(mu * alpha)),
                axis=1, keepdims=True)
            ll = ll_c if ll is None else ll + ll_c
            if use_cr:
                w = 1.0 / (1.0 / mu + alpha)   # padded cols: xx row is 0
                b_c = jnp.dot(w, xx_ref[sl, :],
                              preferred_element_type=dtype)
                b = b_c if b is None else b + b_c       # (BG, p*p)
        if use_cr:
            b_cols = [b[:, k:k + 1] for k in range(p * p)]
            ll = ll - 0.5 * _chol_logdet_cols(b_cols, p)
        if use_prior:
            ll = ll - 0.5 * (la - pm) ** 2 / prior_var
        return ll

    neg_inf = jnp.full((BG, 1), -jnp.inf, dtype=dtype)
    zero = jnp.zeros((BG, 1), dtype=dtype)

    def argmax_scan(a_of_j):
        # fori_loop, not an unrolled Python loop: the grid evaluations
        # are independent, and unrolled they interleave in the schedule
        # so every evaluation's chunk temporaries are live at once —
        # scoped-VMEM OOM at wide S.  The loop sequences them.
        def body(j, carry):
            best_lp, best_a = carry
            a_j = a_of_j(j)
            lp = log_posterior(a_j)
            better = lp > best_lp          # strict: first max wins
            best_lp = jnp.where(better, lp, best_lp)
            best_a = jnp.where(better, a_j, best_a)
            return best_lp, best_a

        _, best_a = jax.lax.fori_loop(0, grid_n, body, (neg_inf, zero))
        return best_a

    ones = jnp.ones((BG, 1), dtype=dtype)
    a_hat = argmax_scan(lambda j: grid_ref[j] * ones)
    # fine stage: grid_n points spanning a_hat +- delta (cpp:496-509)
    a_fine = argmax_scan(lambda j: a_hat - delta + 2.0 * delta * frac_ref[j])
    out_ref[:] = a_fine


_MAX_CHUNKS = 16  # unrolled S-chunks per evaluation: caps compile size


def pallas_grid_supported(S, p, dtype, use_weights=False,
                          vmem_budget=12 * 1024 * 1024, block_g=256):
    """Whether the Pallas grid kernel applies to this problem shape."""
    # p == 1: see pallas_ls_supported (Mosaic accumulator limitation)
    if use_weights or p < 2 or p > 8 or dtype == jnp.float64:
        return False
    Sp = -(-S // _LANE) * _LANE
    if Sp // _LANE > _MAX_CHUNKS:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # ~30 lane-width elementwise temporaries (live per S-chunk only)
    # + double-buffered y/mu input blocks (2 arrays x 2)
    return block_g * (30 * _LANE + 4 * Sp) * itemsize < vmem_budget


@functools.partial(jax.jit, static_argnames=(
    "use_prior", "use_cr", "grid_n", "block_g", "interpret"))
def fit_disp_grid_pallas(y, x, mu, disp_grid, prior_mean, prior_var,
                         use_prior=False, use_cr=True, grid_n=20,
                         block_g=256, interpret=False):
    """Two-stage grid search, Pallas TPU kernel (fitDispGrid contract).

    y, mu: (G, S); x: (S, p); disp_grid: (grid_n,) shared log-alpha grid;
    prior_mean: (G,).  Returns (G,) log alpha.  Matches
    ops/disp.py:_fit_disp_grid_core (same math, same first-max
    tie-breaking); f32 results differ only by lgamma rounding.
    """
    G, S = y.shape
    p = x.shape[1]
    dtype = mu.dtype
    y = y.astype(dtype)
    x = x.astype(dtype)

    Sp = -(-S // _LANE) * _LANE
    Gp = -(-G // block_g) * block_g
    y_p = jnp.pad(y, ((0, Gp - G), (0, Sp - S)))
    mu_p = jnp.pad(mu, ((0, Gp - G), (0, Sp - S)), constant_values=1.0)
    pm_p = jnp.pad(prior_mean.astype(dtype)[:, None], ((0, Gp - G), (0, 0)))
    xx = (x[:, :, None] * x[:, None, :]).reshape(S, p * p)
    xx_p = jnp.pad(xx, ((0, Sp - S), (0, 0)))

    grid_v = disp_grid.astype(dtype)
    frac = jnp.linspace(0.0, 1.0, grid_n, dtype=dtype)
    delta = grid_v[1] - grid_v[0]
    scal = jnp.stack([jnp.asarray(S, dtype), jnp.asarray(prior_var, dtype),
                      delta])

    kernel = functools.partial(_grid_kernel, p=p, grid_n=grid_n,
                               use_prior=use_prior, use_cr=use_cr)
    out = pl.pallas_call(
        kernel,
        grid=(Gp // block_g,),
        in_specs=[
            pl.BlockSpec((block_g, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_g, Sp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Sp, p * p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_g, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_g, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, 1), dtype),
        interpret=interpret,
    )(y_p, mu_p, xx_p, grid_v, frac, pm_p, scal)
    return out[:G, 0]


def lgamma_lanczos(z):
    """Public alias for tests: Lanczos lgamma used inside the kernel."""
    return _lgamma_pos(z)
