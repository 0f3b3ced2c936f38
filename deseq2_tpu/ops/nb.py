"""Negative-binomial likelihood primitives (pure JAX, batched over genes).

Log-density identical to R's dnbinom_mu parameterization used throughout the
reference (src/DESeq2.cpp:369, R/core.R:2208-2217):

    size = 1/alpha,  Var = mu + alpha * mu^2
    log f(y; mu, size) = lgamma(y+size) - lgamma(size) - lgamma(y+1)
                         + size*log(size/(size+mu)) + y*log(mu/(size+mu))
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln


def _sums_of_powers(y):
    """S_k = sum_{j=0}^{y-1} j^k for k=1..4, closed forms."""
    s1 = y * (y - 1.0) / 2.0
    s2 = (y - 1.0) * y * (2.0 * y - 1.0) / 6.0
    s3 = s1 * s1
    s4 = s2 * (3.0 * y * y - 3.0 * y - 1.0) / 5.0
    return s1, s2, s3, s4


def lgamma_diff_centered(y, c):
    """gammaln(y + c) - gammaln(c) - y*log(c), computed stably.

    For integer y this equals sum_{j=0}^{y-1} log(1 + j/c) (exact
    identity).  The direct gammaln difference cancels catastrophically
    in f32 once c >> y (y is absorbed by rounding in y + c — the
    failure mode that let the f32 dispersion line search race to the
    min-alpha clamp at c = 1/alpha >~ 1e7); when c > 16*y switch to the
    4-term series of sum log(1+j/c) with closed-form power sums
    (error <= y*(y/c)^5/5, below f32 noise at the crossover).  f64
    keeps the direct form everywhere (accurate to ~1e-7 absolute at
    c = 1e8, within reference tolerance, and bit-stable vs the
    established parity suite)."""
    direct = gammaln(y + c) - gammaln(c) - y * jnp.log(c)
    if jnp.finfo(jnp.result_type(y, c)).eps < 1e-10:
        return direct
    s1, s2, s3, s4 = _sums_of_powers(y)
    ci = 1.0 / c
    series = ci * (s1 - ci * (s2 / 2.0 - ci * (s3 / 3.0 - ci * s4 / 4.0)))
    return jnp.where(c > 16.0 * jnp.maximum(y, 1.0), series, direct)


def digamma_diff(y, c):
    """digamma(y + c) - digamma(c) = sum_{j=0}^{y-1} 1/(c+j), stable
    for large c (same crossover rule as lgamma_diff_centered)."""
    from jax.scipy.special import digamma
    direct = digamma(y + c) - digamma(c)
    if jnp.finfo(jnp.result_type(y, c)).eps < 1e-10:
        return direct
    s1, s2, s3, s4 = _sums_of_powers(y)
    ci = 1.0 / c
    series = ci * (y - ci * (s1 - ci * (s2 - ci * (s3 - ci * s4))))
    return jnp.where(c > 16.0 * jnp.maximum(y, 1.0), series, direct)


def trigamma_diff(y, c):
    """trigamma(y + c) - trigamma(c) = -sum_{j=0}^{y-1} 1/(c+j)^2,
    stable for large c."""
    from jax.scipy.special import polygamma
    direct = polygamma(1, y + c) - polygamma(1, c)
    if jnp.finfo(jnp.result_type(y, c)).eps < 1e-10:
        return direct
    s1, s2, s3, _ = _sums_of_powers(y)
    ci = 1.0 / c
    series = -ci * ci * (y - ci * (2.0 * s1 - ci * (3.0 * s2
                                                    - ci * 4.0 * s3)))
    return jnp.where(c > 16.0 * jnp.maximum(y, 1.0), series, direct)


def nb_logpmf(y, mu, alpha):
    """Elementwise NB log-pmf with mean mu, dispersion alpha (size=1/alpha)."""
    size = 1.0 / alpha
    # y*log(mu/(size+mu)) with the y==0 convention 0*log(0)=0
    t = jnp.where(y > 0, y * (jnp.log(mu) - jnp.log(size + mu)), 0.0)
    return (gammaln(y + size) - gammaln(size) - gammaln(y + 1.0)
            + size * (jnp.log(size) - jnp.log(size + mu)) + t)


def nb_logpmf_with_const(y, mu, alpha, lgamma_const):
    """NB log-pmf where the mu-independent part has been precomputed.

    lgamma_const = lgamma(y+size) - lgamma(size) - lgamma(y+1) + size*log(size)
    does not change while iterating on beta (y, alpha fixed) — the reference
    recomputes it every IRLS sweep (src/DESeq2.cpp:369); hoisting it removes
    3 lgammas + 1 log per element per iteration on TPU.
    """
    size = 1.0 / alpha
    t = jnp.where(y > 0, y * (jnp.log(mu) - jnp.log(size + mu)), 0.0)
    return lgamma_const - size * jnp.log(size + mu) + t


def nb_lgamma_const(y, alpha):
    size = 1.0 / alpha
    return (gammaln(y + size) - gammaln(size) - gammaln(y + 1.0)
            + size * jnp.log(size))


def nb_row_loglike(y, mu, alpha, weights=None):
    """Per-gene log-likelihood: sum over samples of (weighted) NB log-pmf.

    y, mu: (G,S); alpha: (G,).  Reference nbinomLogLike (R/core.R:2208-2217).
    """
    lp = nb_logpmf(y, mu, alpha[:, None])
    if weights is not None:
        lp = weights * lp
    return jnp.sum(lp, axis=-1)
