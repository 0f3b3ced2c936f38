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
