"""Batched small-SPD linear algebra via Cholesky.

TPU note: XLA's LU decomposition does not support f64 on TPU ("Only F32 and
C64 types are implemented in LuDecomposition"), so all solves/inverses of
the p x p systems here (p = 2-10, always SPD: X'WX + ridge) go through
batched Cholesky + triangular solves, which lower natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_solve(a, b):
    """Solve a @ x = b for SPD a. a: (..., p, p); b: (..., p, k)."""
    chol = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False)


def spd_inverse(a):
    """Batched inverse of SPD matrices via Cholesky."""
    p = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(p, dtype=a.dtype), a.shape)
    return chol_solve(a, eye)


def spd_logdet(a):
    chol = jnp.linalg.cholesky(a)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)),
                         axis=-1)
