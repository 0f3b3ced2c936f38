"""Pallas grid kernel vs the XLA reference path (interpret mode on CPU).

The kernel must reproduce ops/disp.py:_fit_disp_grid_core — same grid,
same first-max tie-breaking — up to lgamma rounding.  In f64 interpret
mode the Lanczos lgamma agrees with scipy to ~1e-12 relative, so the
selected grid points must match almost everywhere; the posterior values
at the selected points must agree tightly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.special import gammaln as scipy_gammaln

from deseq2_tpu.ops.disp import _fit_disp_grid_core, log_posterior
from deseq2_tpu.ops.pallas_disp import (fit_disp_grid_pallas,
                                        lgamma_lanczos,
                                        pallas_grid_supported)


def _sim(G=300, S=24, p=2, seed=0):
    rng = np.random.default_rng(seed)
    x = np.column_stack([np.ones(S)] +
                        [np.repeat(rng.permutation([0.0, 1.0] * (S // 2)),
                                   1) for _ in range(p - 1)])
    mu0 = np.exp(rng.normal(3.0, 1.5, (G, 1))) * np.ones((1, S))
    alpha = 4.0 / mu0[:, 0] + 0.1
    size = 1.0 / alpha[:, None]
    y = rng.negative_binomial(size, size / (size + mu0)).astype(np.float64)
    mu = np.maximum(mu0, 0.5)
    grid = np.linspace(np.log(1e-8), np.log(max(10.0, S)), 20)
    return (jnp.asarray(y), jnp.asarray(x), jnp.asarray(mu),
            jnp.asarray(grid))


def test_lanczos_lgamma_accuracy():
    z = jnp.asarray(np.concatenate([
        np.linspace(1e-3, 5, 200), np.logspace(1, 8, 200)]))
    ours = np.asarray(lgamma_lanczos(z))
    ref = scipy_gammaln(np.asarray(z))
    np.testing.assert_allclose(ours, ref, rtol=5e-13, atol=5e-13)


@pytest.mark.parametrize("use_prior", [False, True])
def test_grid_kernel_matches_xla(use_prior):
    y, x, mu, grid = _sim()
    G = y.shape[0]
    pm = jnp.log(jnp.full(G, 0.5))
    pv = 1.3
    ref = _fit_disp_grid_core(y, x, mu, grid, pm, pv, use_prior=use_prior)
    got = fit_disp_grid_pallas(y, x, mu, grid, pm, pv,
                               use_prior=use_prior, interpret=True)
    ref = np.asarray(ref)
    got = np.asarray(got)
    # identical grid-point selection except where lgamma rounding flips a
    # near-tie; the fine step bounds any such flip
    fine_step = 2 * (grid[1] - grid[0]) / 19
    agree = np.isclose(ref, got, atol=1e-9)
    assert agree.mean() > 0.98
    np.testing.assert_allclose(got, ref, atol=float(fine_step) + 1e-9)
    # posterior at the selected points must be as good as the XLA pick
    lp_ref = np.asarray(log_posterior(jnp.asarray(ref), y, mu, x, pm, pv,
                                      use_prior))
    lp_got = np.asarray(log_posterior(jnp.asarray(got), y, mu, x, pm, pv,
                                      use_prior))
    assert np.all(lp_got >= lp_ref - 1e-6 * np.abs(lp_ref) - 1e-6)


def test_grid_kernel_p3():
    y, x, mu, grid = _sim(G=150, S=24, p=3, seed=4)
    pm = jnp.zeros(y.shape[0])
    ref = _fit_disp_grid_core(y, x, mu, grid, pm, 1.0, use_prior=False)
    got = fit_disp_grid_pallas(y, x, mu, grid, pm, 1.0,
                               use_prior=False, interpret=True)
    fine_step = 2 * (grid[1] - grid[0]) / 19
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=float(fine_step) + 1e-9)


def test_supported_predicate():
    assert pallas_grid_supported(128, 2, jnp.float32)
    assert not pallas_grid_supported(128, 2, jnp.float64)
    assert not pallas_grid_supported(50000, 2, jnp.float32)
    assert not pallas_grid_supported(128, 9, jnp.float32)
    assert not pallas_grid_supported(128, 2, jnp.float32, use_weights=True)


def test_pallas_gates_refuse_p1():
    """Intercept-only designs (p=1) hit a Mosaic multi_reduction
    limitation; the support gates must route them to the XLA path
    (previously deseq(~1) crashed on TPU)."""
    import jax.numpy as jnp

    from deseq2_tpu.ops.pallas_disp import pallas_grid_supported
    from deseq2_tpu.ops.pallas_irls import pallas_irls_supported
    from deseq2_tpu.ops.pallas_ls import pallas_ls_supported

    for fn in (pallas_ls_supported, pallas_irls_supported,
               pallas_grid_supported):
        assert not fn(1024, 1, jnp.float32)
        assert fn(1024, 2, jnp.float32)
