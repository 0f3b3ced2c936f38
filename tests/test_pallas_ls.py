"""Pallas fused line-search kernel vs the XLA reference path.

Runs in interpret mode on CPU.  In f64 the Lanczos lgamma / shifted
Stirling digamma agree with scipy to ~1e-12, so the accept/reject
trajectory matches the XLA path almost everywhere and the final
log-alpha must agree tightly; the posterior value at the solution must
be at least as good as the XLA pick where trajectories diverge on a
rounding tie.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.special import digamma as scipy_digamma

from deseq2_tpu.ops.disp import _fit_disp_line_search_core, log_posterior
from deseq2_tpu.ops.pallas_ls import (digamma_pos,
                                      fit_disp_line_search_pallas,
                                      pallas_ls_supported)

MIN_LA = float(np.log(1e-9))


def _sim(G=300, S=24, p=2, seed=0):
    rng = np.random.default_rng(seed)
    cols = [np.ones(S)]
    for _ in range(p - 1):
        cols.append(rng.permutation([0.0, 1.0] * (S // 2)))
    x = np.column_stack(cols)
    mu0 = np.exp(rng.normal(3.0, 1.5, (G, 1))) * np.ones((1, S))
    alpha = 4.0 / mu0[:, 0] + 0.1
    size = 1.0 / alpha[:, None]
    y = rng.negative_binomial(size, size / (size + mu0)).astype(np.float64)
    mu = np.maximum(mu0, 0.5)
    la0 = np.log(np.clip(alpha * np.exp(rng.normal(0, 0.5, G)), 1e-8, 10.0))
    return (jnp.asarray(y), jnp.asarray(x), jnp.asarray(mu),
            jnp.asarray(la0))


def test_digamma_accuracy():
    z = jnp.asarray(np.concatenate([
        np.linspace(4.5e-5, 5, 300), np.logspace(1, 8, 200)]))
    ours = np.asarray(digamma_pos(z))
    ref = scipy_digamma(np.asarray(z))
    np.testing.assert_allclose(ours, ref, rtol=5e-11, atol=5e-11)


@pytest.mark.parametrize("use_prior", [False, True])
def test_ls_kernel_matches_xla(use_prior):
    y, x, mu, la0 = _sim()
    G = y.shape[0]
    pm = jnp.log(jnp.full(G, 0.5))
    pv = 1.3
    ref = _fit_disp_line_search_core(y, x, mu, la0, pm, pv, MIN_LA,
                                     maxit=100, use_prior=use_prior)
    got = fit_disp_line_search_pallas(y, x, mu, la0, pm, pv, MIN_LA,
                                      maxit=100, use_prior=use_prior,
                                      interpret=True)
    la_ref = np.asarray(ref["log_alpha"])
    la_got = np.asarray(got["log_alpha"])
    agree = np.isclose(la_ref, la_got, atol=1e-6)
    assert agree.mean() > 0.98, agree.mean()
    # where a rounding tie flipped a step, the solution must be as good
    lp_ref = np.asarray(log_posterior(jnp.asarray(la_ref), y, mu, x, pm, pv,
                                      use_prior))
    lp_got = np.asarray(log_posterior(jnp.asarray(la_got), y, mu, x, pm, pv,
                                      use_prior))
    assert np.all(lp_got >= lp_ref - 1e-6 * np.abs(lp_ref) - 1e-6)
    # bookkeeping columns match where trajectories agree
    it_ref = np.asarray(ref["iter"])
    it_got = np.asarray(got["iter"])
    assert (it_ref[agree] == it_got[agree]).mean() > 0.98
    np.testing.assert_allclose(np.asarray(got["initial_lp"]),
                               np.asarray(ref["initial_lp"]),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["last_lp"])[agree],
                               np.asarray(ref["last_lp"])[agree],
                               rtol=1e-8, atol=1e-8)


def test_ls_kernel_p3():
    y, x, mu, la0 = _sim(G=150, S=24, p=3, seed=4)
    G = y.shape[0]
    pm = jnp.zeros(G)
    ref = _fit_disp_line_search_core(y, x, mu, la0, pm, 1.0, MIN_LA,
                                     maxit=100, use_prior=False)
    got = fit_disp_line_search_pallas(y, x, mu, la0, pm, 1.0, MIN_LA,
                                      maxit=100, use_prior=False,
                                      interpret=True)
    la_ref = np.asarray(ref["log_alpha"])
    la_got = np.asarray(got["log_alpha"])
    assert np.isclose(la_ref, la_got, atol=1e-6).mean() > 0.97


def test_ls_supported_predicate():
    assert pallas_ls_supported(128, 2, jnp.float32)
    assert pallas_ls_supported(1024, 2, jnp.float32)
    assert not pallas_ls_supported(128, 2, jnp.float64)
    assert not pallas_ls_supported(128, 9, jnp.float32)
    # weights stream through the kernel (masked weighted CR in-kernel)
    assert pallas_ls_supported(128, 2, jnp.float32, use_weights=True)


def test_ls_kernel_weighted_matches_xla():
    """Observation weights through the kernel: weighted likelihood
    terms, the Cox-Reid row subset (weight > threshold) and per-gene
    column drops with identity embedding (cpp:38-44, make_cr_masks) —
    the f64 trajectory must match the weighted XLA core."""
    y, x, mu, la0 = _sim(seed=4)
    G = y.shape[0]
    rng = np.random.default_rng(9)
    w = np.clip(rng.random(y.shape) + 0.2, 0.0, 1.0)
    # force CR column drops for some genes: zero out every treated
    # sample's weight (below threshold) so the treatment column loses
    # its selected support
    treated = np.asarray(x[:, 1]) > 0
    w[:10][:, treated] = 1e-3
    w = w / w.max(axis=1, keepdims=True)
    w[:10][:, treated] = 1e-3          # keep below threshold after norm
    w_d = jnp.asarray(w)
    pm = jnp.log(jnp.full(G, 0.5))
    ref = _fit_disp_line_search_core(y, x, mu, la0, pm, 1.3, MIN_LA,
                                     maxit=100, use_prior=True,
                                     weights=w_d, use_weights=True)
    got = fit_disp_line_search_pallas(y, x, mu, la0, pm, 1.3, MIN_LA,
                                      maxit=100, use_prior=True,
                                      interpret=True, weights=w_d)
    la_r = np.asarray(ref["log_alpha"])
    la_g = np.asarray(got["log_alpha"])
    same = np.isclose(la_r, la_g, rtol=1e-8, atol=1e-9)
    assert same.mean() > 0.99, f"{(~same).sum()} genes diverged"
    # rounding-tie divergers must land at least as good a posterior
    if (~same).any():
        from deseq2_tpu.ops.disp import make_cr_masks
        rm, cm = make_cr_masks(x, w_d, 1e-2, True)
        idx = np.where(~same)[0]
        lp_r = np.asarray(log_posterior(
            jnp.asarray(la_r[idx]), y[idx], mu[idx], x, pm[idx], 1.3,
            True, weights=w_d[idx], use_weights=True,
            row_mask=rm[idx], col_mask=cm[idx]))
        lp_g = np.asarray(log_posterior(
            jnp.asarray(la_g[idx]), y[idx], mu[idx], x, pm[idx], 1.3,
            True, weights=w_d[idx], use_weights=True,
            row_mask=rm[idx], col_mask=cm[idx]))
        assert np.all(lp_g >= lp_r - 1e-6)
