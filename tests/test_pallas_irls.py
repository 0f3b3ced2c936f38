"""Pallas fused IRLS kernel vs the XLA reference path (interpret mode).

In f64 the Lanczos lgamma agrees with XLA's to ~1e-12, so the deviance
trajectory — and therefore every accept/convergence decision — matches
the XLA path, and the fitted betas must agree to solver tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from deseq2_tpu.ops.irls import _fit_beta_core
from deseq2_tpu.ops.pallas_irls import fit_beta_pallas, pallas_irls_supported


def _sim(G=300, S=24, p=2, seed=0):
    rng = np.random.default_rng(seed)
    cols = [np.ones(S)]
    for _ in range(p - 1):
        cols.append(rng.permutation([0.0, 1.0] * (S // 2)))
    x = np.column_stack(cols)
    beta_true = np.column_stack(
        [rng.normal(3.0, 1.0, G)] +
        [rng.normal(0.0, 1.0, G) for _ in range(p - 1)])
    mu = np.exp(beta_true @ x.T)
    alpha = np.clip(4.0 / mu[:, 0] + 0.1, 0.05, 5.0)
    size = 1.0 / alpha[:, None]
    y = rng.negative_binomial(size, size / (size + mu)).astype(np.float64)
    nf = np.ones((G, S))
    beta_init = np.log(np.maximum(y.mean(axis=1), 0.5))[:, None] * \
        np.concatenate([[1.0], np.zeros(p - 1)])[None, :]
    ridge = np.full(p, 1e-6 / np.log(2.0) ** 2)
    return (jnp.asarray(y), jnp.asarray(x), jnp.asarray(nf),
            jnp.asarray(alpha), jnp.asarray(beta_init), jnp.asarray(ridge))


@pytest.mark.parametrize("p", [2, 3])
def test_irls_kernel_matches_xla(p):
    y, x, nf, alpha, beta_init, ridge = _sim(p=p, seed=p)
    ref = _fit_beta_core(y, x, nf, alpha, beta_init, ridge,
                         maxit=100, min_mu=0.5)
    got = fit_beta_pallas(y, x, nf, alpha, beta_init, ridge,
                          maxit=100, min_mu=0.5, interpret=True)
    conv = np.asarray(ref["iter"]) < 100
    assert conv.mean() > 0.95
    np.testing.assert_allclose(np.asarray(got["beta"])[conv],
                               np.asarray(ref["beta"])[conv],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got["beta_var"])[conv],
                               np.asarray(ref["beta_var"])[conv],
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["deviance"])[conv],
                               np.asarray(ref["deviance"])[conv],
                               rtol=1e-8, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["hat_diag"])[conv],
                               np.asarray(ref["hat_diag"])[conv],
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got["mu"])[conv],
                               np.asarray(ref["mu"])[conv],
                               rtol=1e-6, atol=1e-6)
    it_ref = np.asarray(ref["iter"])
    it_got = np.asarray(got["iter"])
    assert (it_ref[conv] == it_got[conv]).mean() > 0.98


def test_irls_kernel_nf_row():
    """(S,) shared normalization row == full (G,S) matrix."""
    y, x, nf, alpha, beta_init, ridge = _sim(seed=7)
    sf = np.exp(np.random.default_rng(1).normal(0, 0.3, y.shape[1]))
    nf_full = jnp.asarray(np.broadcast_to(sf[None, :], y.shape))
    a = fit_beta_pallas(y, x, nf_full, alpha, beta_init, ridge,
                        interpret=True)
    b = fit_beta_pallas(y, x, jnp.asarray(sf), alpha, beta_init, ridge,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(a["beta"]), np.asarray(b["beta"]),
                               rtol=1e-12, atol=1e-12)


def test_irls_supported_predicate():
    assert pallas_irls_supported(128, 2, jnp.float32)
    assert pallas_irls_supported(1024, 3, jnp.float32)
    assert not pallas_irls_supported(128, 2, jnp.float64)
    assert not pallas_irls_supported(128, 9, jnp.float32)
    # weights are now streamed by the kernel (VERDICT r3 item 6)
    assert pallas_irls_supported(128, 2, jnp.float32, use_weights=True)


def test_irls_kernel_weighted_matches_xla():
    """Observation weights stream through the kernel (one more VMEM
    block, src/DESeq2.cpp:337-341): weighted beta/SE/hat/deviance must
    match the weighted XLA core (VERDICT r3 item 6)."""
    y, x, nf, alpha, beta_init, ridge = _sim(p=2, seed=5)
    rng = np.random.default_rng(7)
    w = jnp.asarray(np.clip(rng.random(y.shape) + 0.25, 0.0, 1.0))
    w = w / jnp.max(w, axis=1, keepdims=True)
    ref = _fit_beta_core(y, x, nf, alpha, beta_init, ridge,
                         maxit=100, min_mu=0.5, weights=w,
                         use_weights=True)
    got = fit_beta_pallas(y, x, nf, alpha, beta_init, ridge,
                          maxit=100, min_mu=0.5, interpret=True,
                          weights=w)
    conv = np.asarray(ref["iter"]) < 100
    assert conv.mean() > 0.95
    for k, rtol in (("beta", 1e-6), ("beta_var", 1e-5),
                    ("deviance", 1e-8), ("hat_diag", 1e-5)):
        np.testing.assert_allclose(np.asarray(got[k])[conv],
                                   np.asarray(ref[k])[conv],
                                   rtol=rtol, atol=1e-7, err_msg=k)
    assert np.array_equal(np.asarray(got["iter"])[conv],
                          np.asarray(ref["iter"])[conv])


def test_irls_weighted_supported_gate():
    assert pallas_irls_supported(1024, 2, jnp.float32, use_weights=True)
    assert not pallas_irls_supported(1024, 9, jnp.float32,
                                     use_weights=True)
