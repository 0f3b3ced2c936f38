"""Batched TPU kernels vs the serial numpy oracle (reference algorithm).

Mirrors the reference oracle tests: fitBeta vs handwritten IRLS + optim
(test_betaFitting.R:27-47), fitDisp vs Brent optim on an R-style posterior
and analytic-vs-numeric derivatives (test_dispersions.R:88-125).
"""

import numpy as np
import pytest
import scipy.optimize

import jax.numpy as jnp

from deseq2_tpu.ops import disp as jdisp
from deseq2_tpu.ops import irls as jirls

import oracle


def simulate(G=60, S=8, p=2, seed=0, weights=False):
    rng = np.random.default_rng(seed)
    x = np.column_stack([np.ones(S),
                         np.repeat([0.0, 1.0], [S // 2, S - S // 2])])[:, :p]
    if p > 2:
        x = np.column_stack([x, rng.normal(size=(S, p - 2))])
    beta_true = np.column_stack([rng.normal(3, 1, G), rng.normal(0, 1, (G, p - 1))])
    alpha = np.exp(rng.normal(-2.5, 0.7, G))
    mu = np.exp(x @ beta_true.T).T
    y = rng.negative_binomial(1.0 / alpha[:, None], 1.0 / (1.0 + alpha[:, None] * mu))
    nf = np.ones((G, S))
    w = rng.uniform(0.3, 1.0, (G, S)) if weights else None
    if w is not None:
        w[:, 0] = 1.0  # rowmax 1 like getAndCheckWeights
    return y.astype(np.int64), x, nf, alpha, mu, w


class TestFitBeta:
    def test_matches_serial_oracle(self):
        y, x, nf, alpha, mu, _ = simulate(G=50, S=10)
        beta0 = np.column_stack([np.log(y.mean(axis=1) + 0.1),
                                 np.zeros(len(y))])
        ridge = np.full(2, 1e-6 / np.log(2) ** 2)
        contrast = np.array([0.0, 1.0])
        ours = jirls.fit_beta(jnp.asarray(y), jnp.asarray(x), jnp.asarray(nf),
                              jnp.asarray(alpha), jnp.asarray(beta0),
                              jnp.asarray(ridge), contrast=jnp.asarray(contrast))
        ref = oracle.fit_beta_serial(y, x, nf, alpha, beta0, ridge,
                                     contrast=contrast)
        np.testing.assert_allclose(np.asarray(ours["beta"]), ref["beta"],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ours["beta_var"]),
                                   ref["beta_var"], rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours["hat_diag"]),
                                   ref["hat_diag"], rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours["deviance"]),
                                   ref["deviance"], rtol=1e-9)
        np.testing.assert_array_equal(np.asarray(ours["iter"]), ref["iter"])
        np.testing.assert_allclose(np.asarray(ours["contrast_num"]),
                                   ref["contrast_num"], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours["contrast_denom"]),
                                   ref["contrast_denom"], rtol=1e-8, atol=1e-12)

    def test_matches_optim(self):
        """Penalized MLE agreement with direct optimization
        (reference test_betaFitting.R:36-47)."""
        y, x, nf, alpha, mu, _ = simulate(G=8, S=12)
        beta0 = np.column_stack([np.log(y.mean(axis=1) + 0.1),
                                 np.zeros(len(y))])
        lam = np.array([2.0, 3.0])
        ours = jirls.fit_beta(jnp.asarray(y), jnp.asarray(x), jnp.asarray(nf),
                              jnp.asarray(alpha), jnp.asarray(beta0),
                              jnp.asarray(lam))
        ours_beta = np.asarray(ours["beta"])
        for i in range(len(y)):
            def negpost(b):
                muv = np.maximum(nf[i] * np.exp(x @ b), 0.5)
                ll = np.sum(oracle.nb_logpmf(y[i].astype(float), muv, alpha[i]))
                return -(ll - 0.5 * np.sum(lam * b ** 2))
            o = scipy.optimize.minimize(negpost, ours_beta[i], method="BFGS",
                                        options=dict(gtol=1e-10))
            np.testing.assert_allclose(ours_beta[i], o.x, rtol=1e-5, atol=1e-6)

    def test_weights(self):
        y, x, nf, alpha, mu, w = simulate(G=30, S=10, weights=True)
        beta0 = np.column_stack([np.log(y.mean(axis=1) + 0.1),
                                 np.zeros(len(y))])
        ridge = np.full(2, 1e-6)
        ours = jirls.fit_beta(jnp.asarray(y), jnp.asarray(x), jnp.asarray(nf),
                              jnp.asarray(alpha), jnp.asarray(beta0),
                              jnp.asarray(ridge), weights=jnp.asarray(w),
                              use_weights=True)
        ref = oracle.fit_beta_serial(y, x, nf, alpha, beta0, ridge, weights=w)
        np.testing.assert_allclose(np.asarray(ours["beta"]), ref["beta"],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ours["deviance"]),
                                   ref["deviance"], rtol=1e-9)

    def test_maxit_zero_contrast_only(self):
        """maxit=0 re-entry used by results() for novel contrasts
        (reference R/results.R:797-807)."""
        y, x, nf, alpha, mu, _ = simulate(G=20, S=8)
        beta0 = np.column_stack([np.log(y.mean(axis=1) + 0.5),
                                 np.full(len(y), 0.3)])
        ridge = np.full(2, 1e-6)
        contrast = np.array([1.0, -1.0])
        ours = jirls.fit_beta(jnp.asarray(y), jnp.asarray(x), jnp.asarray(nf),
                              jnp.asarray(alpha), jnp.asarray(beta0),
                              jnp.asarray(ridge), contrast=jnp.asarray(contrast),
                              maxit=0)
        ref = oracle.fit_beta_serial(y, x, nf, alpha, beta0, ridge,
                                     contrast=contrast, maxit=0)
        np.testing.assert_allclose(np.asarray(ours["beta"]), ref["beta"])
        np.testing.assert_allclose(np.asarray(ours["contrast_num"]),
                                   ref["contrast_num"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours["contrast_denom"]),
                                   ref["contrast_denom"], rtol=1e-9)


class TestDispPosterior:
    @pytest.mark.parametrize("use_prior", [False, True])
    @pytest.mark.parametrize("use_weights", [False, True])
    def test_posterior_and_derivs_match_oracle(self, use_prior, use_weights):
        y, x, nf, alpha, mu, w = simulate(G=25, S=9, weights=True)
        if not use_weights:
            w = None
        la = np.log(alpha) + 0.3
        pm = np.log(alpha)
        pv = 1.3
        row_mask, col_mask = jdisp.make_cr_masks(
            jnp.asarray(x), None if w is None else jnp.asarray(w), 1e-2,
            w is not None)
        args_j = dict(weights=None if w is None else jnp.asarray(w),
                      use_weights=w is not None, row_mask=row_mask,
                      col_mask=col_mask)
        for fn_j, fn_o in [(jdisp.log_posterior, oracle.log_posterior_row),
                           (jdisp.dlog_posterior, oracle.dlog_posterior_row),
                           (jdisp.d2log_posterior, oracle.d2log_posterior_row)]:
            ours = np.asarray(fn_j(jnp.asarray(la), jnp.asarray(y, jnp.float64),
                                   jnp.asarray(mu), jnp.asarray(x),
                                   jnp.asarray(pm), pv, use_prior, **args_j))
            ref = np.array([fn_o(la[i], y[i].astype(float), mu[i], x, pm[i],
                                 pv, use_prior,
                                 None if w is None else w[i])
                            for i in range(len(y))])
            np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)

    def test_derivatives_vs_numeric(self):
        """Analytic 1st/2nd derivatives vs central differences
        (reference test_dispersions.R:113-125)."""
        y, x, nf, alpha, mu, _ = simulate(G=10, S=10)
        la = np.log(alpha)
        pm = np.log(alpha) + 0.1
        pv = 0.8
        def lp(v):
            return np.asarray(jdisp.log_posterior(
                jnp.asarray(v), jnp.asarray(y, jnp.float64), jnp.asarray(mu),
                jnp.asarray(x), jnp.asarray(pm), pv, True))

        h = 1e-6
        d_num = (lp(la + h) - lp(la - h)) / (2 * h)
        d_ana = np.asarray(jdisp.dlog_posterior(
            jnp.asarray(la), jnp.asarray(y, jnp.float64), jnp.asarray(mu),
            jnp.asarray(x), jnp.asarray(pm), pv, True))
        np.testing.assert_allclose(d_ana, d_num, rtol=1e-4, atol=1e-4)
        # second difference needs a larger step: rounding noise in lp (~1e-13
        # relative) is amplified by 1/h^2
        h = 1e-3
        d2_num = (lp(la + h) - 2 * lp(la) + lp(la - h)) / h ** 2
        d2_ana = np.asarray(jdisp.d2log_posterior(
            jnp.asarray(la), jnp.asarray(y, jnp.float64), jnp.asarray(mu),
            jnp.asarray(x), jnp.asarray(pm), pv, True))
        np.testing.assert_allclose(d2_ana, d2_num, rtol=1e-3, atol=1e-2)


class TestFitDisp:
    @pytest.mark.parametrize("use_prior", [False, True])
    def test_line_search_matches_serial(self, use_prior):
        y, x, nf, alpha, mu, _ = simulate(G=40, S=10, seed=3)
        la0 = np.log(np.maximum(alpha * np.exp(np.linspace(-1, 1, 40)), 1e-8))
        pm = np.log(alpha)
        pv = 0.7 if use_prior else 1.0
        min_la = np.log(1e-8 / 10)
        ours = jdisp.fit_disp_line_search(
            jnp.asarray(y, jnp.float64), jnp.asarray(x), jnp.asarray(mu),
            jnp.asarray(la0), jnp.asarray(pm), pv, min_la,
            use_prior=use_prior)
        ref = oracle.fit_disp_serial(y, x, mu, la0, pm, pv, min_la,
                                     use_prior=use_prior)
        np.testing.assert_allclose(np.asarray(ours["log_alpha"]),
                                   ref["log_alpha"], rtol=1e-8, atol=1e-8)
        np.testing.assert_array_equal(np.asarray(ours["iter"]), ref["iter"])
        np.testing.assert_array_equal(np.asarray(ours["iter_accept"]),
                                      ref["iter_accept"])
        np.testing.assert_allclose(np.asarray(ours["last_lp"]),
                                   ref["last_lp"], rtol=1e-8)
        np.testing.assert_allclose(np.asarray(ours["initial_lp"]),
                                   ref["initial_lp"], rtol=1e-10)

    def test_map_matches_brent(self):
        """MAP estimate vs scalar Brent optimization of the same posterior
        (reference test_dispersions.R:88-110, tol 1e-6 there; the line
        search stops on lp-change < 1e-6 so alpha agrees more loosely)."""
        y, x, nf, alpha, mu, _ = simulate(G=12, S=14, seed=5)
        la0 = np.log(alpha)
        pm = np.log(alpha * 1.3)
        pv = 0.6
        ours = jdisp.fit_disp_line_search(
            jnp.asarray(y, jnp.float64), jnp.asarray(x), jnp.asarray(mu),
            jnp.asarray(la0), jnp.asarray(pm), pv, np.log(1e-9),
            use_prior=True, tol=1e-12, maxit=300)
        la_hat = np.asarray(ours["log_alpha"])
        for i in range(len(y)):
            res = scipy.optimize.minimize_scalar(
                lambda v: -oracle.log_posterior_row(
                    v, y[i].astype(float), mu[i], x, pm[i], pv, True),
                bounds=(np.log(1e-8), np.log(50)), method="bounded",
                options=dict(xatol=1e-10))
            np.testing.assert_allclose(la_hat[i], res.x, atol=1e-4)

    def test_grid_matches_serial(self):
        y, x, nf, alpha, mu, _ = simulate(G=30, S=10, seed=7)
        grid = np.linspace(np.log(1e-8), np.log(10.0), 20)
        ours = np.asarray(jdisp.fit_disp_grid(
            jnp.asarray(y, jnp.float64), jnp.asarray(x), jnp.asarray(mu),
            jnp.asarray(grid), jnp.zeros(30), 1.0))
        # serial two-stage grid
        ref = np.zeros(30)
        for i in range(30):
            lps = np.array([oracle.log_posterior_row(
                a, y[i].astype(float), mu[i], x, 0.0, 1.0, False)
                for a in grid])
            ahat = grid[np.argmax(lps)]
            delta = grid[1] - grid[0]
            fine = np.linspace(ahat - delta, ahat + delta, 20)
            lps = np.array([oracle.log_posterior_row(
                a, y[i].astype(float), mu[i], x, 0.0, 1.0, False)
                for a in fine])
            ref[i] = fine[np.argmax(lps)]
        # on flat plateaus f64 summation-order noise can flip the argmax;
        # require either the same point or an equally good posterior value
        mismatch = np.abs(ours - ref) > 1e-10
        for i in np.where(mismatch)[0]:
            lp_ours = oracle.log_posterior_row(
                ours[i], y[i].astype(float), mu[i], x, 0.0, 1.0, False)
            lp_ref = oracle.log_posterior_row(
                ref[i], y[i].astype(float), mu[i], x, 0.0, 1.0, False)
            assert abs(lp_ours - lp_ref) < 1e-4, (i, lp_ours, lp_ref)
