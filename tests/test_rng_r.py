"""R-exact RNG streams (rng_r.py) vs the classic published R values."""

import numpy as np
import pytest

from deseq2_tpu.rng_r import RRandomState, _qnorm


def test_runif_matches_r():
    # set.seed(1); runif(3)
    r = RRandomState(1)
    np.testing.assert_allclose(
        [r.unif_rand() for _ in range(3)],
        [0.2655087, 0.3721239, 0.5728534], atol=5e-8)
    # set.seed(42); runif(2)
    r = RRandomState(42)
    np.testing.assert_allclose([r.unif_rand() for _ in range(2)],
                               [0.9148060, 0.9370754], atol=5e-8)


def test_rnorm_matches_r():
    # set.seed(1); rnorm(3)
    r = RRandomState(1)
    np.testing.assert_allclose(
        [r.norm_rand() for _ in range(3)],
        [-0.6264538, 0.1836433, -0.8356286], atol=5e-8)
    # set.seed(42); rnorm(2)
    r = RRandomState(42)
    np.testing.assert_allclose([r.norm_rand() for _ in range(2)],
                               [1.3709584, -0.5646982], atol=5e-8)
    # set.seed(123); rnorm(1)
    r = RRandomState(123)
    assert r.norm_rand() == pytest.approx(-0.5604756, abs=5e-8)


def test_qnorm_matches_scipy():
    from scipy.stats import norm
    ps = np.concatenate([np.linspace(1e-12, 1 - 1e-12, 1001),
                         [1e-300, 1 - 1e-16, 0.5]])
    ours = np.array([_qnorm(p) for p in ps])
    ref = norm.ppf(ps)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_rnorm_sd_zero_consumes_nothing():
    """R's rnorm early-returns mu when sd == 0 without touching the
    stream (rnorm.c) — the MC-KL grid starts at variance 0."""
    r1, r2 = RRandomState(2), RRandomState(2)
    r1.rnorm(100, 0.0, 0.0)
    np.testing.assert_array_equal(r1.runif(5), r2.runif(5))


def test_rchisq_moments():
    """GD/GS gamma streams produce chi-square moments (no published R
    golden rememberable; algorithmic port validated statistically)."""
    r = RRandomState(7)
    for df in (1, 2, 3):
        x = r.rchisq(20000, df)
        assert np.mean(x) == pytest.approx(df, rel=0.05)
        assert np.var(x) == pytest.approx(2.0 * df, rel=0.1)


def test_exp_rand_moments():
    r = RRandomState(11)
    x = np.array([r.exp_rand() for _ in range(20000)])
    assert np.mean(x) == pytest.approx(1.0, rel=0.03)
    assert np.var(x) == pytest.approx(1.0, rel=0.06)


def test_mc_kl_branch_uses_r_stream():
    """m - p <= 3 design exercises the MC-KL prior-variance branch end
    to end with the R stream (R/core.R:1157-1191)."""
    import deseq2_tpu as dt
    dds = dt.make_example_dataset(n=120, m=5, seed=5)
    dds = dt.estimate_size_factors(dds)
    dds = dt.estimate_dispersions(dds)   # m-p = 3 -> MC-KL branch
    pv = dds.dispersion_function.disp_prior_var
    assert pv >= 0.25
