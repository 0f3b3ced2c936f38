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


def test_mc_kl_smoothing_impact_bound():
    """Documented-deviations bound (docs/USAGE.md): the MC-KL prior's
    final smoothing here is a direct dense loess evaluation, while R
    uses loess surface="interpolate" (local fits at kd-tree vertices +
    cubic Hermite blend, R/core.R:1186-1189).  This test measures the
    deviation against a vertex+Hermite surrogate of R's scheme (32
    uniform cells ~ the kd leaves of a 200-point uniform grid at
    cell=0.2, span=0.2) and pins the documented bound: the fine-grid
    argmin — hence dispPriorVar before the 0.25 floor — moves <= 0.05
    (the KL curve bottom is flat, so the argmin is the ill-conditioned
    quantity; the prior variance it feeds changes by the same <= 0.05)."""
    import numpy as np
    from deseq2_tpu.dispersions import (_hist_density_right,
                                        _loess_quadratic, _mc_kl_streams)

    df = 3
    chis, norms = _mc_kl_streams(2, df, 200)
    rng = np.random.default_rng(7)
    # an observed residual distribution in the regime the branch serves
    obs = np.log(rng.chisquare(df, 4000)) - np.log(df) \
        + rng.normal(0, 1.0, 4000)
    brks = np.arange(-20, 21) / 2.0
    obs = obs[(obs > brks[0]) & (obs < brks[-1])]
    grid = np.linspace(0, 8, 200)
    obs_hist = _hist_density_right(obs, brks)
    kl = np.empty(200)
    for i, v in enumerate(grid):
        rand = np.log(chis[i]) + np.sqrt(v) * norms[i] - np.log(df)
        rand = rand[(rand > brks[0]) & (rand < brks[-1])]
        rh = _hist_density_right(rand, brks)
        z = np.concatenate([obs_hist, rh])
        small = z[z > 0].min()
        kl[i] = np.sum(obs_hist * (np.log(obs_hist + small)
                                   - np.log(rh + small)))
    fine = np.linspace(0, 8, 1000)

    # production path: dense loess + linear interp
    dense = np.interp(fine, grid, _loess_quadratic(grid, kl, span=0.2))

    # surrogate of R's surface="interpolate": local quadratic value +
    # slope at the cell vertices, cubic Hermite inside each cell
    k = int(np.ceil(0.2 * 200))
    verts = np.linspace(0, 8, 33)
    vals = np.empty(33)
    slopes = np.empty(33)
    for j, v in enumerate(verts):
        d = np.abs(grid - v)
        idx = np.argpartition(d, k - 1)[:k]
        h = d[idx].max()
        w = (1 - np.minimum(d[idx] / h, 1) ** 3) ** 3
        X = np.column_stack([np.ones(k), grid[idx] - v,
                             (grid[idx] - v) ** 2])
        beta = np.linalg.solve((X.T * w) @ X, (X.T * w) @ kl[idx])
        vals[j], slopes[j] = beta[0], beta[1]
    cell = np.clip(np.searchsorted(verts, fine, side="right") - 1, 0, 31)
    x0, x1 = verts[cell], verts[cell + 1]
    t = (fine - x0) / (x1 - x0)
    h00 = 2 * t ** 3 - 3 * t ** 2 + 1
    h10 = t ** 3 - 2 * t ** 2 + t
    h01 = -2 * t ** 3 + 3 * t ** 2
    h11 = t ** 3 - t ** 2
    dx = x1 - x0
    herm = (h00 * vals[cell] + h10 * dx * slopes[cell]
            + h01 * vals[cell + 1] + h11 * dx * slopes[cell + 1])

    argmin_dense = fine[np.argmin(dense)]
    argmin_herm = fine[np.argmin(herm)]
    assert abs(argmin_dense - argmin_herm) <= 0.05, \
        (argmin_dense, argmin_herm)
