"""glmGamPoi-style path tests: local-median trend, QL shrinkage, QL
F-test (reference test_LRT.R:14-35 and the fitType='glmGamPoi'
contracts in R/core.R:789-816,1064-1096,1898-1947)."""

import numpy as np
import pytest
from scipy.special import polygamma

from deseq2_tpu import deseq, make_example_dataset, results
from deseq2_tpu.gampoi import (loc_median_fit, make_closest_index_disp_fn,
                               overdispersion_shrinkage, trigamma_inverse)


def test_trigamma_inverse():
    for v in (0.1, 0.5, 2.0, 10.0):
        y = trigamma_inverse(v)
        np.testing.assert_allclose(polygamma(1, y), v, rtol=1e-6)


def test_loc_median_fit_follows_trend():
    """Window medians track a smooth trend on log-spaced means (base
    means are ~log-distributed in practice; a sliding median is biased
    at steep boundary windows, like the reference's locfit)."""
    rng = np.random.default_rng(0)
    x = np.exp(np.linspace(0, np.log(100), 500))
    truth = 10.0 / x + 0.2
    y = truth * np.exp(rng.normal(0, 0.05, 500))
    fit = loc_median_fit(x, y)
    inner = slice(30, -30)
    rel = np.abs(np.log(fit[inner] / truth[inner]))
    assert np.median(rel) < 0.1
    assert rel.max() < 0.6


def test_closest_index_fn():
    bm = np.array([1.0, 10.0, 100.0])
    med = np.array([5.0, 0.5, 0.05])
    fn = make_closest_index_disp_fn(bm, med)
    np.testing.assert_allclose(fn([0.5, 9.0, 1000.0]), [5.0, 0.5, 0.05])


def test_ql_shrinkage_properties():
    rng = np.random.default_rng(1)
    G = 500
    gene_means = np.exp(rng.normal(3, 1.5, G))
    disp_trend = 4.0 / gene_means + 0.1
    # spread 1.5 in log: genuinely more variable than chi2_df sampling
    # noise (log-sd ~ sqrt(trigamma(df/2)) ~ 0.47 at df=10), so the EB
    # squeeze must keep per-gene signal rather than collapse to the trend
    disp_est = disp_trend * np.exp(rng.normal(0, 1.5, G))
    shrink = overdispersion_shrinkage(disp_est, gene_means, df=10,
                                      disp_trend=disp_trend)
    assert shrink["ql_df0"] > 0
    est, tr, shr = (shrink["ql_disp_estimate"], shrink["ql_disp_trend"],
                    shrink["ql_disp_shrunken"])
    # empirical-Bayes squeeze: spread around the trend strictly shrinks
    assert np.var(np.log(shr / tr)) < np.var(np.log(est / tr))
    # and the shrunken values are a convex combination: correlated with
    # the estimates but closer to the (scaled) trend on average
    assert np.corrcoef(np.log(shr), np.log(est))[0, 1] > 0.5
    assert np.median(np.abs(np.log(shr / tr))) <= \
        np.median(np.abs(np.log(est / tr))) + 0.05


@pytest.fixture(scope="module")
def dds_gampoi():
    dds = make_example_dataset(n=200, m=10, beta_sd=1.0, seed=21)
    return deseq(dds, test="LRT", reduced="~ 1", fit_type="glmGamPoi")


def test_gampoi_pipeline_columns(dds_gampoi):
    dds = dds_gampoi
    for col in ("qlDispMLE", "qlDispFit", "qlDispMAP", "dispFitQLCorrected",
                "dispersion", "LRTStatistic", "LRTPvalue"):
        assert col in dds.row_data, col
    assert "quasiLikelihood_df0" in dds.attrs
    assert dds.attrs["quasiLikelihood_df0"] > 0
    nz = ~dds.row_data["allZero"]
    assert np.isfinite(dds.row_data["dispersion"][nz]).all()
    # F statistics are non-negative, p-values in [0,1]
    stat = dds.row_data["LRTStatistic"][nz]
    p = dds.row_data["LRTPvalue"][nz]
    assert np.all(stat >= 0)
    assert np.all((p >= 0) & (p <= 1))


def test_gampoi_detects_signal(dds_gampoi):
    res = results(dds_gampoi)
    true_beta = dds_gampoi.row_data["trueBeta"]
    strong = np.abs(true_beta) > 2.0
    weak = np.abs(true_beta) < 0.1
    ok = np.isfinite(res.pvalue)
    if (strong & ok).sum() > 5 and (weak & ok).sum() > 5:
        assert np.nanmedian(res.pvalue[strong & ok]) < \
            np.nanmedian(res.pvalue[weak & ok])


def test_gampoi_vs_standard_dispersions():
    """QL path and standard path agree on the broad dispersion scale."""
    dds = make_example_dataset(n=200, m=10, seed=22)
    a = deseq(dds, test="LRT", reduced="~ 1", fit_type="glmGamPoi")
    b = deseq(dds, test="LRT", reduced="~ 1")
    nz = ~a.row_data["allZero"]
    ra = np.log(a.row_data["dispersion"][nz])
    rb = np.log(b.row_data["dispersion"][nz])
    assert np.corrcoef(ra, rb)[0, 1] > 0.8


def test_loc_median_vectorized_matches_loop():
    """The vectorized / device sliding-median paths match the scalar
    loop exactly (same windows, weights, first-crossing pick)."""
    import numpy as np
    from deseq2_tpu import gampoi
    from deseq2_tpu.parallel.sc import _loc_median_fit_fast
    rng = np.random.default_rng(7)
    n = 5000
    x = rng.uniform(0, 100, n)
    y = rng.gamma(2.0, 1.0, n)
    # force the scalar loop for the reference answer
    npoints = max(int(np.round(0.1 * n)), 2)
    order = np.argsort(x, kind="stable")
    ys = y[order]
    half = npoints // 2
    ref = np.empty(n)
    for i in range(n):
        lo = max(0, min(i - half, n - npoints))
        hi = lo + npoints
        rel = (np.arange(lo, hi) - i) / max(half, 1)
        w = (1 - np.minimum(np.abs(rel), 1.0) ** 3) ** 3
        ref[i] = gampoi._weighted_median(ys[lo:hi], w)
    out = np.empty(n)
    out[order] = ref
    np.testing.assert_allclose(gampoi.loc_median_fit(x, y), out, rtol=0)
    np.testing.assert_allclose(_loc_median_fit_fast(x, y), out, rtol=1e-12)
