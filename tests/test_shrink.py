"""LFC shrinkage tests (normal / apeglm-style / ashr-style).

Modeled on the reference's test_lfcShrink.R: shrinkage estimators pull
noisy low-information LFCs toward zero, leave well-estimated LFCs nearly
unchanged, and the three types agree on sign for strong effects.
"""

import numpy as np
import pytest

from deseq2_tpu import deseq, make_example_dataset, results
from deseq2_tpu.shrink import lfc_shrink


@pytest.fixture(scope="module")
def fitted():
    dds = make_example_dataset(n=300, m=12, beta_sd=1.0, seed=42)
    dds = deseq(dds)
    res = results(dds)
    return dds, res


@pytest.mark.parametrize("type", ["normal", "apeglm", "ashr"])
def test_shrinks_toward_zero(fitted, type):
    dds, res = fitted
    shr = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type=type)
    ok = np.isfinite(res.log2_fold_change) & \
        np.isfinite(shr.log2_fold_change)
    assert ok.sum() > 200
    # average magnitude decreases
    assert np.abs(shr.log2_fold_change[ok]).mean() < \
        np.abs(res.log2_fold_change[ok]).mean()
    # the large majority of genes individually shrink
    frac = np.mean(np.abs(shr.log2_fold_change[ok]) <=
                   np.abs(res.log2_fold_change[ok]) + 1e-6)
    assert frac > 0.85
    # baseMean/pvalues carried over from the MLE results
    np.testing.assert_allclose(shr.base_mean, res.base_mean)


@pytest.mark.parametrize("type", ["apeglm", "ashr"])
def test_strong_effects_survive(fitted, type):
    dds, res = fitted
    shr = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type=type)
    strong = np.isfinite(res.pvalue) & (res.pvalue < 1e-6) & \
        (res.base_mean > 20)
    if strong.sum() < 3:
        pytest.skip("no strong effects in fixture")
    # sign preserved and magnitude not collapsed for strong signals
    assert np.all(np.sign(shr.log2_fold_change[strong]) ==
                  np.sign(res.log2_fold_change[strong]))
    assert np.all(np.abs(shr.log2_fold_change[strong]) >
                  0.5 * np.abs(res.log2_fold_change[strong]))


def test_apeglm_recovers_true_beta(fitted):
    dds, res = fitted
    shr = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type="apeglm")
    true_beta = dds.row_data["trueBeta"]
    ok = np.isfinite(shr.log2_fold_change)
    # shrunk estimator has smaller MSE against truth than the MLE
    mse_shr = np.mean((shr.log2_fold_change[ok] - true_beta[ok]) ** 2)
    mse_mle = np.mean((res.log2_fold_change[ok] - true_beta[ok]) ** 2)
    assert mse_shr < mse_mle


def test_svalues(fitted):
    dds, res = fitted
    shr = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type="apeglm",
                     svalue=True)
    assert shr.svalue is not None
    sv = shr.svalue[np.isfinite(shr.svalue)]
    assert np.all((sv >= 0) & (sv <= 1))
    # s-values are a cumulative mean of sorted lfsr -> monotone vs lfsr rank
    assert shr.pvalue is None


def test_lfc_threshold_fsos(fitted):
    dds, res = fitted
    shr = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type="apeglm",
                     lfc_threshold=1.0)
    assert shr.svalue is not None
    # genes with tiny shrunk LFC have high FSOS s-values
    small = np.abs(shr.log2_fold_change) < 0.1
    if small.sum() > 3:
        assert np.nanmean(shr.svalue[small]) > 0.5


def test_coef_forms(fitted):
    dds, res = fitted
    a = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type="ashr")
    # numeric coef is 1-based as in the reference: coef=2 is the first
    # non-intercept coefficient
    b = lfc_shrink(dds, coef=2, res=res, type="ashr")
    np.testing.assert_allclose(a.log2_fold_change, b.log2_fold_change,
                               equal_nan=True)
    import pytest
    with pytest.raises(ValueError, match="1-based"):
        lfc_shrink(dds, coef=0, res=res, type="ashr")


def test_apeglm_requires_coef(fitted):
    dds, res = fitted
    with pytest.raises(ValueError):
        lfc_shrink(dds, contrast=("condition", "B", "A"), res=res,
                   type="apeglm")


def test_normal_via_contrast(fitted):
    dds, res = fitted
    shr = lfc_shrink(dds, contrast=("condition", "B", "A"), res=res,
                     type="normal")
    ok = np.isfinite(shr.log2_fold_change)
    assert np.abs(shr.log2_fold_change[ok]).mean() < \
        np.abs(res.log2_fold_change[ok]).mean()


def test_apeglm_behavioral_contract():
    """apeglm-style shrinkage behavioral invariants (Zhu et al. 2018):
    large well-supported LFCs are preserved, small/noisy LFCs shrink
    toward zero, and the posterior mode lies between 0 and the MLE."""
    dds = make_example_dataset(n=400, m=10, beta_sd=1.5, seed=31)
    dds = deseq(dds)
    res = results(dds)
    shr = lfc_shrink(dds, coef="condition_B_vs_A", res=res, type="apeglm")
    mle = np.asarray(res.log2_fold_change, float)
    map_ = np.asarray(shr.log2_fold_change, float)
    se = np.asarray(res.lfc_se, float)
    ok = np.isfinite(mle) & np.isfinite(map_) & np.isfinite(se)
    # posterior mode between 0 and the MLE (allow epsilon for the
    # mode of the joint fit moving other coefficients slightly)
    between = (np.sign(map_[ok]) * np.sign(mle[ok]) >= 0) & \
        (np.abs(map_[ok]) <= np.abs(mle[ok]) + 0.05)
    assert between.mean() > 0.97
    # strong signals (|stat| > 6) keep >=70% of their LFC
    strong = ok & (np.abs(mle / se) > 6)
    if strong.sum() > 3:
        keep = np.abs(map_[strong]) / np.abs(mle[strong])
        assert np.median(keep) > 0.7
    # noisy estimates (|stat| < 1) shrink markedly more than strong
    # ones (the Cauchy is heavy-tailed, so absolute shrinkage of noisy
    # genes is milder than a normal prior's — compare ratios instead)
    noisy = ok & (np.abs(mle / se) < 1) & (np.abs(mle) > 0.1)
    if noisy.sum() > 3 and strong.sum() > 3:
        shrunk = np.abs(map_[noisy]) / np.abs(mle[noisy])
        assert np.median(shrunk) < np.median(keep) - 0.1
        assert np.median(shrunk) < 0.85


def test_normal_fused_route_matches_host(fitted, monkeypatch):
    """lfc_shrink(type='normal', contrast=...) through the fused
    betaPrior pipeline equals the host two-pass refit (VERDICT r4
    item 4)."""
    dds, res = fitted
    monkeypatch.setenv("DESEQ2_TPU_ENGINE", "host")
    host = lfc_shrink(dds, contrast=("condition", "B", "A"),
                      res=res, type="normal")
    monkeypatch.setenv("DESEQ2_TPU_ENGINE", "fused")
    fused = lfc_shrink(dds, contrast=("condition", "B", "A"),
                       res=res, type="normal")
    for k in ("log2FoldChange", "lfcSE", "stat", "pvalue", "padj"):
        a = np.asarray(host[k], float)
        b = np.asarray(fused[k], float)
        assert np.array_equal(np.isnan(a), np.isnan(b)), k
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=1e-6, atol=1e-9,
                                   err_msg=k)
    np.testing.assert_allclose(
        np.asarray(host.prior_info["betaPriorVar"], float),
        np.asarray(fused.prior_info["betaPriorVar"], float), rtol=1e-6)


def test_normal_fused_route_matches_host_with_replacement(monkeypatch):
    """The light fused route stays exact when count outliers were
    replaced: it consumes the stored post-replacement dispersions and
    the original counts, exactly like the host refit."""
    from deseq2_tpu import make_example_dataset as mk
    dds = mk(n=250, m=16, beta_sd=1.0, seed=9)
    c = np.asarray(dds.counts).copy()
    rng = np.random.default_rng(4)
    for i in rng.choice(250, 6, replace=False):
        c[i, int(rng.integers(16))] = int(c[i].mean() * 40 + 500)
    dds.counts[:] = c
    fit = deseq(dds)
    assert np.nansum(fit.row_data.get("replace")) > 0
    res = results(fit)
    monkeypatch.setenv("DESEQ2_TPU_ENGINE", "host")
    host = lfc_shrink(fit, contrast=("condition", "B", "A"),
                      res=res, type="normal")
    monkeypatch.setenv("DESEQ2_TPU_ENGINE", "fused")
    fused = lfc_shrink(fit, contrast=("condition", "B", "A"),
                       res=res, type="normal")
    for k in ("log2FoldChange", "lfcSE"):
        a = np.asarray(host[k], float)
        b = np.asarray(fused[k], float)
        assert np.array_equal(np.isnan(a), np.isnan(b)), k
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=1e-6, atol=1e-9,
                                   err_msg=k)
