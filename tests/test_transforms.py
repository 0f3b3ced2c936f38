"""VST / rlog / normTransform tests.

Modeled on the reference's test_vst.R / test_rlog.R: behavioral
invariants (variance stabilization, shrinkage toward the trend, frozen
re-application) rather than golden files.
"""

import numpy as np
import pytest

from deseq2_tpu import estimate_size_factors, make_example_dataset
from deseq2_tpu.transforms import (DESeqTransform, norm_transform, rlog,
                                   variance_stabilizing_transformation, vst)


@pytest.fixture(scope="module")
def dds():
    return make_example_dataset(n=400, m=12, beta_sd=0.7, seed=11)


def test_vst_closed_form(dds):
    vsd = variance_stabilizing_transformation(dds, blind=True)
    assert isinstance(vsd, DESeqTransform)
    assert vsd.matrix.shape == dds.counts.shape
    assert np.isfinite(vsd.matrix).all()
    # monotone in counts within each sample
    d = estimate_size_factors(dds)
    nc = d.counts_normalized()
    for j in range(3):
        order = np.argsort(nc[:, j])
        v = vsd.matrix[order, j]
        assert np.all(np.diff(v) >= -1e-8)


def test_vst_asymptotically_log2(dds):
    """For large counts the parametric VST has slope 1 on the log2 scale
    (R/vst.R closed form ~ log2(q) + const for q >> 1/asymptDisp)."""
    vsd = variance_stabilizing_transformation(dds, blind=True)
    d = estimate_size_factors(dds)
    nc = d.counts_normalized().mean(axis=1)
    big = nc > 200
    assert big.sum() > 10
    # regression slope of mean VST on log2 mean counts ~ 1 for large counts
    x = np.log2(nc[big])
    y = vsd.matrix[big].mean(axis=1)
    slope = np.polyfit(x, y, 1)[0]
    assert abs(slope - 1.0) < 0.1


def test_vst_mean_fit_type(dds):
    vsd = variance_stabilizing_transformation(dds, blind=True,
                                              fit_type="mean")
    assert np.isfinite(vsd.matrix).all()


def test_vst_local_fit_type(dds):
    vsd = variance_stabilizing_transformation(dds, blind=True,
                                              fit_type="local")
    assert np.isfinite(vsd.matrix).all()


def test_vst_fast_subset():
    dds = make_example_dataset(n=1200, m=10, intercept_mean=6.0,
                               intercept_sd=1.0, seed=3)
    vsd_fast = vst(dds, nsub=1000)
    vsd_full = variance_stabilizing_transformation(dds, blind=True)
    # the subset trend approximates the full trend
    mask = np.isfinite(vsd_fast.matrix) & np.isfinite(vsd_full.matrix)
    assert np.corrcoef(vsd_fast.matrix[mask].ravel(),
                       vsd_full.matrix[mask].ravel())[0, 1] > 0.999


def test_norm_transform(dds):
    nt = norm_transform(dds)
    d = estimate_size_factors(dds)
    np.testing.assert_allclose(nt.matrix,
                               np.log2(d.counts_normalized() + 1))


def test_rlog_shrinks_low_counts():
    dds = make_example_dataset(n=200, m=8, beta_sd=1.0, seed=5)
    rld = rlog(dds, blind=True)
    assert rld.matrix.shape == dds.counts.shape
    assert np.isfinite(rld.matrix).all()
    d = estimate_size_factors(dds)
    log_nc = np.log2(d.counts_normalized() + 0.5)
    # per-gene sample variance of rlog values is <= that of log counts
    # for the vast majority of genes (shrinkage toward the fitted mean)
    var_rlog = rld.matrix.var(axis=1)
    var_log = log_nc.var(axis=1)
    assert np.mean(var_rlog <= var_log + 1e-8) > 0.9
    # high-count genes barely shrunk: rlog ~ log2 norm counts
    bm = d.counts_normalized().mean(axis=1)
    big = bm > 200
    if big.sum() > 5:
        resid = rld.matrix[big] - log_nc[big]
        assert np.abs(resid).mean() < 0.2


def test_rlog_frozen_intercept():
    """Frozen re-application: rlog with a saved intercept + prior var
    reproduces the transform on the same data (R/rlog.R:51-58)."""
    dds = make_example_dataset(n=150, m=6, seed=9)
    rld = rlog(dds, blind=True)
    intercept = rld.attrs["rlogIntercept"]
    bpv = rld.attrs["betaPriorVar"]
    from deseq2_tpu.dispersions import (estimate_dispersions_fit,
                                        estimate_dispersions_gene_est)
    from deseq2_tpu.formula import parse_formula
    d2 = estimate_size_factors(dds)
    d2.design = parse_formula("~ 1")
    d2 = estimate_dispersions_gene_est(d2, quiet=True)
    d2 = estimate_dispersions_fit(d2, quiet=True)
    rld2 = rlog(d2, blind=False, intercept=intercept, beta_prior_var=bpv)
    mask = np.isfinite(rld.matrix)
    np.testing.assert_allclose(rld2.matrix[mask], rld.matrix[mask],
                               atol=0.15)


def test_rlog_all_zero_rows():
    dds = make_example_dataset(n=120, m=6, seed=2)
    dds.counts[5] = 0
    rld = rlog(dds, blind=True)
    np.testing.assert_array_equal(rld.matrix[5], 0.0)


def test_rlog_arrow_equals_dense_solver():
    """The O(S) arrow-structured rlog IRLS reaches the same penalized
    optimum as the generic dense (S+1)-column fitBeta path."""
    from deseq2_tpu.glm import fit_nbinom_glms
    from deseq2_tpu.transforms import _rlog_arrow_irls
    from deseq2_tpu import (estimate_dispersions_fit,
                            estimate_dispersions_gene_est)
    dds = make_example_dataset(n=80, m=10, seed=9)
    dds = estimate_size_factors(dds)
    dds = estimate_dispersions_gene_est(dds)
    dds = estimate_dispersions_fit(dds)
    nz = ~dds.row_data["allZero"]
    obj = dds.subset_genes(nz)
    S = obj.n_samples
    mm = np.column_stack([np.ones(S), np.eye(S)])
    names = ["Intercept"] + [f"samples{j+1}" for j in range(S)]
    pv = 0.5
    lam = np.full(S + 1, 1.0 / pv)
    lam[0] = 1e-6
    fit = fit_nbinom_glms(obj, model_matrix=mm, model_matrix_names=names,
                          lam=lam, rename_cols=False,
                          alpha_hat=obj.row_data["dispFit"],
                          beta_tol=1e-4, use_optim=False, use_qr=True)
    dense = fit["beta_matrix"] @ mm.T          # log2 fitted values
    xbeta, b0, _ = _rlog_arrow_irls(
        obj.counts, obj.size_or_norm_factors(), obj.row_data["dispFit"],
        1e-6 / np.log(2.0) ** 2, (1.0 / pv) / np.log(2.0) ** 2, True)
    arrow = np.log2(np.e) * xbeta
    np.testing.assert_allclose(arrow, dense, rtol=1e-4, atol=1e-4)


def test_rlog_scales_to_many_samples():
    """rlog at S=400 completes quickly (was O(S^3)/gene before)."""
    import time
    dds = make_example_dataset(n=200, m=400, seed=10)
    t0 = time.perf_counter()
    tr = rlog(dds)
    dt = time.perf_counter() - t0
    assert np.isfinite(tr.matrix).all()
    assert dt < 60.0


def test_device_paths_match_host(dds, monkeypatch):
    """The accelerator transform paths (device VST closed form, device
    rlog arrow IRLS + prior-variance quantile, device base stats,
    fused gene-est/trend route) must agree with the host f64 paths.
    On the CPU test backend the device gate is off; force it on — the
    same jnp code runs on CPU — and compare at f32-level tolerance."""
    import deseq2_tpu.transforms as tf

    host_v = variance_stabilizing_transformation(dds, blind=True)
    host_r = rlog(dds, blind=True)

    monkeypatch.setattr(tf, "_use_device", lambda d: True)
    dev_v = variance_stabilizing_transformation(dds, blind=True)
    dev_r = rlog(dds, blind=True)

    assert not isinstance(dev_v.matrix_device, np.ndarray)  # stayed lazy
    np.testing.assert_allclose(dev_v.matrix, host_v.matrix,
                               rtol=2e-3, atol=2e-3)
    # rlog: same prior variance family and close matrices (f32 IRLS
    # landing + f32 quantile vs f64)
    np.testing.assert_allclose(dev_r.attrs["betaPriorVar"],
                               host_r.attrs["betaPriorVar"], rtol=5e-3)
    np.testing.assert_allclose(dev_r.matrix, host_r.matrix,
                               rtol=5e-3, atol=5e-2)


def test_base_stats_dev_matches_host(dds):
    import deseq2_tpu.transforms as tf
    from deseq2_tpu.dispersions import get_base_means_and_variances

    d = estimate_size_factors(dds)
    bm, bv, az = tf._base_stats_dev(d)
    h = get_base_means_and_variances(d)
    np.testing.assert_allclose(bm, h.row_data["baseMean"], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(bv, h.row_data["baseVar"], rtol=1e-4,
                               atol=1e-3)
    assert np.array_equal(az, h.row_data["allZero"])


def test_rlog_prior_var_dev_matches_host(dds):
    import deseq2_tpu.transforms as tf
    from deseq2_tpu.dispersions import (estimate_dispersions_fit,
                                        estimate_dispersions_gene_est)
    from deseq2_tpu.quantiles import \
        match_weighted_upper_quantile_for_variance

    d = estimate_size_factors(dds)
    d = estimate_dispersions_gene_est(d, quiet=True)
    d = estimate_dispersions_fit(d, quiet=True)
    nz = ~d.row_data["allZero"]
    obj_nz = d.subset_genes(nz)
    log_counts = np.log2(obj_nz.counts_normalized() + 0.5)
    lfc = log_counts - np.log2(obj_nz.row_data["baseMean"] + 0.5)[:, None]
    w = 1.0 / (1.0 / obj_nz.row_data["baseMean"]
               + obj_nz.row_data["dispFit"])
    host = match_weighted_upper_quantile_for_variance(
        lfc.ravel(order="F"), np.tile(w, obj_nz.n_samples))
    dev = tf._rlog_prior_var_dev(d, np.asarray(nz))
    np.testing.assert_allclose(dev, host, rtol=5e-3)
