"""Public-API fused engine routing (VERDICT r3 item 1).

deseq(engine="fused") must populate the dataset column-for-column
identically to the host-exact path (same names, descriptions, assays,
attrs) so that results()/summary() work unchanged, and deseq(engine=
"auto") must fall back to the host path transparently for ineligible
configurations.  Reference: one DESeq() entry point, R/core.R:280-432.
"""

import numpy as np
import pytest

import deseq2_tpu as dt


def _cmp_dds(h, f, rtol=1e-9, atol=1e-12, skip=()):
    assert set(h.row_data) == set(f.row_data), \
        set(h.row_data) ^ set(f.row_data)
    assert h.row_meta == f.row_meta          # types AND descriptions
    for k in sorted(h.row_data):
        if k in skip:
            continue
        va, vb = np.asarray(h.row_data[k]), np.asarray(f.row_data[k])
        if va.dtype.kind == "b":
            assert np.array_equal(va, vb), k
            continue
        va = va.astype(float)
        vb = vb.astype(float)
        assert np.array_equal(np.isnan(va), np.isnan(vb)), k
        m = ~np.isnan(va)
        np.testing.assert_allclose(va[m], vb[m], rtol=rtol, atol=atol,
                                   err_msg=k)


def _cmp_results(rh, rf, rtol=1e-9):
    for k in ("baseMean", "log2FoldChange", "lfcSE", "stat", "pvalue",
              "padj"):
        a = np.asarray(rh[k], float)
        b = np.asarray(rf[k], float)
        assert np.array_equal(np.isnan(a), np.isnan(b)), k
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], rtol=rtol, atol=1e-12,
                                   err_msg=k)


def test_engine_wald_default():
    dds = dt.make_example_dataset(n=400, m=12, beta_sd=1.0, seed=42)
    h = dt.deseq(dds, engine="host")
    f = dt.deseq(dds, engine="fused")
    _cmp_dds(h, f)
    assert f.attrs["engine"] == "fused"
    assert h.results_names() == f.results_names()
    _cmp_results(dt.results(h), dt.results(f))
    # summary() works on the fused-routed object
    assert "nonzero total read count" in dt.results(f).summary(quiet=True)


def test_engine_lrt():
    dds = dt.make_example_dataset(n=300, m=12, beta_sd=1.0, seed=5)
    h = dt.deseq(dds, test="LRT", reduced="~ 1", engine="host")
    f = dt.deseq(dds, test="LRT", reduced="~ 1", engine="fused")
    _cmp_dds(h, f)
    _cmp_results(dt.results(h), dt.results(f))


def test_engine_beta_prior():
    dds = dt.make_example_dataset(n=300, m=12, beta_sd=1.0, seed=5)
    h = dt.deseq(dds, beta_prior=True, engine="host")
    f = dt.deseq(dds, beta_prior=True, engine="fused")
    _cmp_dds(h, f, rtol=1e-8)
    np.testing.assert_allclose(h.attrs["betaPriorVar"],
                               f.attrs["betaPriorVar"], rtol=1e-9)
    _cmp_results(dt.results(h), dt.results(f), rtol=1e-8)
    # addMLE pulls the MLE_ columns written by the fused route
    r = dt.results(f, contrast=("condition", "B", "A"), add_mle=True)
    assert np.isfinite(r["lfcMLE"]).any()


def test_engine_use_t_and_weights():
    dds = dt.make_example_dataset(n=200, m=10, beta_sd=1.0, seed=9)
    h = dt.deseq(dds, use_t=True, engine="host")
    f = dt.deseq(dds, use_t=True, engine="fused")
    _cmp_dds(h, f)
    rng = np.random.default_rng(2)
    dds.assays["weights"] = np.clip(rng.random((200, 10)) + 0.3, 0, 1)
    hw = dt.deseq(dds, engine="host")
    fw = dt.deseq(dds, engine="fused")
    # weighted fits are decision-equivalent (line-search stopping noise,
    # see test_fused_exact), not bit-identical
    _cmp_dds(hw, fw, rtol=1e-4, skip=("dispGeneIter", "dispIter",
                                      "betaIter"))


def test_engine_outlier_refit_and_contrast_reentry():
    dds = dt.make_example_dataset(n=300, m=14, beta_sd=1.0, seed=7)
    c = np.asarray(dds.counts).copy()
    rng = np.random.default_rng(3)
    for i in rng.choice(300, 8, replace=False):
        c[i, int(rng.integers(14))] = int(c[i].mean() * 40 + 500)
    dds.counts[:] = c
    h = dt.deseq(dds, engine="host")
    f = dt.deseq(dds, engine="fused")
    _cmp_dds(h, f)
    assert np.array_equal(
        np.asarray(h.assays["replaceCounts"]),
        np.asarray(f.assays["replaceCounts"], dtype=np.int64))
    _cmp_results(dt.results(h), dt.results(f))
    # novel numeric contrast re-enters the maxit=0 kernel with the
    # fused-populated state (getContrast, R/results.R:760-827)
    rh = dt.results(h, contrast=np.array([0.0, 1.0]))
    rf = dt.results(f, contrast=np.array([0.0, 1.0]))
    _cmp_results(rh, rf, rtol=1e-8)


def test_engine_norm_factors():
    dds = dt.make_example_dataset(n=250, m=12, beta_sd=1.0, seed=11)
    nf = np.exp(np.random.default_rng(5).normal(0, 0.2, dds.counts.shape))
    nf = nf / np.exp(np.mean(np.log(nf), axis=1))[:, None]
    dds.normalization_factors = nf
    h = dt.deseq(dds, engine="host")
    f = dt.deseq(dds, engine="fused")
    _cmp_dds(h, f, rtol=1e-7)


def test_engine_estimates_size_factors_on_device():
    dds = dt.make_example_dataset(n=300, m=12, beta_sd=1.0, seed=3)
    f = dt.deseq(dds, engine="fused")
    h = dt.estimate_size_factors(dds)
    np.testing.assert_allclose(f.size_factors, h.size_factors,
                               rtol=1e-12)


def test_engine_fallback_and_forcing():
    dds = dt.make_example_dataset(n=120, m=8, beta_sd=1.0, seed=2)
    # ineligible: glmGamPoi + Wald (the reference warns against it) ->
    # forced fused raises with the reason
    with pytest.raises(ValueError, match="engine='fused' unavailable"):
        dt.deseq(dds, fit_type="glmGamPoi", engine="fused")
    # auto falls back transparently (host path result)
    f = dt.deseq(dds, fit_type="glmGamPoi", engine="auto")
    assert f.attrs.get("engine") is None
    # non-default config falls back too
    cfgd = dt.DESeqConfig(maxit_beta=50)
    with pytest.raises(ValueError, match="config"):
        dt.deseq(dds, config=cfgd, engine="fused")
    # bad engine string
    with pytest.raises(ValueError, match="engine"):
        dt.deseq(dds, engine="warp")


def test_engine_mesh_matches_single():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from deseq2_tpu.parallel.sharding import gene_mesh
    dds = dt.make_example_dataset(n=203, m=12, beta_sd=1.0, seed=21)
    one = dt.deseq(dds, engine="fused")
    shd = dt.deseq(dds, engine="fused", mesh=gene_mesh(8))
    _cmp_dds(one, shd, rtol=1e-10)
    _cmp_results(dt.results(one), dt.results(shd), rtol=1e-10)


def test_engine_local_and_mean_trend():
    dds = dt.make_example_dataset(n=300, m=12, beta_sd=1.0, seed=5)
    for ft in ("local", "mean"):
        h = dt.deseq(dds, fit_type=ft, engine="host")
        f = dt.deseq(dds, fit_type=ft, engine="fused")
        _cmp_dds(h, f, rtol=1e-6, atol=1e-10)
        _cmp_results(dt.results(h), dt.results(f), rtol=1e-6)
        assert f.dispersion_function.fit_type == ft


def test_engine_glmgampoi_sc_route():
    """deseq(fit_type='glmGamPoi', test='LRT') routes through the
    streamed single-cell pipeline (one entry point for the SC story
    too) and populates the host glmGamPoi columns identically —
    group designs via the exact-linearMu group factorization,
    covariate designs via the X-streamed path."""
    dds = dt.make_example_dataset(n=300, m=20, beta_sd=1.0, seed=31)
    h = dt.deseq(dds, test="LRT", reduced="~ 1", fit_type="glmGamPoi",
                 engine="host")
    f = dt.deseq(dds, test="LRT", reduced="~ 1", fit_type="glmGamPoi",
                 engine="fused")
    assert f.attrs["engine"] == "fused-sc"
    _cmp_dds(h, f, rtol=1e-6, atol=1e-9)
    assert f.attrs["quasiLikelihood_df0"] == pytest.approx(
        h.attrs["quasiLikelihood_df0"], rel=1e-9)
    _cmp_results(dt.results(h), dt.results(f), rtol=1e-6)

    from deseq2_tpu.formula import Factor
    dds2 = dt.make_example_dataset(n=250, m=20, beta_sd=1.0, seed=17)
    dds2.col_data["batch"] = Factor(
        np.array(["X", "Y"])[np.arange(20) % 2])
    dds2.design = dt.parse_formula("~ batch + condition")
    h2 = dt.deseq(dds2, test="LRT", reduced="~ batch",
                  fit_type="glmGamPoi", engine="host")
    f2 = dt.deseq(dds2, test="LRT", reduced="~ batch",
                  fit_type="glmGamPoi", engine="fused")
    # dispGeneIter: iteration-count diagnostic; a single gene lands via
    # a different accept path on the X-streamed search (values match)
    _cmp_dds(h2, f2, rtol=1e-6, atol=1e-9, skip=("dispGeneIter",))
    _cmp_results(dt.results(h2), dt.results(f2), rtol=1e-6)
    # glmGamPoi + Wald stays ineligible (reference warns against it)
    with pytest.raises(ValueError, match="unavailable"):
        dt.deseq(dds, fit_type="glmGamPoi", engine="fused")


def test_engine_upload_cache_sees_mutations():
    """The device-placement cache must never serve stale counts: an
    in-place single-element mutation changes the full-pass checksum and
    forces a re-upload."""
    dds = dt.make_example_dataset(n=150, m=10, beta_sd=1.0, seed=13)
    f1 = dt.deseq(dds, engine="fused")
    dds.counts[3, 4] += 500          # in-place edit, same buffer
    f2 = dt.deseq(dds, engine="fused")
    h2 = dt.deseq(dds, engine="host")
    np.testing.assert_allclose(
        np.asarray(f2.row_data["baseMean"], float),
        np.asarray(h2.row_data["baseMean"], float), rtol=1e-9)
    assert not np.allclose(np.asarray(f1.row_data["baseMean"], float),
                           np.asarray(f2.row_data["baseMean"], float))


def test_engine_results_fast_path_metadata_and_fallback():
    """The default results() call on a fused-routed object is served
    from the device-computed tail (engine stashes it as _fused_tail);
    its filtering metadata and every column must match the host flow,
    and any non-default argument must fall back to the host-exact
    flow on the same object."""
    dds = dt.make_example_dataset(n=400, m=12, beta_sd=1.0, seed=21)
    h = dt.deseq(dds, engine="host")
    f = dt.deseq(dds, engine="fused")
    assert getattr(f, "_fused_tail", None) is not None
    rh, rf = dt.results(h), dt.results(f)
    _cmp_results(rh, rf)
    assert rf.metadata["filterTheta"] == pytest.approx(
        rh.metadata["filterTheta"])
    assert rf.metadata["filterThreshold"] == pytest.approx(
        rh.metadata["filterThreshold"])
    np.testing.assert_allclose(rf.metadata["filterNumRej"]["numRej"],
                               rh.metadata["filterNumRej"]["numRej"])
    assert rf.descriptions["log2FoldChange"] == \
        rh.descriptions["log2FoldChange"]
    # non-default arguments bypass the tail and still agree
    for kw in (dict(alpha=0.05), dict(independent_filtering=False),
               dict(lfc_threshold=0.5), dict(cooks_cutoff=False),
               dict(name="Intercept")):
        _cmp_results(dt.results(h, **kw), dt.results(f, **kw))
    # a host re-test on a copy drops the tail (no stale serving)
    f2 = f.copy()
    assert getattr(f2, "_fused_tail", None) is None


def test_engine_lazy_row_data_batches_fetch():
    """Diagnostic columns after a fused run materialize on first touch
    and match eager values; dict protocol (items/pop/contains) works."""
    dds = dt.make_example_dataset(n=200, m=10, beta_sd=1.0, seed=8)
    f = dt.deseq(dds, engine="fused")
    assert "dispGeneEst" in f.row_data          # no materialization
    v = f.row_data["dispGeneEst"]               # first touch
    assert isinstance(v, np.ndarray)
    items = dict(f.row_data.items())
    assert isinstance(items["deviance"], np.ndarray)
    h = dt.deseq(dds, engine="host")
    np.testing.assert_allclose(
        np.asarray(f.row_data["deviance"], float),
        np.asarray(h.row_data["deviance"], float), rtol=1e-9)
