"""Single-cell streamed pipeline == host-exact path on small shapes.

fused_sc_pipeline never materializes (G,S) intermediates (scan over
sample chunks, (G,C) group-mean state); on small inputs its columns
must match the host deseq() stored columns exactly (CPU f64).
"""

import numpy as np
import pytest

import deseq2_tpu as dt
from deseq2_tpu.parallel.sc import fused_sc_pipeline


def _cmp(a, b, name, rtol=1e-6, atol=1e-9):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    assert np.array_equal(np.isnan(a), np.isnan(b)), \
        f"{name}: NaN pattern differs"
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=rtol, atol=atol,
                               err_msg=name)


@pytest.fixture(scope="module")
def host_and_sc():
    import jax.numpy as jnp
    dds = dt.make_example_dataset(n=300, m=20, beta_sd=1.0, seed=21)
    dds = dt.deseq(dds, min_replicates_for_replace=np.inf)
    cond = dds.col_data["condition"]
    cells = np.asarray(cond.codes, np.int32)
    grid = np.linspace(np.log(1e-8), np.log(max(10.0, 20)), 20)
    out = fused_sc_pipeline(jnp.asarray(np.asarray(dds.counts)),
                            jnp.asarray(cells),
                            jnp.asarray(dds.size_factors),
                            jnp.asarray(grid), n_groups=2,
                            min_mu=0.5, chunk=7)  # chunk !| S: pad path
    return dds, {k: np.asarray(v) for k, v in out.items()}


def test_sc_dispersions(host_and_sc):
    dds, out = host_and_sc
    _cmp(dds.row_data["baseMean"], out["baseMean"], "baseMean")
    _cmp(dds.row_data["dispGeneEst"], out["dispGeneEst"], "dispGeneEst")
    _cmp(dds.row_data["dispFit"], out["dispFit"], "dispFit")
    _cmp(dds.row_data["dispersion"], out["dispersion"], "dispersion")


def test_sc_wald(host_and_sc):
    dds, out = host_and_sc
    _cmp(dds.row_data["condition_B_vs_A"], out["beta"][:, -1], "LFC")
    _cmp(dds.row_data["SE_condition_B_vs_A"], out["betaSE"][:, -1], "SE")
    _cmp(dds.row_data["WaldPvalue_condition_B_vs_A"],
         out["pvalue"][:, -1], "pvalue")


def test_sc_three_groups():
    """C=3 group design, minmu=1e-6 single-cell default runs clean."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    G, S, C = 200, 30, 3
    cells = np.repeat(np.arange(C, dtype=np.int32), S // C)
    mu0 = 2.0 ** rng.normal(4, 2, G)
    lfc = rng.normal(0, 1, (G, C)) * 0.5
    mu = mu0[:, None] * 2.0 ** lfc[:, cells]
    disp = 4.0 / mu0 + 0.1
    size = 1.0 / disp[:, None]
    counts = rng.negative_binomial(size, size / (size + mu)).astype(
        np.int32)
    grid = np.linspace(np.log(1e-8), np.log(30.0), 20)
    out = fused_sc_pipeline(jnp.asarray(counts), jnp.asarray(cells),
                            jnp.asarray(np.ones(S)), jnp.asarray(grid),
                            n_groups=3)
    nz = ~np.asarray(out["allZero"])
    assert np.isfinite(np.asarray(out["dispersion"])[nz]).all()
    assert np.isfinite(np.asarray(out["pvalue"])[nz]).all()
    assert np.asarray(out["betaConv"])[nz].mean() > 0.95


@pytest.fixture(scope="module")
def host_gampoi_and_sc():
    """Host glmGamPoi QL path vs streamed fused_sc_results on small
    shapes (the SC-scale QL contract, R/core.R:1064-1096, 1898-1947)."""
    from deseq2_tpu.parallel.sc import fused_sc_results
    dds = dt.make_example_dataset(n=300, m=20, beta_sd=1.0, seed=31)
    dds = dt.deseq(dds, test="LRT", reduced="~ 1", fit_type="glmGamPoi")
    res = dt.results(dds)
    cells = np.asarray(dds.col_data["condition"].codes, np.int32)
    out = fused_sc_results(np.asarray(dds.counts), cells,
                           dds.size_factors, n_groups=2, chunk=7,
                           test="LRT", fit_type="glmGamPoi")
    return dds, res, out


def test_sc_ql_dispersions(host_gampoi_and_sc):
    dds, res, out = host_gampoi_and_sc
    _cmp(dds.row_data["dispGeneEst"], out["dispGeneEst"], "dispGeneEst")
    _cmp(dds.row_data["dispFit"], out["dispFit"], "loc_median dispFit")
    _cmp(dds.row_data["qlDispMLE"], out["qlDispMLE"], "qlDispMLE")
    _cmp(dds.row_data["qlDispFit"], out["qlDispFit"], "qlDispFit")
    _cmp(dds.row_data["qlDispMAP"], out["qlDispMAP"], "qlDispMAP")
    _cmp(dds.row_data["dispersion"], out["dispersion"], "dispersion")
    assert out["ql_df0"] == pytest.approx(
        dds.attrs["quasiLikelihood_df0"], rel=1e-9)


def test_sc_ql_f_test(host_gampoi_and_sc):
    dds, res, out = host_gampoi_and_sc
    _cmp(dds.row_data["LRTStatistic"], out["LRTStatistic"], "F stat")
    _cmp(dds.row_data["LRTPvalue"], out["LRTPvalue"], "F pvalue")
    _cmp(res["pvalue"], out["pvalue"], "results pvalue")
    _cmp(res["padj"], out["padj"], "filtered padj")


def test_sc_parametric_lrt_matches_host():
    """Streamed chi-square LRT (parametric trend) == host nbinomLRT."""
    from deseq2_tpu.parallel.sc import fused_sc_results
    dds = dt.make_example_dataset(n=250, m=18, beta_sd=1.0, seed=32)
    dds = dt.deseq(dds, test="LRT", reduced="~ 1",
                   min_replicates_for_replace=np.inf)
    res = dt.results(dds)
    cells = np.asarray(dds.col_data["condition"].codes, np.int32)
    out = fused_sc_results(np.asarray(dds.counts), cells,
                           dds.size_factors, n_groups=2, min_mu=0.5,
                           test="LRT", fit_type="parametric")
    _cmp(dds.row_data["LRTStatistic"], out["LRTStatistic"], "LRT stat")
    _cmp(dds.row_data["LRTPvalue"], out["LRTPvalue"], "LRT pvalue")
    _cmp(res["padj"], out["padj"], "padj")


def test_sc_results_wald_matches_pipeline():
    """fused_sc_results(test='Wald') == fused_sc_pipeline columns +
    the filtering tail runs."""
    import jax.numpy as jnp
    from deseq2_tpu.parallel.sc import (fused_sc_pipeline,
                                        fused_sc_results)
    dds = dt.make_example_dataset(n=200, m=16, beta_sd=1.0, seed=33)
    dds = dt.estimate_size_factors(dds)
    cells = np.asarray(dds.col_data["condition"].codes, np.int32)
    grid = np.linspace(np.log(1e-8), np.log(16.0), 20)
    pipe = fused_sc_pipeline(jnp.asarray(np.asarray(dds.counts)),
                             jnp.asarray(cells),
                             jnp.asarray(dds.size_factors),
                             jnp.asarray(grid), n_groups=2)
    out = fused_sc_results(np.asarray(dds.counts), cells,
                           dds.size_factors, n_groups=2, test="Wald")
    _cmp(np.asarray(pipe["dispersion"]), out["dispersion"], "dispersion")
    _cmp(np.asarray(pipe["beta"]), out["beta"], "beta")
    _cmp(np.asarray(pipe["pvalue"])[:, -1], out["pvalue"], "pvalue")
    assert np.isfinite(out["padj"]).any()


def test_sc_mesh_matches_single_device():
    """fused_sc_results sharded over the 8-device CPU mesh ==
    single-device run (gene-axis sharding, QL mode)."""
    import jax
    from deseq2_tpu.parallel.sc import fused_sc_results
    from deseq2_tpu.parallel.sharding import gene_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dds = dt.make_example_dataset(n=203, m=20, beta_sd=1.0, seed=34)
    dds = dt.estimate_size_factors(dds)
    cells = np.asarray(dds.col_data["condition"].codes, np.int32)
    # real all-zero genes in the data: the mesh run pads 233 -> 240, and
    # both the padding AND these rows must stay out of the filtering
    # tail's zero-share/quantiles identically to the single-device run
    counts = np.vstack([np.asarray(dds.counts),
                        np.zeros((30, dds.counts.shape[1]), np.int64)])
    kw = dict(n_groups=2, chunk=7, test="LRT", fit_type="glmGamPoi")
    one = fused_sc_results(counts, cells, dds.size_factors, **kw)
    mesh = gene_mesh(8)
    shd = fused_sc_results(counts, cells, dds.size_factors, mesh=mesh, **kw)
    assert one["filterTheta"] == pytest.approx(shd["filterTheta"],
                                               rel=1e-12)
    np.testing.assert_allclose(one["filterNumRej"], shd["filterNumRej"])
    for k in ("dispGeneEst", "dispFit", "qlDispMAP", "dispersion",
              "LRTStatistic", "LRTPvalue", "padj"):
        _cmp(one[k], shd[k], f"mesh {k}", rtol=1e-10, atol=1e-12)


def test_sc_covariate_design_ql_matches_host():
    """VERDICT r3 item 3: ~ batch + condition at single-cell scale —
    fused_sc_results(design=, reduced_design=) streams an arbitrary
    small-p model matrix (mu = sf*exp(X beta), (G,p) persistent state)
    and matches the host glmGamPoi QL path column-for-column
    (R/core.R:789-816, 1898-1947)."""
    from deseq2_tpu.formula import Factor
    from deseq2_tpu.parallel.sc import fused_sc_results
    dds = dt.make_example_dataset(n=250, m=20, beta_sd=1.0, seed=17)
    dds.col_data["batch"] = Factor(np.array(["X", "Y"])[np.arange(20) % 2])
    dds.design = dt.parse_formula("~ batch + condition")
    dds = dt.estimate_size_factors(dds)
    mm_full, _ = dds.model_matrix()
    mm_red, _ = dds.model_matrix("~ batch")
    counts = np.asarray(dds.counts)
    h = dt.deseq(dds, test="LRT", reduced="~ batch",
                 fit_type="glmGamPoi")
    res = dt.results(h)
    o = fused_sc_results(counts, size_factors=dds.size_factors,
                         design=mm_full, reduced_design=mm_red,
                         test="LRT", fit_type="glmGamPoi", chunk=7)
    for k in ("dispGeneEst", "dispFit", "qlDispMAP", "dispersion",
              "LRTStatistic", "LRTPvalue"):
        _cmp(h.row_data[k], o[k], f"cov {k}")
    _cmp(res["padj"], o["padj"], "cov padj")


def test_sc_covariate_design_wald_and_mesh():
    """Covariate Wald (parametric) matches the host; the 8-device mesh
    matches single-device."""
    import jax
    from deseq2_tpu.formula import Factor
    from deseq2_tpu.parallel.sc import fused_sc_results
    dds = dt.make_example_dataset(n=181, m=20, beta_sd=1.0, seed=23)
    dds.col_data["batch"] = Factor(np.array(["X", "Y"])[np.arange(20) % 2])
    dds.design = dt.parse_formula("~ batch + condition")
    dds = dt.estimate_size_factors(dds)
    mm_full, _ = dds.model_matrix()
    counts = np.asarray(dds.counts)
    h = dt.deseq(dds, min_replicates_for_replace=np.inf)
    kw = dict(size_factors=dds.size_factors, design=mm_full,
              test="Wald", fit_type="parametric", min_mu=0.5, chunk=7)
    o = fused_sc_results(counts, **kw)
    _cmp(h.row_data["condition_B_vs_A"], o["beta"][:, -1], "cov LFC")
    _cmp(h.row_data["WaldPvalue_condition_B_vs_A"],
         o["pvalueMatrix"][:, -1], "cov wald p")
    if len(jax.devices()) >= 8:
        from deseq2_tpu.parallel.sharding import gene_mesh
        shd = fused_sc_results(counts, mesh=gene_mesh(8), **kw)
        for k in ("dispGeneEst", "dispersion", "pvalue", "padj"):
            _cmp(o[k], shd[k], f"cov mesh {k}", rtol=1e-9)


def test_sc_histogram_fast_path_exact():
    """Count-tail histogram line search (the f32 TPU throughput path:
    per-sample lgamma/digamma sums collapsed into HIST_K per-gene bins,
    overflow genes redone exactly) == the generic per-sample path, here
    verified in f64 where both are available."""
    import jax.numpy as jnp
    from deseq2_tpu.parallel import sc
    rng = np.random.default_rng(3)
    G, S = 400, 300
    cells = (np.arange(S) % 2).astype(np.int32)
    mu0 = np.maximum(2.0 ** rng.normal(-1.0, 2.0, G), 0.01)
    mu0[:10] = 200.0                       # guaranteed overflow genes
    disp = np.minimum(4.0 / mu0 + 0.3, 20.0)
    size = 1.0 / disp[:, None]
    counts = rng.negative_binomial(
        size, size / (size + mu0[:, None]), size=(G, S)).astype(np.int32)
    grid = np.linspace(np.log(1e-8), np.log(max(10.0, S)), 20)
    kw = dict(n_groups=2, maxit=100, min_disp_pow=-8, min_mu=1e-6,
              chunk=64, mesh=None)
    args = (jnp.asarray(counts), jnp.asarray(cells),
            jnp.asarray(np.ones(S)), jnp.asarray(grid))
    a = sc._sc_stage1(*args, **kw)
    n_ovf = int((counts.max(axis=1) >= sc.HIST_K).sum())
    assert n_ovf >= 10
    cap = 1 << (max(n_ovf, 16) - 1).bit_length()
    b = sc._sc_stage1(*args, use_hist=True, ovf_cap=cap, **kw)
    np.testing.assert_allclose(np.asarray(a["disp_gene_est"]),
                               np.asarray(b["disp_gene_est"]),
                               rtol=1e-10)
    # MAP stage too
    df = jnp.asarray(np.full(G, 0.4))
    m_a = sc._sc_stage_map(*args, a["q"], a["all_zero"],
                           a["disp_gene_est"], df, jnp.asarray(0.5), **kw)
    m_b = sc._sc_stage_map(*args, b["q"], b["all_zero"],
                           b["disp_gene_est"], df, jnp.asarray(0.5),
                           use_hist=True, ovf_cap=cap, **kw)
    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_b),
                               rtol=1e-10)


def test_sc_norm_factors_covariate_matches_host():
    """(G,S) normalization factors at single-cell scale (the
    tximport/avgTxLength contract) stream through the X-mode SC path —
    mu = nf[g,s]*exp(X beta), nf chunked exactly like the counts — and
    match the host glmGamPoi path column-for-column; also reachable
    through the public deseq() engine route."""
    from deseq2_tpu.formula import Factor
    from deseq2_tpu.parallel.sc import fused_sc_results
    dds = dt.make_example_dataset(n=220, m=20, beta_sd=1.0, seed=19)
    dds.col_data["batch"] = Factor(np.array(["X", "Y"])[np.arange(20) % 2])
    dds.design = dt.parse_formula("~ batch + condition")
    rng = np.random.default_rng(6)
    nf = np.exp(rng.normal(0, 0.2, dds.counts.shape))
    nf = nf / np.exp(np.mean(np.log(nf), axis=1))[:, None]
    dds.normalization_factors = nf
    h = dt.deseq(dds, test="LRT", reduced="~ batch",
                 fit_type="glmGamPoi", engine="host")
    res = dt.results(h)
    mm, _ = dds.model_matrix()
    mmr, _ = dds.model_matrix("~ batch")
    o = fused_sc_results(np.asarray(dds.counts),
                         size_factors=np.ones(20), design=mm,
                         reduced_design=mmr, norm_factors=nf,
                         test="LRT", fit_type="glmGamPoi", chunk=7)
    for k in ("baseMean", "dispGeneEst", "dispFit", "qlDispMAP",
              "dispersion", "LRTStatistic", "LRTPvalue"):
        _cmp(h.row_data[k], o[k], f"nf {k}")
    _cmp(res["padj"], o["padj"], "nf padj")
    # public API route
    f = dt.deseq(dds, test="LRT", reduced="~ batch",
                 fit_type="glmGamPoi", engine="fused")
    assert f.attrs["engine"] == "fused-sc"
    _cmp(res["padj"], np.asarray(dt.results(f)["padj"], float),
         "routed nf padj")
    # group factorization + nf stays host-side with a clear reason
    dds2 = dt.make_example_dataset(n=100, m=10, beta_sd=1.0, seed=3)
    nf2 = np.exp(np.random.default_rng(1).normal(0, 0.1,
                                                 dds2.counts.shape))
    dds2.normalization_factors = \
        nf2 / np.exp(np.mean(np.log(nf2), axis=1))[:, None]
    with pytest.raises(ValueError, match="group design with normal"):
        dt.deseq(dds2, test="LRT", reduced="~ 1", fit_type="glmGamPoi",
                 engine="fused")


def test_sc_mixed_dense_budget_exact(monkeypatch):
    """Mixed dense/row-gather cascades are exact: a budget that grants
    only SOME cascade levels dense straggler blocks (the _DenseLedger
    per-stage accounting, added after the 2025 libtpu HBM-at-compile
    change) must reproduce the all-dense and all-row-gather answers
    bit-for-bit — gather -> identical body -> scatter either way.

    maxit differs per call only to defeat the jit cache (the dense
    decision is trace-time Python, invisible to the cache key); all
    genes converge well before 100 trips so the answers are identical.
    """
    from deseq2_tpu.parallel import sc as sc_mod
    from deseq2_tpu.parallel.sc import fused_sc_results

    rng = np.random.default_rng(11)
    G, S = 6000, 200
    counts = rng.negative_binomial(2, 0.3, size=(G, S)).astype(np.int64)
    cells = rng.integers(0, 3, S).astype(np.int32)

    outs = []
    for budget, maxit in (("0", 100), ("1000000000", 101),
                          ("9000000", 102)):
        monkeypatch.setenv("DESEQ2_TPU_SC_DENSE_BUDGET", budget)
        outs.append(fused_sc_results(counts, cells=cells, n_groups=3,
                                     size_factors=np.ones(S),
                                     maxit=maxit))
    # the split budget must actually have granted at least one block
    # and refused at least one (otherwise the fixture stopped covering
    # the mixed mode and needs retuning)
    monkeypatch.setenv("DESEQ2_TPU_SC_DENSE_BUDGET", "9000000")
    sc_mod._DENSE.configure()
    assert sc_mod._DENSE.grant(8_388_608)       # 1024 x 2048 x 4
    assert not sc_mod._DENSE.grant(4_194_304)   # 512 x 2048 x 4
    for k in ("baseMean", "log2FoldChange", "pvalue", "padj",
              "dispersion", "dispGeneEst"):
        a = np.asarray(outs[0][k], float)
        for o in outs[1:]:
            b = np.asarray(o[k], float)
            np.testing.assert_allclose(a, b, rtol=0, atol=0,
                                       err_msg=k, equal_nan=True)
