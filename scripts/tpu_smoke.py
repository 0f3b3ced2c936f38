"""Real-TPU smoke matrix: run every public code path at tiny shapes on
the actual chip.

The CPU test suite (8-virtual-device mesh, f64) cannot see TPU-only
failures: Mosaic kernel compile errors (e.g. the round-5 p=1
"only constant accumulators supported" crash on intercept-only
designs), f32-path numerical blowups, or backend-specific layout
issues.  This script sweeps the public API surface — deseq() configs,
results() variants, lfcShrink types, transforms, single-cell modes,
helpers — at shapes small enough that each case compiles in seconds,
and reports one PASS/FAIL line per case.

Run on hardware (the axon backend must be the default):

    python scripts/tpu_smoke.py            # f32 fast path (production TPU config)
    DESEQ2_TPU_X64=1 python scripts/tpu_smoke.py   # emulated f64 (slow)

Exit status is the number of failed cases.  Mirrors the reference's
practice of exercising every branch in tests/testthat at token sizes
(e.g. tests/testthat/test_DESeq.R) — but on the accelerator, where our
failure modes live.
"""
import os
import sys
import time
import traceback

os.environ.setdefault("DESEQ2_TPU_X64", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

import deseq2_tpu as d2  # noqa: E402
from deseq2_tpu.formula import parse_formula  # noqa: E402
from deseq2_tpu.parallel.sc import fused_sc_results  # noqa: E402
from deseq2_tpu import plots  # noqa: E402

RESULTS = []


def case(name):
    def deco(fn):
        RESULTS.append((name, fn))
        return fn
    return deco


def _dds(n=120, m=12, seed=42, **kw):
    return d2.make_example_dataset(n=n, m=m, beta_sd=1.0, seed=seed, **kw)


def _finite_frac(res):
    return float(np.isfinite(np.asarray(res["pvalue"], float)).mean())


# ---------------------------------------------------------------- bulk deseq
@case("wald_default")
def _():
    dds = _dds()
    dds = d2.deseq(dds)
    res = d2.results(dds)
    assert _finite_frac(res) > 0.5, "mostly-NaN p-values"


@case("wald_beta_prior")
def _():
    dds = d2.deseq(_dds(), beta_prior=True)
    d2.results(dds)


@case("lrt_reduced_intercept")
def _():
    dds = d2.deseq(_dds(), test="LRT", reduced="~ 1")
    res = d2.results(dds)
    assert _finite_frac(res) > 0.5


@case("intercept_only_design")
def _():
    # the round-5 Mosaic p=1 crash lived exactly here
    dds = _dds()
    dds.design = parse_formula("~ 1")
    dds = d2.deseq(dds)
    d2.results(dds, name="Intercept")


@case("use_t")
def _():
    dds = d2.deseq(_dds(), use_t=True)
    d2.results(dds)


@case("weights")
def _():
    dds = _dds(seed=7)
    rng = np.random.default_rng(0)
    dds.assays["weights"] = rng.uniform(0.5, 1.0, dds.counts.shape)
    dds = d2.deseq(dds)
    d2.results(dds)


@case("norm_factors")
def _():
    dds = _dds(seed=8)
    rng = np.random.default_rng(1)
    nf = rng.uniform(0.8, 1.25, dds.counts.shape)
    dds.normalization_factors = nf / np.exp(np.mean(np.log(nf), axis=0))
    dds = d2.deseq(dds)
    d2.results(dds)


@case("fit_type_local_mean")
def _():
    for ft in ("local", "mean"):
        dds = d2.deseq(_dds(seed=9), fit_type=ft)
        d2.results(dds)


@case("outlier_replacement")
def _():
    dds = _dds(n=100, m=14, seed=10)
    c = np.asarray(dds.counts)
    c[5, 0] = int(c[5].max() * 50 + 1000)  # force a Cook's outlier
    dds.counts = c
    dds = d2.deseq(dds, min_replicates_for_replace=7)
    d2.results(dds)


@case("sf_poscounts_iterate")
def _():
    dds = d2.deseq(_dds(n=80, seed=11), sf_type="poscounts")
    d2.results(dds)
    # "iterate" is an L-BFGS likelihood normalization that legitimately
    # refuses to converge on some fixtures (the reference's
    # estimateSizeFactorsIterate stops the same way); accept either a
    # fit or that documented error — the smoke target is TPU crashes.
    try:
        d2.deseq(_dds(n=80, seed=11), sf_type="iterate")
    except RuntimeError as e:
        assert "did not converge" in str(e)


@case("multi_factor_design")
def _():
    dds = _dds(seed=12)
    dds.col_data["batch"] = d2.Factor(["x", "y"] * (dds.n_samples // 2))
    dds.design = parse_formula("~ batch + condition")
    dds = d2.deseq(dds)
    d2.results(dds, contrast=("condition", "B", "A"))


@case("continuous_covariate")
def _():
    dds = _dds(seed=13)
    dds.col_data["dose"] = np.linspace(0.0, 1.0, dds.n_samples)
    dds.design = parse_formula("~ dose + condition")
    dds = d2.deseq(dds)
    d2.results(dds, name="dose")


# ------------------------------------------------------------------ results
@case("results_variants")
def _():
    dds = d2.deseq(_dds(seed=14))
    d2.results(dds, contrast=("condition", "B", "A"))
    d2.results(dds, contrast=[0.0, 1.0])                   # numeric
    d2.results(dds, contrast=(["condition_B_vs_A"], []))   # list
    for alt in ("less", "greater", "lessAbs"):
        d2.results(dds, alt_hypothesis=alt,
                   lfc_threshold=0.5 if alt == "lessAbs" else 0.0)
    d2.results(dds, lfc_threshold=1.0)
    d2.results(dds, independent_filtering=False)
    d2.results(dds, add_mle=False, tidy=True)


# ---------------------------------------------------------------- lfcShrink
@case("lfc_shrink_all_types")
def _():
    dds = d2.deseq(_dds(seed=15))
    for t in ("normal", "apeglm", "ashr"):
        r = d2.lfc_shrink(dds, coef="condition_B_vs_A", type=t)
        lfc = np.asarray(r["log2FoldChange"], float)
        assert np.isfinite(lfc).mean() > 0.5, f"{t}: mostly-NaN LFCs"


@case("lfc_shrink_apeglm_svalue")
def _():
    dds = d2.deseq(_dds(seed=16))
    d2.lfc_shrink(dds, coef="condition_B_vs_A", type="apeglm", svalue=True)


# --------------------------------------------------------------- transforms
@case("transforms")
def _():
    dds = _dds(n=1200, seed=17)
    for blind in (True, False):       # blind=True is the ~1 design path
        t = d2.vst(dds, blind=blind, nsub=200)
        np.asarray(t.matrix)
    t = d2.rlog(dds, blind=True)
    np.asarray(t.matrix)
    d2.norm_transform(dds)
    d2.variance_stabilizing_transformation(dds, blind=False)


@case("plots_data")
def _():
    dds = d2.deseq(_dds(seed=18))
    res = d2.results(dds)
    plots.plot_ma_data(res)
    plots.plot_disp_ests_data(dds)
    plots.plot_counts_data(dds, gene=0)
    plots.plot_sparsity_data(dds)
    t = d2.vst(dds, blind=True, nsub=50)
    plots.plot_pca_data(t, intgroup=("condition",))


# -------------------------------------------------------------- single cell
@case("sc_group_wald_ql")
def _():
    rng = np.random.default_rng(2)
    counts = rng.negative_binomial(2, 0.3, size=(300, 400)).astype(np.int64)
    cells = rng.integers(0, 3, 400).astype(np.int32)
    for test in ("Wald", "LRT"):
        out = fused_sc_results(counts, cells=cells, n_groups=3, test=test,
                               size_factors=np.ones(400))
        assert np.isfinite(np.asarray(out["pvalue"], float)).mean() > 0.3


@case("sc_covariate_design")
def _():
    rng = np.random.default_rng(3)
    counts = rng.negative_binomial(2, 0.3, size=(300, 400)).astype(np.int64)
    batch = rng.integers(0, 2, 400)
    cond = rng.integers(0, 2, 400)
    x = np.column_stack([np.ones(400), batch, cond]).astype(np.float64)
    xr = x[:, :2]
    out = fused_sc_results(counts, design=x, reduced_design=xr, test="LRT",
                           size_factors=np.ones(400))
    assert np.isfinite(np.asarray(out["pvalue"], float)).mean() > 0.3


@case("sc_norm_factors")
def _():
    # nf at single-cell scale requires the design= (model-matrix) mode
    rng = np.random.default_rng(4)
    counts = rng.negative_binomial(2, 0.3, size=(200, 300)).astype(np.int64)
    x = np.column_stack([np.ones(300),
                         rng.integers(0, 2, 300)]).astype(np.float64)
    nf = rng.uniform(0.8, 1.25, counts.shape)
    nf /= np.exp(np.mean(np.log(nf), axis=0))
    fused_sc_results(counts, design=x, norm_factors=nf,
                     size_factors=np.ones(300))


@case("deseq_glmgampoi_route")
def _():
    dds = _dds(n=200, m=40, seed=19)
    dds = d2.deseq(dds, fit_type="glmGamPoi", test="LRT", reduced="~ 1")
    d2.results(dds)


# ----------------------------------------------------------------- helpers
@case("helpers")
def _():
    dds = d2.deseq(_dds(seed=20))
    d2.fpm(dds)
    dds.set_row_data("basepairs", np.full(dds.n_genes, 1000.0), "input", "bp")
    d2.fpkm(dds)
    d2.collapse_replicates(_dds(seed=21),
                           groupby=["g1", "g1", "g2", "g2", "g3", "g3"] * 2)
    d2.covariance_matrix(dds, 0)


@case("io_roundtrip")
def _():
    import tempfile
    dds = d2.deseq(_dds(n=60, seed=22))
    res = d2.results(dds)
    with tempfile.TemporaryDirectory() as td:
        d2.save_dataset(dds, os.path.join(td, "dds.npz"))
        d2.load_dataset(os.path.join(td, "dds.npz"))
        d2.save_results(res, os.path.join(td, "res.npz"))
        d2.load_results(os.path.join(td, "res.npz"))


def main():
    backend = jax.default_backend()
    print(f"# tpu_smoke on backend={backend} x64="
          f"{os.environ.get('DESEQ2_TPU_X64')} "
          f"devices={len(jax.devices())}", flush=True)
    only = sys.argv[1:] or None
    failed = []
    for name, fn in RESULTS:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            fn()
            print(f"PASS  {name:28s} {time.time()-t0:7.1f}s", flush=True)
        except Exception:
            failed.append(name)
            print(f"FAIL  {name:28s} {time.time()-t0:7.1f}s", flush=True)
            traceback.print_exc()
    print(f"# {len(failed)} failed of "
          f"{len(only) if only else len(RESULTS)}: {failed}")
    return len(failed)


if __name__ == "__main__":
    sys.exit(main())
