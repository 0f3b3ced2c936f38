"""Checkpoint/resume: serialize any prefix of the pipeline and resume.

Mirrors the reference's implicit saveRDS-at-any-stage contract
(SURVEY.md section 5): stages detect pre-existing results, so
load(save(dds)) mid-pipeline must continue to identical outputs.
"""

import numpy as np
import pytest

import deseq2_tpu as dt
from deseq2_tpu.io import (load_dataset, load_results, save_dataset,
                           save_results)


@pytest.fixture(scope="module")
def dds():
    return dt.make_example_dataset(n=120, m=8, seed=11)


def _assert_dds_equal(a, b):
    np.testing.assert_array_equal(a.counts, b.counts)
    assert set(a.row_data) == set(b.row_data)
    for k in a.row_data:
        np.testing.assert_allclose(
            np.asarray(a.row_data[k], dtype=np.float64),
            np.asarray(b.row_data[k], dtype=np.float64), rtol=0, atol=0,
            err_msg=k)
    assert set(a.assays) == set(b.assays)
    for k in a.assays:
        np.testing.assert_array_equal(a.assays[k], b.assays[k], err_msg=k)


def test_roundtrip_raw(tmp_path, dds):
    p = save_dataset(dds, tmp_path / "raw.npz")
    back = load_dataset(p)
    _assert_dds_equal(dds, back)
    assert str(back.design) == str(dds.design)
    assert back.col_data["condition"].levels == \
        dds.col_data["condition"].levels
    assert back.row_names == dds.row_names


def test_resume_mid_pipeline(tmp_path, dds):
    # straight-through run
    full = dt.deseq(dds)
    # checkpoint after dispersions, resume with the Wald test only
    half = dt.estimate_size_factors(dds)
    half = dt.estimate_dispersions(half)
    p = save_dataset(half, tmp_path / "half.npz")
    resumed = load_dataset(p)
    assert resumed.dispersion_function is not None
    assert resumed.dispersion_function.fit_type == \
        half.dispersion_function.fit_type
    np.testing.assert_allclose(
        resumed.dispersion_function(np.array([1.0, 10.0, 100.0])),
        half.dispersion_function(np.array([1.0, 10.0, 100.0])))
    resumed = dt.nbinom_wald_test(resumed)
    for k in ("dispersion", "WaldStatistic_condition_B_vs_A",
              "WaldPvalue_condition_B_vs_A"):
        np.testing.assert_allclose(resumed.row_data[k], full.row_data[k],
                                   rtol=1e-12, atol=1e-12, err_msg=k)


def test_frozen_dispersion_function_after_load(tmp_path, dds):
    # frozen VST across a checkpoint (reference R/vst.R:69-77)
    fitted = dt.estimate_size_factors(dds)
    fitted = dt.estimate_dispersions(fitted)
    p = save_dataset(fitted, tmp_path / "fit.npz")
    back = load_dataset(p)
    vst_a = dt.variance_stabilizing_transformation(fitted, blind=False)
    vst_b = dt.variance_stabilizing_transformation(back, blind=False)
    np.testing.assert_allclose(vst_a.matrix, vst_b.matrix, rtol=1e-12)


def test_results_roundtrip(tmp_path, dds):
    fitted = dt.deseq(dds)
    res = dt.results(fitted)
    p = save_results(res, tmp_path / "res.npz")
    back = load_results(p)
    for c in res.column_names:
        np.testing.assert_allclose(
            np.asarray(res[c], dtype=np.float64),
            np.asarray(back[c], dtype=np.float64), err_msg=c)
    assert back.prior_info == dt.io._jsonable(res.prior_info)
    assert back.row_names == res.row_names


def test_attrs_and_matrix_design_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 50, (40, 6))
    x = np.column_stack([np.ones(6), np.r_[0, 0, 0, 1, 1, 1.0]])
    dds = dt.DESeqDataSet(counts, {"g": np.arange(6.0)}, x)
    dds.attrs["modelMatrix"] = x
    dds.attrs["test"] = "Wald"
    dds.attrs["betaPriorVar"] = [1e6, 1.2]
    p = save_dataset(dds, tmp_path / "m.npz")
    back = load_dataset(p)
    assert isinstance(back.design, np.ndarray)
    np.testing.assert_array_equal(back.design, x)
    np.testing.assert_array_equal(back.attrs["modelMatrix"], x)
    assert back.attrs["test"] == "Wald"
    assert back.attrs["betaPriorVar"] == [1e6, 1.2]


def test_ordered_factor_roundtrip(tmp_path):
    """save/load preserves the ordered flag of factor columns
    (ADVICE r2: load_dataset hardcoded ordered=False)."""
    import deseq2_tpu as dt
    dds = dt.make_example_dataset(n=20, m=6, seed=3)
    dds.col_data["stage"] = dt.Factor(["I", "II", "III"] * 2,
                                      levels=["I", "II", "III"],
                                      ordered=True)
    p = tmp_path / "dds.npz"
    dt.save_dataset(dds, p)
    back = dt.load_dataset(p)
    assert back.col_data["stage"].ordered is True
    assert back.col_data["condition"].ordered is False


def test_roundtrip_fused_routed(tmp_path, dds):
    """A fused-engine-routed dataset (lazy device-resident row_data
    columns + device assays + device results tail) serializes and
    reloads equal to the host-routed one."""
    import deseq2_tpu as dt

    f = dt.deseq(dds, engine="fused")
    path = tmp_path / "fused.npz"
    dt.save_dataset(f, path)
    back = dt.load_dataset(path)
    h = dt.deseq(dds, engine="host")
    for k in ("dispersion", "dispGeneEst", "deviance", "baseMean"):
        np.testing.assert_allclose(
            np.asarray(back.row_data[k], float),
            np.asarray(h.row_data[k], float), rtol=1e-9, atol=1e-12,
            err_msg=k)
    np.testing.assert_allclose(np.asarray(back.assays["mu"], float),
                               np.asarray(h.assays["mu"], float),
                               rtol=1e-7, atol=1e-9)
    # results() on the reloaded object (tail dropped -> host flow)
    ra = dt.results(back)
    rb = dt.results(h)
    both = np.isfinite(np.asarray(ra["padj"], float)) \
        & np.isfinite(np.asarray(rb["padj"], float))
    np.testing.assert_allclose(np.asarray(ra["padj"], float)[both],
                               np.asarray(rb["padj"], float)[both],
                               rtol=1e-8)
