"""tximport ingestion contract (port of tests/testthat/test_txi.R with a
synthetic salmon-like fixture; the real tximportData files need R)."""

import numpy as np
import pytest

import deseq2_tpu as dt
from deseq2_tpu.dataset import dataset_from_tximport
from deseq2_tpu.helper import make_counts_from_abundance


@pytest.fixture()
def txi():
    rng = np.random.default_rng(8)
    G, S = 60, 6
    length = rng.uniform(300.0, 3000.0, (G, S))
    abundance = rng.gamma(2.0, 20.0, (G, S))          # TPM-like
    counts = abundance * length / 1000.0 * rng.uniform(0.8, 1.2, (1, S))
    return dict(counts=counts, abundance=abundance, length=length,
                countsFromAbundance="no")


def _coldata(S=6):
    return {"condition": dt.Factor(np.repeat(["A", "B"], S // 2))}


def test_txi_avgtxlength_to_normalization_factors(txi):
    """test_txi.R:17-22: avgTxLength stored; estimateSizeFactors turns
    it into gene x sample normalization factors."""
    dds = dataset_from_tximport(txi, _coldata(), "~ condition")
    assert "avgTxLength" in dds.assays
    dds = dt.estimate_size_factors(dds)
    assert dds.normalization_factors is not None
    nf = dds.normalization_factors
    assert nf.shape == dds.counts.shape
    # NF rows are geometric-mean-1 normalized (R/methods.R:383-391)
    np.testing.assert_allclose(np.exp(np.mean(np.log(nf), axis=1)),
                               1.0, rtol=1e-10)
    # size factors stay unset on the NF path
    assert dds.size_factors is None


def test_txi_length_scaled_tpm_drops_lengths(txi):
    """test_txi.R:23-33: countsFromAbundance='lengthScaledTPM' counts
    must NOT get avgTxLength (lengths already folded in); plain size
    factors are used instead."""
    txi2 = dict(txi)
    txi2["counts"] = make_counts_from_abundance(
        txi["counts"], txi["abundance"], txi["length"], "lengthScaledTPM")
    txi2["countsFromAbundance"] = "lengthScaledTPM"
    dds = dataset_from_tximport(txi2, _coldata(), "~ condition")
    assert "avgTxLength" not in dds.assays
    dds = dt.estimate_size_factors(dds)
    assert "avgTxLength" not in dds.assays
    assert dds.normalization_factors is None
    assert dds.size_factors is not None


def test_make_counts_from_abundance_column_sums(txi):
    """Scaled counts preserve per-sample totals (tximport contract)."""
    for mode in ("scaledTPM", "lengthScaledTPM"):
        cfa = make_counts_from_abundance(txi["counts"], txi["abundance"],
                                         txi["length"], mode)
        np.testing.assert_allclose(cfa.sum(axis=0),
                                   np.asarray(txi["counts"]).sum(axis=0),
                                   rtol=1e-12)


def test_txi_full_pipeline_runs(txi):
    """End-to-end deseq() on the NF (avgTxLength) path."""
    dds = dataset_from_tximport(txi, _coldata(), "~ condition")
    dds = dt.deseq(dds)
    res = dt.results(dds)
    nz = ~dds.row_data["allZero"]
    assert np.isfinite(res["log2FoldChange"][nz]).all()
