"""Size factor tests (mirrors reference test_size_factor.R)."""

import numpy as np
import pytest

from deseq2_tpu import estimate_size_factors, make_example_dataset
from deseq2_tpu.sizefactors import (estimate_norm_factors,
                                    size_factors_for_matrix)


def test_median_of_ratios_exact():
    counts = np.array([[10, 20, 40], [100, 200, 400], [5, 10, 20],
                       [1000, 2000, 4000]], dtype=np.int64)
    sf = size_factors_for_matrix(counts)
    # exact 1:2:4 ratios -> sf proportional to 1,2,4 with these medians
    np.testing.assert_allclose(sf / sf[0], [1.0, 2.0, 4.0])
    # hand-computed: loggeomeans per row, median of log ratios per column
    loggeo = np.mean(np.log(counts), axis=1)
    expected = [np.exp(np.median(np.log(counts[:, j]) - loggeo))
                for j in range(3)]
    np.testing.assert_allclose(sf, expected)


def test_size_factor_recovery():
    """Recovery regression slope ~ 1 (reference test_size_factor.R:22-46)."""
    true_sf = np.array([0.5, 0.8, 1.0, 1.0, 1.3, 2.0] * 2)
    dds = make_example_dataset(n=2000, m=12, size_factors=true_sf, seed=1,
                               intercept_mean=6)
    dds = estimate_size_factors(dds)
    slope = np.polyfit(true_sf, dds.size_factors, 1)[0]
    assert abs(slope - 1.0) < 0.1


def test_poscounts():
    counts = np.array([[0, 2, 4], [3, 0, 9], [10, 20, 0], [0, 10, 20]],
                      dtype=np.int64)
    sf = size_factors_for_matrix(counts, type="poscounts")
    assert np.all(sf > 0)
    # all-ratio path would fail here (every gene has a zero)
    with pytest.raises(ValueError):
        size_factors_for_matrix(counts, type="ratio")


def test_geo_means_frozen():
    counts = np.array([[10, 20, 40], [100, 200, 400], [5, 10, 20]],
                      dtype=np.int64)
    gm = np.exp(np.mean(np.log(counts), axis=1))
    sf = size_factors_for_matrix(counts, geo_means=gm)
    # frozen geoMeans path stabilizes to geometric mean 1
    np.testing.assert_allclose(np.exp(np.mean(np.log(sf))), 1.0)


def test_control_genes():
    rng = np.random.default_rng(0)
    counts = rng.poisson(50, size=(100, 4)).astype(np.int64)
    sf_all = size_factors_for_matrix(counts)
    sf_ctrl = size_factors_for_matrix(counts,
                                      control_genes=np.arange(30))
    assert sf_ctrl.shape == sf_all.shape
    sf_ctrl2 = size_factors_for_matrix(
        counts, control_genes=np.isin(np.arange(100), np.arange(30)))
    np.testing.assert_allclose(sf_ctrl, sf_ctrl2)


def test_norm_matrix():
    rng = np.random.default_rng(1)
    counts = rng.poisson(50, size=(50, 4)).astype(np.int64)
    norm_matrix = rng.uniform(0.5, 2.0, size=(50, 4))
    nf = estimate_norm_factors(counts, norm_matrix)
    # row geometric means are 1 (reference estimateNormFactors contract)
    np.testing.assert_allclose(np.exp(np.mean(np.log(nf), axis=1)), 1.0)


def test_avg_tx_length_assay():
    rng = np.random.default_rng(2)
    dds = make_example_dataset(n=50, m=6, seed=3)
    dds.assays["avgTxLength"] = rng.uniform(200, 2000, size=(50, 6))
    dds = estimate_size_factors(dds)
    assert dds.normalization_factors is not None
    assert dds.normalization_factors.shape == (50, 6)
