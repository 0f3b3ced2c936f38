"""Utility-layer tests: collapseReplicates, fpm/fpkm, unmix.

Modeled on the reference's test_collapse.R, test_fpkm.R, test_unmix.R.
"""

import numpy as np
import pytest

from deseq2_tpu import estimate_size_factors, make_example_dataset
from deseq2_tpu.helper import collapse_replicates, fpkm, fpm, unmix


def test_collapse_replicates():
    dds = make_example_dataset(n=50, m=8, seed=1)
    groups = ["s1", "s1", "s2", "s2", "s3", "s3", "s4", "s4"]
    coll = collapse_replicates(dds, groups)
    assert coll.counts.shape == (50, 4)
    np.testing.assert_array_equal(coll.counts[:, 0],
                                  dds.counts[:, 0] + dds.counts[:, 1])
    np.testing.assert_array_equal(coll.counts[:, 3],
                                  dds.counts[:, 6] + dds.counts[:, 7])
    # colData keeps the first sample of each group
    assert list(coll.col_data["condition"].as_strings()) == \
        ["A", "A", "B", "B"]


def test_fpm_sums_to_million_unrobust():
    dds = make_example_dataset(n=100, m=6, seed=2)
    f = fpm(dds, robust=False)
    np.testing.assert_allclose(f.sum(axis=0), 1e6)


def test_fpm_robust_scales_by_size_factors():
    sf = np.array([0.5, 1.0, 2.0, 1.0, 1.0, 1.0])
    dds = make_example_dataset(n=200, m=6, size_factors=sf, seed=3)
    dds = estimate_size_factors(dds)
    f = fpm(dds, robust=True)
    # robust fpm ratios between samples track 1/sf, not 1/colsum
    g = dds.counts[:, 0] > 0
    ratio = np.median((f[g, 2] + 1) / (f[g, 0] + 1))
    # sample 2 has twice the depth -> same fpm after robust normalization
    assert 0.5 < ratio < 2.0


def test_fpkm_basepairs():
    dds = make_example_dataset(n=80, m=4, seed=4)
    bp = np.full(80, 1000.0)
    dds.set_row_data("basepairs", bp, "input", "gene length")
    f = fpm(dds)
    k = fpkm(dds)
    np.testing.assert_allclose(k, f)  # 1kb genes: fpkm == fpm
    dds.set_row_data("basepairs", np.full(80, 500.0), "input", "len")
    np.testing.assert_allclose(fpkm(dds), 2.0 * f)


def test_fpkm_requires_lengths():
    dds = make_example_dataset(n=30, m=4, seed=5)
    with pytest.raises(ValueError):
        fpkm(dds)


def test_unmix_recovers_proportions():
    """Port of the reference test_unmix.R contract: known mixtures are
    recovered within 0.1."""
    rng = np.random.default_rng(7)
    n = 300
    pure = np.exp(rng.normal(4.0, 1.0, (n, 3)))
    props = np.array([[0.7, 0.2, 0.1],
                      [0.2, 0.5, 0.3],
                      [0.1, 0.1, 0.8],
                      [1 / 3, 1 / 3, 1 / 3]])
    x = pure @ props.T
    x = x * np.exp(rng.normal(0.0, 0.05, x.shape))  # mild noise
    mix = unmix(x, pure, alpha=0.05)
    assert mix.shape == (4, 3)
    np.testing.assert_allclose(mix.sum(axis=1), 1.0, atol=1e-8)
    assert np.max(np.abs(mix - props)) < 0.1


def test_unmix_shift_variant():
    rng = np.random.default_rng(8)
    pure = np.exp(rng.normal(3.0, 1.0, (200, 2)))
    props = np.array([[0.6, 0.4]])
    x = pure @ props.T
    mix = unmix(x, pure, shift=0.5)
    assert np.max(np.abs(mix - props)) < 0.1


def test_unmix_arg_errors():
    pure = np.ones((10, 2))
    x = np.ones((10, 1))
    with pytest.raises(ValueError):
        unmix(x, pure)  # neither alpha nor shift
    with pytest.raises(ValueError):
        unmix(x, pure, alpha=1.0, shift=1.0)  # both
    with pytest.raises(ValueError):
        unmix(x, np.ones((10, 1)), alpha=1.0)  # single pure column


def test_covariance_matrix():
    """covarianceMatrix diagnostic (R/core.R:2373-2398): diagonal must
    match the stored SE^2 for a no-prior fit."""
    import deseq2_tpu as dt
    dds = dt.make_example_dataset(n=80, m=8, seed=11)
    dds = dt.deseq(dds)
    sigma = dt.covariance_matrix(dds, 3)
    p = len(dds.results_names())
    assert sigma.shape == (p, p)
    se = np.array([float(dds.row_data[f"SE_{c}"][3])
                   for c in dds.results_names()])
    np.testing.assert_allclose(np.sqrt(np.diag(sigma)), se, rtol=1e-5)


def test_integrate_with_single_cell_org_detection():
    import deseq2_tpu as dt
    dds = dt.make_example_dataset(n=40, m=6, seed=2)
    dds.row_names = [f"ENSG{i:011d}" for i in range(40)]
    dds = dt.deseq(dds)
    res = dt.results(dds)
    res.row_names = list(dds.row_names)
    tab = [dict(org="human", pkg="p", func="f"),
           dict(org="mouse", pkg="q", func="g")]
    out = dt.integrate_with_single_cell(res, dds, csv_table=tab)
    assert out["org"] == "human"
    assert out["datasets"] == [tab[0]]


def test_normalize_gene_length_deprecated():
    import pytest
    import deseq2_tpu as dt
    with pytest.raises(NotImplementedError):
        dt.normalize_gene_length()
