"""Smoke + data-contract tests for the visualization layer
(reference test_plots.R)."""

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")

from deseq2_tpu import deseq, make_example_dataset, results, vst
from deseq2_tpu.plots import (plot_counts, plot_counts_data, plot_disp_ests,
                              plot_disp_ests_data, plot_ma, plot_ma_data,
                              plot_pca, plot_pca_data, plot_sparsity,
                              plot_sparsity_data)


@pytest.fixture(scope="module")
def fitted():
    dds = make_example_dataset(n=1100, m=8, beta_sd=1.0,
                               intercept_mean=6.0, intercept_sd=1.0, seed=31)
    dds = deseq(dds)
    return dds, results(dds)


def test_plot_disp_ests(fitted):
    dds, _ = fitted
    d = plot_disp_ests_data(dds)
    assert len(d["base_mean"]) == len(d["gene_est"]) == len(d["final"])
    ax = plot_disp_ests(dds)
    assert ax is not None


def test_plot_ma(fitted):
    _, res = fitted
    d = plot_ma_data(res)
    assert d["is_de"].dtype == bool
    assert d["is_de"].sum() > 0  # fixture has real signal
    ax = plot_ma(res, ylim=(-3, 3))
    assert ax is not None


def test_plot_pca(fitted):
    dds, _ = fitted
    vsd = vst(dds, nsub=1000)
    d = plot_pca_data(vsd, intgroup="condition", ntop=200)
    assert len(d["x"]) == dds.n_samples
    assert 0.999 < d["percent_var"].sum() < 1.001
    assert set(d["group"]) == {"A", "B"}
    ax = plot_pca(vsd)
    assert ax is not None
    with pytest.raises(ValueError):
        plot_pca_data(vsd, intgroup="missing_column")


def test_plot_counts(fitted):
    dds, _ = fitted
    d = plot_counts_data(dds, 0)
    assert len(d["count"]) == dds.n_samples
    assert np.all(d["count"] > 0)  # includes pseudocount
    d2 = plot_counts_data(dds, "gene5")
    assert d2["gene"] == "gene5"
    ax = plot_counts(dds, "gene5")
    assert ax is not None
    with pytest.raises(ValueError):
        plot_counts_data(dds, "not_a_gene")


def test_plot_sparsity(fitted):
    dds, _ = fitted
    d = plot_sparsity_data(dds)
    assert np.all((d["max_prop"] > 0) & (d["max_prop"] <= 1.0))
    ax = plot_sparsity(dds)
    assert ax is not None


def test_plot_pca_device_payload_matches_host():
    """plot_pca on a device-resident DESeqTransform payload (the
    vst/rlog accelerator path) reduces on device and matches the host
    numpy computation."""
    import jax.numpy as jnp
    import numpy as np

    from deseq2_tpu import make_example_dataset
    from deseq2_tpu.plots import plot_pca_data
    from deseq2_tpu.transforms import DESeqTransform, norm_transform

    dds = make_example_dataset(n=300, m=10, beta_sd=1.0, seed=6)
    t_host = norm_transform(dds)
    t_dev = DESeqTransform(jnp.asarray(t_host.matrix, jnp.float32),
                           t_host.col_data, t_host.row_names,
                           t_host.col_names)
    dh = plot_pca_data(t_host, intgroup=("condition",), ntop=100)
    dd = plot_pca_data(t_dev, intgroup=("condition",), ntop=100)
    # PCs match up to sign per component (f32 top-gene selection)
    for k in ("x", "y"):
        a, b = np.asarray(dh[k]), np.asarray(dd[k])
        assert min(np.max(np.abs(a - b)), np.max(np.abs(a + b))) < 1e-3
    np.testing.assert_allclose(dh["percent_var"], dd["percent_var"],
                               atol=1e-4)
    assert list(dh["group"]) == list(dd["group"])
