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
