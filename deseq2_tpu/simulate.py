"""Simulation fixture mirroring makeExampleDESeqDataSet (R/core.R:459-498).

Ground truth (trueIntercept/trueBeta/trueDisp) is stored in row_data so
recovery tests can compare against it, exactly like the reference test
suite does (e.g. test_dispersions.R:134-137).
"""

from __future__ import annotations

import numpy as np

from .dataset import DESeqDataSet
from .formula import Factor


def make_example_dataset(n=1000, m=12, beta_sd=0.0, intercept_mean=4.0,
                         intercept_sd=2.0, disp_mean_rel=None,
                         size_factors=None, seed=None, **kw):
    """Simulate an NB dataset: beta ~ [N(interceptMean, interceptSD),
    N(0, betaSD)], disp = 4/2^intercept + .1, K ~ NB(mu, 1/disp)."""
    rng = np.random.default_rng(seed)
    if disp_mean_rel is None:
        disp_mean_rel = lambda x: 4.0 / x + 0.1
    if size_factors is None:
        size_factors = np.ones(m)
    beta = np.column_stack([rng.normal(intercept_mean, intercept_sd, n),
                            rng.normal(0.0, beta_sd, n) if beta_sd > 0
                            else np.zeros(n)])
    dispersion = disp_mean_rel(2.0 ** beta[:, 0])
    condition = Factor(["A"] * int(np.ceil(m / 2)) + ["B"] * (m // 2),
                       levels=["A", "B"])
    if m > 1:
        x = np.column_stack([np.ones(m), condition.codes.astype(float)])
    else:
        x = np.array([[1.0, 0.0]])
    mu = (2.0 ** (x @ beta.T)).T * size_factors[None, :]
    # numpy NB: n=size, p = size/(size+mu)
    size = 1.0 / dispersion[:, None]
    counts = rng.negative_binomial(size, size / (size + mu)).astype(np.int64)
    design = "~ condition" if m > 1 else "~ 1"
    dds = DESeqDataSet(counts, {"condition": condition}, design,
                       row_names=[f"gene{i+1}" for i in range(n)],
                       col_names=[f"sample{j+1}" for j in range(m)], **kw)
    dds.set_row_data("trueIntercept", beta[:, 0], "input",
                     "simulated intercept values")
    dds.set_row_data("trueBeta", beta[:, 1], "input", "simulated beta values")
    dds.set_row_data("trueDisp", dispersion, "input",
                     "simulated dispersion values")
    return dds
