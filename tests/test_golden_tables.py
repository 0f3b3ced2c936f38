"""Self-golden regression tables: the f64 exact path must reproduce the
committed fixtures bit-for-bit (to 1e-9 relative, above cross-BLAS LSB
noise but far below any legitimate numeric change).  Regenerate with
tests/golden/make_goldens.py ONLY alongside an intentional numerics
change."""

import os

import numpy as np
import pytest

import deseq2_tpu as dt
from golden import make_goldens as mk

HERE = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name,make", [
    ("wald", mk.wald_default), ("lrt", mk.lrt_reduced1),
    ("betaprior", mk.beta_prior), ("weights", mk.weighted),
    ("uset", mk.use_t)])
def test_golden_table(name, make):
    path = os.path.join(HERE, f"golden_{name}.npz")
    gold = np.load(path)
    dds, res = make()
    for c in mk.RES_COLS:
        got = np.asarray(res[c], np.float64)
        want = gold[c]
        assert np.array_equal(np.isnan(got), np.isnan(want)), \
            f"{name}.{c}: NaN pattern drifted"
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-9, atol=1e-12,
                                   err_msg=f"{name}.{c}")
    for c in mk.ROW_COLS:
        got = np.asarray(dds.row_data[c], np.float64)
        want = gold[f"row_{c}"]
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-9, atol=1e-12,
                                   err_msg=f"{name}.row.{c}")
