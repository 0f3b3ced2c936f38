"""Regenerate the committed self-golden results tables.

These freeze the f64 exact-path outputs (host deseq()+results()) on
seeded fixtures so future perf/refactor work cannot silently shift
numerics (VERDICT r2 missing #4: R itself is absent from this image, so
R-generated goldens are impossible; these pin the repo against its own
validated implementation instead).

Run from the repo root:  python tests/golden/make_goldens.py
Commit the regenerated npz files ONLY together with a change that
legitimately alters numerics, and say why in the commit message.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DESEQ2_TPU_X64"] = "1"

# the axon sitecustomize re-forces the tunneled TPU platform; the config
# update after import wins (same trick as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import deseq2_tpu as dt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

RES_COLS = ("baseMean", "log2FoldChange", "lfcSE", "stat", "pvalue",
            "padj")
ROW_COLS = ("dispGeneEst", "dispFit", "dispersion")


def build(name, make):
    dds, res = make()
    out = {c: np.asarray(res[c], np.float64) for c in RES_COLS}
    for c in ROW_COLS:
        out[f"row_{c}"] = np.asarray(dds.row_data[c], np.float64)
    np.savez_compressed(os.path.join(HERE, f"golden_{name}.npz"), **out)
    print(f"golden_{name}.npz: {len(out)} columns, "
          f"{out['baseMean'].shape[0]} genes")


def wald_default():
    dds = dt.make_example_dataset(n=200, m=12, beta_sd=1.0, seed=101)
    dds = dt.deseq(dds)
    return dds, dt.results(dds)


def lrt_reduced1():
    dds = dt.make_example_dataset(n=150, m=10, beta_sd=1.0, seed=102)
    dds = dt.deseq(dds, test="LRT", reduced="~ 1")
    return dds, dt.results(dds)


def beta_prior():
    dds = dt.make_example_dataset(n=150, m=12, beta_sd=1.0, seed=103)
    dds = dt.deseq(dds, beta_prior=True)
    return dds, dt.results(dds)


def weighted():
    dds = dt.make_example_dataset(n=120, m=10, beta_sd=1.0, seed=104)
    rng = np.random.default_rng(104)
    dds.assays["weights"] = rng.uniform(0.5, 1.0, dds.counts.shape)
    dds = dt.deseq(dds)
    return dds, dt.results(dds)


def use_t():
    dds = dt.make_example_dataset(n=120, m=8, beta_sd=1.0, seed=105)
    dds = dt.deseq(dds, use_t=True)
    return dds, dt.results(dds)


if __name__ == "__main__":
    for name, make in (("wald", wald_default), ("lrt", lrt_reduced1),
                       ("betaprior", beta_prior), ("weights", weighted),
                       ("uset", use_t)):
        build(name, make)
