"""deseq2_tpu: a TPU-native differential-expression engine in JAX.

A from-scratch reimplementation of the capabilities of DESeq2
(thelovelab/DESeq2, surveyed in SURVEY.md): negative-binomial GLMs per
gene with dispersion shrinkage, Wald/LRT testing, results machinery, LFC
shrinkage, and variance-stabilizing transforms — with every per-gene C++
loop of the reference replaced by batched, masked JAX kernels over the
genes axis, sharded across TPU devices with jax.sharding.

Precision: float64 is enabled at import (reference parity at 1e-6
tolerances demands it); a float32 fast path is available through
DESeqConfig(dtype='float32').
"""

import os as _os

import jax as _jax

# f64 gives reference parity at 1e-6 tolerances (CPU / testing); set
# DESEQ2_TPU_X64=0 for the f32 fast path on TPU hardware (v5e has no
# native f64 — emulation would dominate runtime).
if _os.environ.get("DESEQ2_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# Full-f32 matmuls: the TPU default (bf16 MXU passes) injects ~1e-3
# relative error into beta @ X' / X'WX, which turns the IRLS fixpoint
# into a limit cycle (genes oscillate to maxit instead of converging).
# All matmuls here are (G,S)x(S,p^2) with tiny p — bandwidth-bound, so
# full precision costs nothing.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: the fused 60k x 1k pipeline costs
# ~85 s to compile uncached (measured, BENCH_EXTRA_r04) — pay it once
# per machine, not once per process.  The reference has no analogous
# cost (interpreted R + a prebuilt .so).  Opt out / relocate with
# DESEQ2_TPU_COMPILE_CACHE=0 / =<dir>.  CPU-only runs (JAX_PLATFORMS=
# cpu — the test configuration) skip it: XLA:CPU AOT executables embed
# the compile machine's ISA features, so a shared/moved cache dir risks
# SIGILL on load, and CPU compiles are small anyway.
_cc = _os.environ.get("DESEQ2_TPU_COMPILE_CACHE", "")
if _cc != "0" and _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    if not _cc:
        _cc = _os.path.join(_os.path.expanduser("~"), ".cache",
                            "deseq2_tpu", "xla")
    try:
        _os.makedirs(_cc, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cc)
        # cache everything that took a noticeable compile (the pipeline
        # is a handful of large programs, not thousands of tiny ones)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # unwritable home: run without a persistent cache
        pass

from .config import DESeqConfig  # noqa: E402
from .dataset import (DESeqDataSet, dataset_from_htseq_count,  # noqa: E402
                      dataset_from_matrix, dataset_from_tximport)
from .deseq import deseq  # noqa: E402
from .helper import (collapse_replicates, covariance_matrix,  # noqa: E402
                     fpkm, fpm, integrate_with_single_cell,
                     normalize_gene_length, unmix)
from .shrink import lfc_shrink  # noqa: E402
from .transforms import (DESeqTransform, norm_transform,  # noqa: E402
                         rlog, variance_stabilizing_transformation, vst)
from .dispersions import (estimate_dispersions,  # noqa: E402
                          estimate_dispersions_fit,
                          estimate_dispersions_gene_est,
                          estimate_dispersions_map,
                          estimate_dispersions_prior_var)
from .formula import Factor, Formula, parse_formula  # noqa: E402
from .lrt import nbinom_lrt  # noqa: E402
from .outliers import replace_outliers  # noqa: E402
from .results import (DESeqResults, remove_results, results,  # noqa: E402
                      results_names)
from .simulate import make_example_dataset  # noqa: E402
from .sizefactors import (estimate_size_factors,  # noqa: E402
                          size_factors_for_matrix)
from .wald import (estimate_beta_prior_var,  # noqa: E402
                   estimate_mle_for_beta_prior_var, nbinom_wald_test)
from . import io  # noqa: E402
from .io import (load_dataset, load_results, save_dataset,  # noqa: E402
                 save_results)

__version__ = "0.1.0"

__all__ = [
    "DESeqConfig", "DESeqDataSet", "DESeqResults", "DESeqTransform",
    "Factor", "Formula", "collapse_replicates", "covariance_matrix",
    "integrate_with_single_cell", "normalize_gene_length",
    "dataset_from_htseq_count", "dataset_from_matrix",
    "dataset_from_tximport", "deseq", "estimate_beta_prior_var",
    "estimate_dispersions", "estimate_dispersions_fit",
    "estimate_dispersions_gene_est", "estimate_dispersions_map",
    "estimate_dispersions_prior_var", "estimate_mle_for_beta_prior_var",
    "estimate_size_factors", "fpkm", "fpm", "lfc_shrink",
    "save_dataset", "load_dataset", "save_results", "load_results",
    "make_example_dataset", "nbinom_lrt", "nbinom_wald_test",
    "norm_transform", "parse_formula", "remove_results", "results",
    "results_names", "rlog", "size_factors_for_matrix", "unmix",
    "variance_stabilizing_transformation", "vst",
]
