"""Centralized configuration with the reference's documented defaults.

The reference scatters these across function signatures (R/core.R:280-287,
657-664, 943-949, 1332-1336); we centralize them in one typed dataclass but
keep the same names and values so behavior and tests line up.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DESeqConfig:
    # dispersion estimation (reference R/core.R:657-664, 943-949)
    min_disp: float = 1e-8
    kappa_0: float = 1.0
    disp_tol: float = 1e-6
    maxit_disp: int = 100
    use_cr: bool = True
    weight_threshold: float = 1e-2
    outlier_sd: float = 2.0
    niter_disp: int = 1
    grid_size: int = 20           # R/wrappers.R:70-72
    grid_min_disp: float = 1e-8   # grid range [log(1e-8), log(max(10, m))]

    # GLM fitting (reference R/core.R:1332-1336, fitNbinomGLMs.R:29-31)
    beta_tol: float = 1e-8
    maxit_beta: int = 100
    use_optim: bool = True
    use_qr: bool = True
    min_mu: float = 0.5
    wide_prior_lambda: float = 1e-6  # log2-scale ridge when no prior
    beta_large: float = 30.0         # divergence guard |beta| > 30 (nat log)

    # outlier handling (reference R/core.R:280-287, 2069)
    min_replicates_for_replace: int = 7
    cooks_trim: float = 0.2

    # testing / results (reference R/results.R:298-313)
    alpha: float = 0.1

    # precision: float64 matches reference LAPACK/R-math parity;
    # float32 is the TPU fast path (MXU-native).
    dtype: str = "float64"


DEFAULT = DESeqConfig()


def cfg(value, field, config=None):
    """Resolve a pipeline argument: an explicit value wins, otherwise the
    field from `config` (or the module DEFAULT).  Pipeline functions
    declare their tunables as None and resolve through here so the
    dataclass is the single source of the reference defaults."""
    if value is not None:
        return value
    return getattr(config or DEFAULT, field)
