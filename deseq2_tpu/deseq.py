"""The DESeq() pipeline driver (reference R/core.R:280-432)."""

from __future__ import annotations

import warnings

import numpy as np

from .dataset import check_full_rank
from .dispersions import estimate_dispersions, n_or_more_in_cell
from .formula import parse_formula
from .lrt import check_lrt, nbinom_lrt
from .outliers import refit_without_outliers
from .sizefactors import estimate_size_factors
from .wald import nbinom_wald_test
from . import profiling


def deseq(dds, test="Wald", fit_type="parametric", sf_type="ratio",
          beta_prior=False, full=None, reduced=None, quiet=True,
          min_replicates_for_replace=None, model_matrix_type=None,
          use_t=False, minmu=None, config=None, mesh=None, engine=None):
    """size factors -> dispersions -> Wald or LRT -> outlier refit.

    Mirrors the reference's argument checking and stage sequencing
    (R/core.R:288-432).  `config` (a DESeqConfig) supplies any tunables
    not given explicitly and is threaded through every stage.

    `engine` selects the execution path (the reference has one DESeq()
    entry point — R/core.R:280-432 — and so does this): "auto" (default)
    runs the fused on-device pipeline (parallel/fused.py, the benched
    TPU fast path) whenever the backend is an accelerator and the
    configuration is eligible, and the reference-exact host
    orchestration otherwise; "fused"/"host" force a path.  The fused
    engine populates the same columns/assays/attrs, so results() and
    friends work unchanged.  Env override: DESEQ2_TPU_ENGINE.

    `mesh` (a 1-D gene mesh from parallel.sharding.gene_mesh) is the
    reference's `parallel=TRUE, BPPARAM=` equivalent (R/core.R:407-416):
    under the fused engine the whole pipeline runs gene-sharded via
    shard_map; on the host path every batched kernel call in every
    stage — weighted fits, beta-prior refits, LRT, outlier refits —
    runs gene-sharded across the mesh devices, with results identical
    to the single-device run (the cross-gene reductions stay host-side
    either way).
    """
    from .engine import resolve_engine
    engine = resolve_engine(engine)
    if mesh is not None and engine == "host":
        from .ops.placement import use_gene_mesh
        with use_gene_mesh(mesh):
            return deseq(dds, test=test, fit_type=fit_type, sf_type=sf_type,
                         beta_prior=beta_prior, full=full, reduced=reduced,
                         quiet=quiet,
                         min_replicates_for_replace=min_replicates_for_replace,
                         model_matrix_type=model_matrix_type, use_t=use_t,
                         minmu=minmu, config=config, mesh=None,
                         engine="host")
    from .config import cfg
    min_replicates_for_replace = cfg(min_replicates_for_replace,
                                     "min_replicates_for_replace", config)
    if test not in ("Wald", "LRT"):
        raise ValueError("test must be 'Wald' or 'LRT'")
    if fit_type not in ("parametric", "local", "mean", "glmGamPoi"):
        raise ValueError("unknown fitType")
    if sf_type not in ("ratio", "poscounts", "iterate"):
        raise ValueError("unknown sfType")
    if minmu is None:
        # reference default: minmu = 1e-6 for glmGamPoi else 0.5
        minmu = 1e-6 if fit_type == "glmGamPoi" else 0.5
    if fit_type == "glmGamPoi":
        min_replicates_for_replace = np.inf
        if test == "Wald" and not quiet:
            warnings.warn("the glmGamPoi dispersion estimator should be "
                          "used in combination with test='LRT'")

    model_as_formula = (full is None or not isinstance(full, np.ndarray)) \
        and not isinstance(dds.design, np.ndarray)

    if test == "LRT":
        if reduced is None:
            raise ValueError("likelihood ratio test requires a 'reduced' "
                             "design, see ?DESeq")
        if beta_prior:
            raise ValueError("test='LRT' does not support use of LFC "
                             "shrinkage, use betaPrior=FALSE")
        if model_matrix_type == "expanded":
            raise ValueError("test='LRT' does not support use of expanded "
                             "model matrix")
        if isinstance(full, np.ndarray) != isinstance(reduced, np.ndarray) \
                and full is not None:
            raise ValueError("if one of 'full' and 'reduced' is a matrix, "
                             "the other must be also a matrix")
        if model_as_formula:
            check_lrt(full if full is not None else dds.design, reduced)
        else:
            check_full_rank(full)
            check_full_rank(reduced)
            if full.shape[1] <= reduced.shape[1]:
                raise ValueError("the number of columns of 'full' should be "
                                 "more than the number of columns of "
                                 "'reduced'")
    if test == "Wald" and reduced is not None:
        raise ValueError("'reduced' ignored when test='Wald'")

    if model_as_formula:
        if full is not None and parse_formula(full) != dds.design:
            raise ValueError("'full' specified as formula should equal "
                             "design(object)")
        # R warning(), not a quiet-gated message (R/core.R:357)
        if not dds.design.variables:
            warnings.warn("the design is ~ 1 (just an intercept). "
                          "is this intended?")
        # re-run the validity check on design factor levels — the
        # reference's S4 validity fires on every object update
        # (R/AllClasses.R:36-44): levels duplicating under make.names
        # break column naming
        from .formula import Factor, make_names
        for v in dds.design.variables:
            val = dds.col_data.get(v)
            if isinstance(val, Factor):
                nms = make_names(val.levels)
                if len(set(nms)) != len(nms):
                    raise ValueError(
                        "levels of factors in the design have non-unique "
                        "level names after make.names() is applied. best "
                        "to only use letters and numbers for levels of "
                        "factors in the design")
        model_matrix = None
    else:
        if beta_prior:
            raise ValueError("betaPrior=TRUE is not supported for "
                             "user-provided model matrices")
        model_matrix = full if full is not None else dds.design
        check_full_rank(model_matrix)

    # the fused route never mutates counts in place, so its copy can
    # alias the (potentially large) counts buffer; the host path below
    # re-copies with its own counts duplicate
    dds_orig = dds
    with profiling.stage("deseq.copy"):
        dds = dds.copy(share_counts=True)
    dds.attrs["betaPrior"] = beta_prior

    # ---- engine routing: the fused on-device fast path ----
    if engine != "host":
        import jax
        from .engine import deseq_fused, fused_ineligibility
        reason = fused_ineligibility(dds, test, fit_type, sf_type,
                                     beta_prior, model_matrix,
                                     model_matrix_type, minmu, config)
        want = engine == "fused" or jax.default_backend() != "cpu"
        if reason is None and want:
            with profiling.stage("deseqFused", genes=dds.counts.shape[0]):
                routed = deseq_fused(
                    dds, test=test, fit_type=fit_type, sf_type=sf_type,
                    beta_prior=beta_prior, full=full, reduced=reduced,
                    quiet=quiet,
                    min_replicates_for_replace=min_replicates_for_replace,
                    model_matrix=model_matrix,
                    model_matrix_type=model_matrix_type, use_t=use_t,
                    mesh=mesh)
            if routed is not None:
                return routed
            reason = ("weights do not allow parameter estimation for "
                      "some rows (weightsFail bookkeeping is host-side)")
        if engine == "fused":
            raise ValueError(f"engine='fused' unavailable: {reason}")
        if want and not quiet:
            warnings.warn(f"fused engine unavailable ({reason}); "
                          "running the host-exact path")
        if mesh is not None:
            return deseq(dds_orig, test=test, fit_type=fit_type,
                         sf_type=sf_type, beta_prior=beta_prior,
                         full=full, reduced=reduced, quiet=quiet,
                         min_replicates_for_replace=(
                             min_replicates_for_replace),
                         model_matrix_type=model_matrix_type,
                         use_t=use_t, minmu=minmu, config=config,
                         mesh=mesh, engine="host")

    # Single-cell-scale guardrail (the reference's own SC guidance,
    # R/core.R:297-303): the host-exact path materializes several (G,S)
    # f64 intermediates, so covariate designs at tens of thousands of
    # samples can exhaust host/device memory.  The streamed fast path
    # (parallel.sc.fused_sc_results) only factorizes group-like designs,
    # so point the user at their options instead of OOMing silently.
    S_n = dds.counts.shape[1]
    if S_n >= 10000:
        mm_chk = model_matrix if model_matrix is not None \
            else dds.model_matrix()[0]
        mm_chk = np.asarray(mm_chk)
        group_like = len({tuple(r) for r in mm_chk}) == mm_chk.shape[1]
        if not group_like and not quiet:
            warnings.warn(
                f"design with covariates at {S_n} samples takes the "
                "materializing host path (several (genes x samples) "
                "intermediates). For single-cell scale use the streamed "
                "path: parallel.sc.fused_sc_results(design=model_matrix, "
                "reduced_design=..., fit_type='glmGamPoi') handles "
                "arbitrary small-p designs with (G,p) persistent state, "
                "or shard the exact path over devices with "
                "deseq(..., mesh=gene_mesh(n))")

    # host stages may mutate counts (outlier replacement): detach from
    # the shared buffer now
    dds.counts = dds.counts.copy()
    G = dds.counts.shape[0]
    if dds.size_factors is None and dds.normalization_factors is None:
        with profiling.stage("estimateSizeFactors", genes=G):
            dds = estimate_size_factors(dds, type=sf_type, quiet=quiet)

    with profiling.stage("estimateDispersions", genes=G):
        dds = estimate_dispersions(dds, fit_type=fit_type, quiet=quiet,
                                   model_matrix=model_matrix, min_mu=minmu,
                                   config=config)
    if test == "Wald":
        with profiling.stage("nbinomWaldTest", genes=G):
            dds = nbinom_wald_test(dds, beta_prior=beta_prior, quiet=quiet,
                                   model_matrix=model_matrix,
                                   model_matrix_type=model_matrix_type,
                                   use_t=use_t, min_mu=minmu, config=config)
    else:
        with profiling.stage("nbinomLRT", genes=G):
            dds = nbinom_lrt(dds,
                             full=full if full is not None else dds.design,
                             reduced=reduced, quiet=quiet, min_mu=minmu,
                             type=("glmGamPoi" if fit_type == "glmGamPoi"
                                   else "DESeq2"), config=config)

    if np.isfinite(min_replicates_for_replace):
        sufficient = np.any(n_or_more_in_cell(dds.attrs["modelMatrix"],
                                              min_replicates_for_replace))
        if sufficient:
          with profiling.stage("refitWithoutOutliers", genes=G):
            dds = refit_without_outliers(
                dds, test=test, beta_prior=beta_prior, full=full,
                reduced=reduced, quiet=quiet,
                min_replicates_for_replace=min_replicates_for_replace,
                model_matrix=model_matrix,
                model_matrix_type=model_matrix_type)
    return dds
