"""Count-outlier replacement and refit.

Reference: replaceOutliers (R/core.R:2069-2115), refitWithoutOutliers
(R/core.R:2484-2563).
"""

from __future__ import annotations

import numpy as np
from scipy.stats import f as f_dist

from .cooks import _r_trimmed_mean, record_max_cooks
from .dispersions import (estimate_dispersions_gene_est,
                          estimate_dispersions_map,
                          get_base_means_and_variances, n_or_more_in_cell)


def replace_outliers(dds, trim=0.2, cooks_cutoff=None, min_replicates=7,
                     which_samples=None):
    """Replace counts with Cook's > cutoff by trimmed mean * size factor
    (reference replaceOutliers, R/core.R:2069-2115)."""
    if "modelMatrix" not in dds.attrs or "cooks" not in dds.assays:
        raise ValueError("first run deseq(), nbinom_wald_test, or nbinom_lrt "
                         "to identify outliers")
    if min_replicates < 3:
        raise ValueError("at least 3 replicates are necessary to identify "
                         "a sample as a count outlier")
    dds = dds.copy()
    p = dds.attrs["modelMatrix"].shape[1]
    m = dds.n_samples
    if m <= p:
        dds.assays["originalCounts"] = dds.counts.copy()
        return dds
    if cooks_cutoff is None:
        cooks_cutoff = f_dist.ppf(0.99, p, m - p)
    cooks = dds.assays["cooks"]
    with np.errstate(invalid="ignore"):
        outlier_mask = cooks > cooks_cutoff
    dds.set_row_data("replace", np.any(outlier_mask, axis=1), "intermediate",
                     "had counts replaced")
    trim_base_mean = _r_trimmed_mean(dds.counts_normalized(), trim)
    if dds.normalization_factors is not None:
        replacement = (trim_base_mean[:, None]
                       * dds.normalization_factors).astype(np.int64)
    else:
        replacement = np.outer(trim_base_mean,
                               dds.size_factors).astype(np.int64)
    new_counts = dds.counts.copy()
    new_counts[outlier_mask] = replacement[outlier_mask]

    if which_samples is None:
        which_samples = n_or_more_in_cell(dds.attrs["modelMatrix"],
                                          min_replicates)
    which_samples = np.asarray(which_samples, dtype=bool)
    dds.col_data["replaceable"] = which_samples
    dds.assays["originalCounts"] = dds.counts.copy()
    if which_samples.sum() == 0:
        return dds
    dds.counts[:, which_samples] = new_counts[:, which_samples]
    return dds


def refit_without_outliers(dds, test, beta_prior, full, reduced, quiet,
                           min_replicates_for_replace, model_matrix,
                           model_matrix_type):
    """Replace outliers then refit dispersions + GLM on replaced rows only,
    splicing results back (reference refitWithoutOutliers,
    R/core.R:2484-2563)."""
    from .lrt import nbinom_lrt
    from .wald import nbinom_wald_test

    cooks = dds.assays["cooks"].copy()
    dds = replace_outliers(dds, min_replicates=min_replicates_for_replace)

    replace = dds.row_data.get("replace")
    nrefit = int(np.nansum(replace)) if replace is not None else 0
    if nrefit > 0:
        dds = get_base_means_and_variances(dds)
        new_all_zero = np.where(replace & dds.row_data["allZero"])[0]
    if nrefit > 0 and nrefit > len(new_all_zero):
        refit_idx = np.where(replace & ~dds.row_data["allZero"])[0]
        object_sub = dds.subset_genes(refit_idx)
        # strip intermediate/results columns
        drop = [n for n, (t, _) in object_sub.row_meta.items()
                if t in ("intermediate", "results")]
        object_sub.remove_row_data(drop)

        object_sub = estimate_dispersions_gene_est(object_sub, quiet=quiet,
                                                   model_matrix=model_matrix)
        # redo fitted dispersion on the new base means
        disp_fn = dds.dispersion_function
        object_sub.dispersion_function = disp_fn
        disp_fit = np.full(object_sub.n_genes, np.nan)
        nzs = ~object_sub.row_data["allZero"]
        disp_fit[nzs] = disp_fn(object_sub.row_data["baseMean"][nzs])
        object_sub.set_row_data("dispFit", disp_fit, "intermediate",
                                "fitted values of dispersion")
        disp_prior_var = disp_fn.disp_prior_var
        object_sub = estimate_dispersions_map(object_sub, quiet=quiet,
                                              disp_prior_var=disp_prior_var,
                                              model_matrix=model_matrix)
        if test == "Wald":
            beta_prior_var = dds.attrs.get("betaPriorVar")
            object_sub = nbinom_wald_test(object_sub, beta_prior=beta_prior,
                                          beta_prior_var=beta_prior_var,
                                          quiet=quiet,
                                          model_matrix=model_matrix,
                                          model_matrix_type=model_matrix_type)
        else:
            object_sub = nbinom_lrt(object_sub, full=full, reduced=reduced,
                                    quiet=quiet)

        # splice back per-gene results
        for name in object_sub.row_data:
            if name in dds.row_data:
                dds.row_data[name][refit_idx] = object_sub.row_data[name]
        for name in ("mu", "H", "cooks"):
            if name in object_sub.assays and name in dds.assays:
                dds.assays[name][refit_idx] = object_sub.assays[name]
        # newly all-zero rows: results go NA
        res_cols = [n for n, (t, _) in dds.row_meta.items() if t == "results"]
        for n in res_cols:
            if dds.row_data[n].dtype.kind == "f":
                dds.row_data[n][new_all_zero] = np.nan

        if np.all(dds.col_data["replaceable"]):
            dds.row_data["maxCooks"] = np.full(dds.n_genes, np.nan)
        else:
            replace_cooks = dds.assays["cooks"].copy()
            replace_cooks[:, dds.col_data["replaceable"]] = 0.0
            dds.row_data["maxCooks"] = record_max_cooks(
                dds.attrs["dispModelMatrix"], replace_cooks, dds.n_genes)

    if nrefit > 0:
        dds.assays["replaceCounts"] = dds.counts.copy()
        dds.assays["replaceCooks"] = dds.assays["cooks"].copy()
        dds.counts = dds.assays["originalCounts"].copy()
        dds.assays["cooks"] = cooks
        del dds.assays["originalCounts"]
    return dds
