"""Constructor diagnostics ported from the reference
tests/testthat/test_construction_errors.R (R/AllClasses.R:163-285)."""

import numpy as np
import pytest

from deseq2_tpu.dataset import (DESeqDataSet, DESeqMessage,
                                dataset_from_matrix)
from deseq2_tpu.formula import Factor

CTS = np.arange(1, 17).reshape(4, 4, order="F")


def coldata():
    return {"x": Factor(["A", "A", "B", "B"])}


def test_negative_counts():
    bad = np.arange(1, 17).reshape(4, 4).astype(float)
    bad[3, 3] = -1
    with pytest.raises(ValueError, match="negative"):
        dataset_from_matrix(bad, coldata(), "~ x")


def test_non_integer_counts():
    bad = np.arange(1, 17).reshape(4, 4).astype(float)
    bad[3, 3] = 0.5
    with pytest.raises(ValueError, match="not integers"):
        dataset_from_matrix(bad, coldata(), "~ x")


def test_all_zero_counts():
    with pytest.raises(ValueError, match="all samples have 0 counts"):
        dataset_from_matrix(np.zeros((4, 4), int), coldata(), "~ x")


def test_equal_rows_warn():
    cts = np.tile(np.arange(1, 5)[:, None], (1, 4))
    with pytest.warns(UserWarning, match="equal values"):
        dataset_from_matrix(cts, coldata(), "~ x")


def test_duplicate_rownames_renamed():
    with pytest.warns(UserWarning, match="duplicate rownames"):
        dds = dataset_from_matrix(CTS, coldata(), "~ x",
                                  row_names=["1", "2", "3", "3"])
    assert dds.row_names == ["1", "2", "3", "3.1"]


def test_na_in_design_factor():
    cd = {"xwNA": np.array(["A", "A", "B", None], dtype=object)}
    with pytest.raises(ValueError, match="cannot contain NA"):
        dataset_from_matrix(CTS, cd, "~ xwNA")


def test_level_named_None_is_not_NA():
    """A legitimate factor level named 'None' (common for dose/treatment
    columns) must NOT trip the NA-in-design check — only the strings
    numpy/pandas coercion actually produces ('nan', '<NA>') are
    sentinels (ADVICE r3)."""
    cd = {"dose": np.array(["None", "None", "Low", "High"])}
    dds = dataset_from_matrix(CTS, cd, "~ dose")
    assert sorted(dds.col_data["dose"].levels) == ["High", "Low", "None"]


def test_missing_design_variable():
    with pytest.raises(ValueError, match="must be columns in colData"):
        dataset_from_matrix(CTS, coldata(), "~ y")


def test_character_design_warns():
    cd = {"name": np.array(["a", "b", "c", "d"])}
    with pytest.warns(UserWarning, match="are characters"):
        dataset_from_matrix(CTS, cd, "~ name")


def test_single_value_variable_errors():
    cd = {"ident": Factor(["A"] * 4)}
    with pytest.raises(ValueError, match="all samples having the same value"):
        dataset_from_matrix(CTS, cd, "~ ident")


def test_integer_numeric_message():
    cd = {"num": np.array([1.0, 2.0, 3.0, 4.0])}
    with pytest.warns(DESeqMessage, match="integer values"):
        dataset_from_matrix(CTS, cd, "~ num")


def test_large_numeric_message():
    cd = {"big_num": np.array([100.2, 100.9, 100.1, 100.7])}
    with pytest.warns(DESeqMessage, match="collinearity"):
        dataset_from_matrix(CTS, cd, "~ big_num")
    cd = {"wide_num": np.array([-50.5, -10.5, 10.5, 50.5])}
    with pytest.warns(DESeqMessage, match="center and scale"):
        dataset_from_matrix(CTS, cd, "~ wide_num")


def test_missing_levels_dropped():
    cd = {"ml": Factor(["A", "A", "B", "B"], levels=["A", "B", "C"])}
    with pytest.warns(DESeqMessage, match="dropped"):
        dds = dataset_from_matrix(CTS, cd, "~ ml")
    assert dds.col_data["ml"].levels == ["A", "B"]


def test_control_not_reference_message():
    # 'abc' sorts first so 'control' is not the reference level -> hint
    cd = {"notref": Factor(["control", "control", "abc", "abc"])}
    with pytest.warns(DESeqMessage, match="not the reference level"):
        dataset_from_matrix(CTS, cd, "~ notref")


def test_multivar_single_level_errors():
    cd = {"ident": Factor(["A"] * 4), "x": Factor(["A", "A", "B", "B"])}
    with pytest.raises(ValueError, match="design contains"):
        dataset_from_matrix(CTS, cd, "~ ident + x")


def test_bad_level_characters_message():
    cd = {"xx": Factor(["A", "A", "B", "B "])}
    with pytest.warns(DESeqMessage, match="characters other than"):
        dataset_from_matrix(CTS, cd, "~ xx")


def test_ordered_factor_errors():
    cd = {"ord": Factor(["1", "1", "2", "2"], ordered=True)}
    with pytest.raises(ValueError, match="ordered"):
        dataset_from_matrix(CTS, cd, "~ ord")


def test_character_counts_error():
    chr_cts = CTS.astype(str)
    with pytest.raises(ValueError, match="should be numeric"):
        dataset_from_matrix(chr_cts, coldata(), "~ x")


def test_tidy_first_column_rownames():
    tbl = [["g%d" % i] + [int(v) for v in CTS[i]] for i in range(4)]
    dds = dataset_from_matrix(tbl, coldata(), "~ x", tidy=True)
    assert dds.row_names == ["g0", "g1", "g2", "g3"]
    assert dds.counts.shape == (4, 4)
    assert np.array_equal(dds.counts, CTS)


def test_integer_conversion_message():
    with pytest.warns(DESeqMessage, match="integer mode"):
        dataset_from_matrix(CTS.astype(np.float64), coldata(), "~ x")


def test_counts_accessor_and_coef():
    """counts(normalized=, replaced=) and coef() accessors
    (R/methods.R:1-29,749-765)."""
    import deseq2_tpu as dt
    dds = dt.deseq(dt.make_example_dataset(n=40, m=6, seed=8))
    cn = dds.get_counts(normalized=True)
    assert np.allclose(cn, dds.counts / dds.size_factors[None, :])
    with pytest.warns(UserWarning, match="replaceCounts"):
        r = dds.get_counts(replaced=True)
    assert np.array_equal(r, dds.counts)
    b = dds.coef()
    s = dds.coef(se=True)
    assert b.shape == (40, 2) and s.shape == (40, 2)
    assert np.allclose(b[:, 1],
                       np.asarray(dds.row_data["condition_B_vs_A"], float),
                       equal_nan=True)
    fresh = dt.make_example_dataset(n=10, m=4, seed=1)
    with pytest.raises(ValueError, match="no coefficients"):
        fresh.coef()


def test_string_nan_design_variable_rejected():
    """A str-dtype colData column holding the coerced string 'nan'
    trips the NA-in-design check like the reference's
    'variables in design formula cannot contain NA'
    (R/AllClasses.R:198-201; ADVICE r2)."""
    import numpy as np
    import pytest
    import deseq2_tpu as dt
    counts = np.ones((5, 4), dtype=np.int32)
    cond = np.array(["A", "A", "B", np.nan])  # coerces to 'nan' string
    assert cond.dtype.kind == "U"
    with pytest.raises(ValueError, match="cannot contain NA"):
        dt.DESeqDataSet(counts, {"condition": cond}, "~ condition")
