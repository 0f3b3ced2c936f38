"""Formula parsing and model-matrix construction vs known R outputs."""

import numpy as np
import pytest

from deseq2_tpu.formula import (Factor, build_model_matrix, make_names,
                                parse_formula, rename_model_matrix_columns)


def test_factor_basics():
    f = Factor(["B", "A", "B", "C"])
    assert f.levels == ["A", "B", "C"]
    assert list(f.codes) == [1, 0, 1, 2]
    g = f.relevel("C")
    assert g.levels == ["C", "A", "B"]
    assert list(g.as_strings()) == ["B", "A", "B", "C"]


def test_parse_simple():
    f = parse_formula("~ condition")
    assert f.variables == ["condition"]
    assert f.intercept
    f = parse_formula("~ cell + dex")
    assert f.variables == ["cell", "dex"]
    f = parse_formula("~ 1")
    assert f.variables == [] and f.intercept
    f = parse_formula("~ 0 + condition")
    assert not f.intercept
    f = parse_formula("~ condition - 1")
    assert not f.intercept


def test_parse_interactions():
    f = parse_formula("~ genotype + condition + genotype:condition")
    assert [str(t) for t in f.terms] == \
        ["genotype", "condition", "genotype:condition"]
    g = parse_formula("~ genotype * condition")
    assert [str(t) for t in g.terms] == \
        ["genotype", "condition", "genotype:condition"]
    assert f.term_orders == [1, 1, 2]


def test_model_matrix_one_factor():
    cond = Factor(["A", "A", "B", "B"])
    mm, names, assign = build_model_matrix("~ condition",
                                           {"condition": cond})
    assert names == ["(Intercept)", "conditionB"]
    np.testing.assert_array_equal(mm, [[1, 0], [1, 0], [1, 1], [1, 1]])
    assert assign == [0, 1]


def test_model_matrix_two_factors():
    cell = Factor(["N1", "N1", "N2", "N2"])
    dex = Factor(["trt", "untrt", "trt", "untrt"], levels=["untrt", "trt"])
    mm, names, _ = build_model_matrix("~ cell + dex",
                                      {"cell": cell, "dex": dex})
    assert names == ["(Intercept)", "cellN2", "dextrt"]
    np.testing.assert_array_equal(
        mm, [[1, 0, 1], [1, 0, 0], [1, 1, 1], [1, 1, 0]])


def test_model_matrix_interaction():
    g = Factor(["I", "I", "II", "II"])
    c = Factor(["A", "B", "A", "B"])
    mm, names, _ = build_model_matrix("~ genotype + condition + "
                                      "genotype:condition",
                                      {"genotype": g, "condition": c})
    assert names == ["(Intercept)", "genotypeII", "conditionB",
                     "genotypeII:conditionB"]
    np.testing.assert_array_equal(
        mm, [[1, 0, 0, 0], [1, 0, 1, 0], [1, 1, 0, 0], [1, 1, 1, 1]])


def test_model_matrix_no_intercept():
    cond = Factor(["A", "A", "B", "B"])
    mm, names, _ = build_model_matrix("~ 0 + condition",
                                      {"condition": cond})
    # first factor in a no-intercept model gets full indicator coding
    assert names == ["conditionA", "conditionB"]
    np.testing.assert_array_equal(mm, [[1, 0], [1, 0], [0, 1], [0, 1]])


def test_model_matrix_numeric_covariate():
    cond = Factor(["A", "A", "B", "B"])
    x = np.array([0.5, 1.5, 2.5, 3.5])
    mm, names, _ = build_model_matrix("~ x + condition",
                                      {"condition": cond, "x": x})
    assert names == ["(Intercept)", "x", "conditionB"]
    np.testing.assert_array_equal(mm[:, 1], x)


def test_make_names():
    assert make_names(["condition_B_vs_A"]) == ["condition_B_vs_A"]
    assert make_names(["a b", "1x", "x-y"]) == ["a.b", "X1x", "x.y"]


def test_rename_columns():
    cond = Factor(["A", "A", "B", "B"])
    conv = rename_model_matrix_columns({"condition": cond}, "~ condition")
    assert conv == {"conditionB": "condition_B_vs_A"}


def test_full_rank_error():
    from deseq2_tpu import DESeqDataSet
    # condition and duplicate are confounded -> not full rank
    counts = np.ones((5, 4), dtype=np.int64)
    with pytest.raises(ValueError, match="full rank"):
        DESeqDataSet(counts, {"a": Factor(["x", "x", "y", "y"]),
                              "b": Factor(["u", "u", "v", "v"])},
                     "~ a + b")


def test_construction_errors():
    from deseq2_tpu import DESeqDataSet
    cond = {"condition": Factor(["A", "A", "B", "B"])}
    with pytest.raises(ValueError, match="negative"):
        DESeqDataSet(np.array([[1, 2, 3, -4]]), cond, "~ condition")
    with pytest.raises(ValueError, match="integer"):
        DESeqDataSet(np.array([[1.5, 2, 3, 4]]), cond, "~ condition")
    with pytest.raises(ValueError, match="NA"):
        DESeqDataSet(np.array([[1.0, np.nan, 3, 4]]), cond, "~ condition")
    with pytest.raises(ValueError, match="missing 'other'"):
        DESeqDataSet(np.array([[1, 2, 3, 4]]), cond, "~ other")


def test_factor_ordered_sentinel():
    """Factor(f) inherits orderedness; an explicit bool overrides
    (ADVICE r2: explicit False was indistinguishable from default)."""
    from deseq2_tpu.formula import Factor
    f = Factor(["a", "b"], ordered=True)
    assert Factor(f).ordered is True
    assert Factor(f, ordered=False).ordered is False
    assert Factor(f, ordered=True).ordered is True
    assert Factor(["a", "b"]).ordered is False
