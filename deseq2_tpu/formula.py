"""R-style model formula compiler: factors, formulas, design matrices.

TPU-native reimplementation of the R-semantics layer that the reference
relies on via ``stats::model.matrix.default`` (see reference
R/core.R:2689-2695, R/AllClasses.R:193-285).  This is host-side, pure
numpy: design matrices are tiny (S x p) and never hot.

Supported formula syntax (the subset the reference test-suite exercises):

    ~ condition
    ~ cell + dex
    ~ genotype + condition + genotype:condition
    ~ genotype * condition           (expands to main effects + interaction)
    ~ 0 + condition / ~ condition - 1 (no intercept)
    ~ 1                              (intercept only)
    numeric covariates enter as-is; factor covariates use treatment
    contrasts against the first level, exactly like R's default.

Column naming matches R: "(Intercept)", "conditionB", "cellN061011",
"genotypeII:conditionB" etc., so that downstream renaming to
``condition_B_vs_A`` (reference R/results.R:1091-1099) produces identical
result column names.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "Factor",
    "Formula",
    "build_model_matrix",
    "make_names",
    "rename_model_matrix_columns",
]


class Factor:
    """Minimal R factor: integer codes + ordered level labels.

    Mirrors the semantics DESeq2 depends on: the *first level is the
    reference level* for treatment contrasts; ``relevel`` moves a level to
    the front (reference uses this for the 'control' reference-level hint,
    R/AllClasses.R:256-262).
    """

    __slots__ = ("codes", "levels", "ordered")

    def __init__(self, values, levels=None, ordered=None):
        # ordered=None inherits from a source Factor (R's factor(x)
        # keeps is.ordered(x)); an explicit bool always overrides, so
        # Factor(f, ordered=False) clears the flag like
        # R's factor(x, ordered=FALSE)
        self.ordered = bool(ordered) if ordered is not None else False
        if isinstance(values, Factor):
            self.codes = values.codes.copy()
            self.levels = list(values.levels)
            if ordered is None:
                self.ordered = values.ordered
            if levels is not None:
                self._set_levels(levels)
            return
        values = np.asarray(values)
        if levels is None:
            # R's factor() default: sorted unique values
            levels = sorted(set(str(v) for v in values.tolist()))
        self.levels = [str(l) for l in levels]
        index = {l: i for i, l in enumerate(self.levels)}
        try:
            self.codes = np.array([index[str(v)] for v in values.tolist()], dtype=np.int64)
        except KeyError as e:
            raise ValueError(f"value {e} not in levels {self.levels}") from None

    def _set_levels(self, levels):
        levels = [str(l) for l in levels]
        if set(levels) != set(self.levels):
            raise ValueError("new levels must be a permutation of existing levels")
        remap = np.array([levels.index(l) for l in self.levels], dtype=np.int64)
        self.codes = remap[self.codes]
        self.levels = levels

    def __len__(self):
        return len(self.codes)

    def __eq__(self, other):
        if isinstance(other, Factor):
            return np.array_equal(self.codes, other.codes) and self.levels == other.levels
        return NotImplemented

    def __getitem__(self, idx):
        out = Factor.__new__(Factor)
        out.codes = np.atleast_1d(self.codes[idx])
        out.levels = list(self.levels)
        out.ordered = self.ordered
        return out

    @property
    def nlevels(self):
        return len(self.levels)

    def relevel(self, ref):
        """Return a new Factor with `ref` as the first (reference) level."""
        ref = str(ref)
        if ref not in self.levels:
            raise ValueError(f"{ref!r} is not a level")
        new_levels = [ref] + [l for l in self.levels if l != ref]
        out = Factor.__new__(Factor)
        out.codes = self.codes.copy()
        out.levels = list(self.levels)
        out.ordered = self.ordered
        out._set_levels(new_levels)
        return out

    def droplevels(self):
        used = sorted(set(self.codes.tolist()))
        new_levels = [self.levels[i] for i in used]
        out = Factor.__new__(Factor)
        out.levels = new_levels
        out.ordered = self.ordered
        remap = {old: new for new, old in enumerate(used)}
        out.codes = np.array([remap[c] for c in self.codes.tolist()], dtype=np.int64)
        return out

    def as_strings(self):
        return np.array([self.levels[c] for c in self.codes], dtype=object)

    def table(self):
        counts = np.bincount(self.codes, minlength=self.nlevels)
        return dict(zip(self.levels, counts.tolist()))

    def __repr__(self):
        vals = ", ".join(self.levels[c] for c in self.codes[:8])
        more = "..." if len(self.codes) > 8 else ""
        return f"Factor([{vals}{more}], levels={self.levels})"


# ---------------------------------------------------------------------------
# Formula parsing
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Term:
    """A model term: a tuple of variable names (len>1 => interaction)."""

    variables: tuple

    @property
    def order(self):
        return len(self.variables)

    def __str__(self):
        return ":".join(self.variables)


@dataclass
class Formula:
    """Parsed R model formula (right-hand side only)."""

    terms: list = field(default_factory=list)  # list[Term], sorted by order
    intercept: bool = True
    source: str = "~1"

    @property
    def variables(self):
        """all.vars(): unique variable names, in order of appearance."""
        seen = []
        for t in self.terms:
            for v in t.variables:
                if v not in seen:
                    seen.append(v)
        return seen

    @property
    def term_orders(self):
        return [t.order for t in self.terms]

    def __str__(self):
        return self.source

    def __eq__(self, other):
        if isinstance(other, str):
            other = parse_formula(other)
        if isinstance(other, Formula):
            return self.terms == other.terms and self.intercept == other.intercept
        return NotImplemented


def _expand_product(lhs_terms, rhs_terms):
    """a*b -> a + b + a:b   (on lists of variable-tuples)."""
    out = list(lhs_terms) + list(rhs_terms)
    for l in lhs_terms:
        for r in rhs_terms:
            out.append(tuple(list(l) + [v for v in r if v not in l]))
    return out


def parse_formula(formula):
    """Parse an R-style one-sided formula string into a Formula.

    Handles +, -, :, *, parenthesized groups, and 0/1 intercept control.
    """
    if isinstance(formula, Formula):
        return formula
    src = formula.strip()
    body = src.lstrip("~").strip()
    if body == "":
        body = "1"

    # tokenize
    tokens = re.findall(r"[A-Za-z_.][A-Za-z0-9_.]*|\d+|[~+\-*:()]", body)

    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def advance():
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        return tok

    # grammar:  expr := prod (('+'|'-') prod)*
    #           prod := inter ('*' inter)*
    #           inter := atom (':' atom)*
    #           atom := var | number | '(' expr ')'
    # values are (terms:list[tuple], intercept_delta) where a bare 1/0 sets intercept
    def parse_atom():
        tok = peek()
        if tok == "(":
            advance()
            val = parse_expr()
            if peek() != ")":
                raise ValueError(f"unbalanced parentheses in formula: {src}")
            advance()
            return val
        tok = advance()
        if tok == "1":
            return ([], None)  # intercept marker, no terms
        if tok == "0":
            return ([], "drop")
        if re.match(r"^\d+$", tok):
            raise ValueError(f"unexpected number {tok} in formula: {src}")
        return ([(tok,)], None)

    def parse_inter():
        terms, flag = parse_atom()
        while peek() == ":":
            advance()
            rterms, _ = parse_atom()
            # cross: every lhs term with every rhs term
            new = []
            for l in terms:
                for r in rterms:
                    new.append(tuple(list(l) + [v for v in r if v not in l]))
            terms = new
        return terms, flag

    def parse_prod():
        terms, flag = parse_inter()
        while peek() == "*":
            advance()
            rterms, _ = parse_inter()
            terms = _expand_product(terms, rterms)
        return terms, flag

    def parse_expr():
        intercept = [True]
        terms, flag = parse_prod()
        if flag == "drop":
            intercept[0] = False
        all_terms = list(terms)
        while peek() in ("+", "-"):
            op = advance()
            rterms, rflag = parse_prod()
            if op == "+":
                if rflag == "drop":
                    intercept[0] = False
                all_terms.extend(rterms)
            else:  # '-'
                if rflag == "drop" or (not rterms):
                    # "- 1" or "- 0"
                    intercept[0] = False if rflag is None or rflag == "drop" else intercept[0]
                    if rflag is None and not rterms:
                        intercept[0] = False
                for rt in rterms:
                    if rt in all_terms:
                        all_terms.remove(rt)
        return all_terms, ("drop" if not intercept[0] else None)

    terms, flag = parse_expr()
    intercept = flag != "drop"
    # special-case "~ 1" / "~ 0": no terms
    # dedupe preserving order
    seen, uniq = set(), []
    for t in terms:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    # R sorts terms by interaction order (main effects first)
    uniq.sort(key=lambda t: len(t))
    return Formula(terms=[Term(tuple(t)) for t in uniq], intercept=intercept,
                   source=("~" + body if not src.startswith("~") else src))


# ---------------------------------------------------------------------------
# Design matrix construction (model.matrix.default semantics)
# ---------------------------------------------------------------------------

def _contrast_columns(factor, drop_first):
    """Treatment-contrast indicator columns for a factor.

    drop_first=True  -> columns for levels[1:]  (contr.treatment)
    drop_first=False -> one column per level    (full indicator coding)
    """
    lv = factor.levels
    start = 1 if drop_first else 0
    cols = []
    names = []
    for i in range(start, len(lv)):
        cols.append((factor.codes == i).astype(np.float64))
        names.append(lv[i])
    return cols, names


def build_model_matrix(formula, col_data, n_rows=None):
    """Construct the design matrix for `formula` over `col_data`.

    col_data: dict mapping variable name -> Factor or 1-D numeric array.
    Returns (matrix (S,p) float64, column_names list[str], assign list[int]).

    Implements R model.matrix.default's treatment-contrast logic including
    the rule that the *first* factor term in a no-intercept model gets full
    indicator coding, and interactions use full coding for a factor whose
    main effect's margin is not already spanned.
    """
    formula = parse_formula(formula)
    if n_rows is None:
        for v in col_data.values():
            n_rows = len(v)
            break
        if n_rows is None:
            raise ValueError("cannot infer number of rows")

    def get_var(name):
        if name not in col_data:
            raise KeyError(f"variable '{name}' not found in column data")
        v = col_data[name]
        if isinstance(v, Factor):
            return v
        arr = np.asarray(v)
        if arr.dtype.kind in "OUS" or arr.dtype == bool:
            # characters are rejected upstream by the dataset constructor,
            # but tolerate conversion here for direct calls
            return Factor(arr.astype(str))
        return arr.astype(np.float64)

    columns = []
    names = []
    assign = []

    if formula.intercept:
        columns.append(np.ones(n_rows))
        names.append("(Intercept)")
        assign.append(0)

    # R's rule for coding: a factor in a term gets dummy (drop-first) coding
    # iff the term obtained by removing that factor has already appeared
    # (margin present), else full coding.  With an intercept, the empty
    # margin counts as present.  We reproduce the standard behavior:
    seen_margins = set()
    if formula.intercept:
        seen_margins.add(frozenset())

    for term_idx, term in enumerate(formula.terms, start=1):
        vars_ = term.variables
        parts = []  # list of (cols, names) per variable
        factor_vars = [v for v in vars_ if isinstance(get_var(v), Factor)]
        for v in vars_:
            val = get_var(v)
            if isinstance(val, Factor):
                margin = frozenset(x for x in vars_ if x != v)
                drop_first = margin in seen_margins
                cols, lvl_names = _contrast_columns(val, drop_first)
                parts.append(([c for c in cols], [f"{v}{ln}" for ln in lvl_names]))
            else:
                parts.append(([val], [v]))
        # cross product of parts (R varies the first part fastest)
        idx_lists = [range(len(p[0])) for p in parts]
        for combo in _r_cross(idx_lists):
            col = np.ones(n_rows)
            nm_parts = []
            for pi, ci in enumerate(combo):
                col = col * parts[pi][0][ci]
                nm_parts.append(parts[pi][1][ci])
            columns.append(col)
            names.append(":".join(nm_parts))
            assign.append(term_idx)
        seen_margins.add(frozenset(vars_))

    if not columns:
        raise ValueError("empty model (no intercept and no terms)")
    mat = np.column_stack(columns).astype(np.float64)
    return mat, names, assign


def _r_cross(idx_lists):
    """Cartesian product with the FIRST index varying fastest (R order)."""
    if not idx_lists:
        yield ()
        return
    for rest in _r_cross(idx_lists[1:]):
        for first in idx_lists[0]:
            yield (first,) + rest


# ---------------------------------------------------------------------------
# Naming helpers (reference R/fitNbinomGLMs.R:49-59, R/results.R:1091-1099)
# ---------------------------------------------------------------------------

_R_NAME_OK = re.compile(r"^[A-Za-z.][A-Za-z0-9._]*$")


def make_names(names):
    """R's make.names(): replace invalid characters with '.', prefix 'X' if
    the name does not start with a letter or dot."""
    out = []
    for nm in names:
        s = re.sub(r"[^A-Za-z0-9._]", ".", str(nm))
        if not re.match(r"^[A-Za-z.]", s) or re.match(r"^\.\d", s):
            s = "X" + s
        out.append(s)
    return out


def rename_model_matrix_columns(col_data, formula):
    """Mapping from 'conditionB' style names to 'condition_B_vs_A' style.

    Reference: renameModelMatrixColumns, R/results.R:1091-1099.
    Returns dict {from_name: to_name}.
    """
    formula = parse_formula(formula)
    mapping = {}
    for v in formula.variables:
        val = col_data.get(v)
        if isinstance(val, Factor):
            base = val.levels[0]
            for lvl in val.levels[1:]:
                frm = make_names([f"{v}{lvl}"])[0]
                to = make_names([f"{v}_{lvl}_vs_{base}"])[0]
                mapping[frm] = to
    return mapping
