"""Linkage-rule → source-restriction pushdown.

Tabular re-expression of the reference's ComparisonToRestrictionConverter
(silk-rules/.../rule/execution/ComparisonToRestrictionConverter.scala:52-250)
and BooleanLinkageRule (rule/BooleanLinkageRule.scala:13-157):

1. the rule tree is mapped to a boolean tree — ``min`` → AND, ``max`` →
   OR, ``negate`` → NOT; EVERY comparison becomes a boolean leaf:
   ``equality``/``inequality``/``numericEquality`` between a plain path
   input and a ``constant`` transformer become restriction literals,
   any other comparison becomes an *opaque* leaf (still CNF-convertible,
   never pushable — mirroring convertComparison's ``None`` cases,
   :135-147);
2. the boolean tree is converted to CNF (NOT pushed to the leaves by De
   Morgan, OR distributed over AND), capped at
   ``MAX_COMPARISONS_FOR_CNF`` = 24 comparisons like the reference
   (BooleanLinkageRule.scala:157);
3. every CNF clause whose leaves are ALL pushable literals of the
   requested side becomes one filter clause; other clauses are dropped —
   each CNF clause is a necessity, so the pushed filter only removes
   rows that can never link (:79-96). A negated ``numericEquality`` is
   not invertible (NumericEqualityRestriction.inverted = None, :244)
   and drops its clause;
4. clauses containing inequalities are dropped by default
   (``removeDisjunctionsWithInEqualities`` = true, reference.conf:87).

Where the reference emits a SPARQL ``FILTER``, we emit a vectorized
Arrow predicate applied with ``map_batches`` before indexing — the
Ray-Data "prune at the read" analogue. Null / missing / list-typed /
unparseable columns make a literal *unknown* and unknown keeps the row
(the filter must never drop a row the full rule could still link).
Disabled by default like the reference (reference.conf:85,
``pushFilters.enabled``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

MAX_COMPARISONS_FOR_CNF = 24  # BooleanLinkageRule.scala:157


class NotConvertible(Exception):
    pass


@dataclass(frozen=True)
class Literal:
    source_side: bool  # True = restricts the source dataset
    path: str
    value: str
    negated: bool  # True = inequality


@dataclass(frozen=True)
class NumericLiteral:
    source_side: bool
    path: str
    value: float
    precision: float
    negated: bool = False  # negated is never pushable (inverted = None)


@dataclass(frozen=True)
class Opaque:
    """A comparison with boolean semantics (score ≥ threshold) that no
    source filter can express; drops any clause it appears in."""

    negated: bool = False


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


def _const_value(spec: dict):
    if spec.get("transform") in ("constant", "constantUri") and not spec.get("inputs"):
        return str(spec.get("params", {}).get("value", ""))
    return None


def _comparison_leaf(spec: dict) -> object:
    """One comparison → restriction literal or opaque leaf
    (convertComparison, ComparisonToRestrictionConverter.scala:135-147).

    Only threshold-0 comparisons convert: with θ ≥ 1 this engine's
    scorer links UNEQUAL values (score 1−d/θ ≥ 0 at d=1,
    kernel/rule.py Comparison.apply), so a hard filter would drop
    linkable rows."""
    metric = spec["metric"]
    if float(spec.get("threshold", 0.0)) != 0.0:
        return Opaque()
    s_in, t_in = spec.get("source", {}), spec.get("target", {})
    s_const, t_const = _const_value(s_in), _const_value(t_in)
    if s_const is not None and "path" in t_in and len(t_in) == 1:
        side, path, const = False, t_in["path"], s_const
    elif t_const is not None and "path" in s_in and len(s_in) == 1:
        side, path, const = True, s_in["path"], t_const
    else:
        return Opaque()
    if metric in ("equality", "inequality"):
        return Literal(side, path, const, metric == "inequality")
    if metric == "numericEquality":
        try:
            value = float(const)
        except ValueError:
            return Opaque()
        precision = float(spec.get("params", {}).get("precision", 0.0))
        return NumericLiteral(side, path, value, precision)
    return Opaque()


def _to_boolean(spec: dict, counter: list) -> object:
    """Rule-spec subtree → boolean tree (BooleanLinkageRule.scala:13-60
    semantics); raises NotConvertible outside the boolean fragment or
    over the comparison cap."""
    if "metric" in spec:
        counter[0] += 1
        if counter[0] > MAX_COMPARISONS_FOR_CNF:
            raise NotConvertible("too many comparisons for CNF conversion")
        return _comparison_leaf(spec)
    agg = spec.get("aggregator")
    ops = spec.get("operators", [])
    if agg == "min":
        return And(tuple(_to_boolean(o, counter) for o in ops))
    if agg == "max":
        return Or(tuple(_to_boolean(o, counter) for o in ops))
    if agg == "negate":
        if len(ops) != 1:
            raise NotConvertible("negate requires exactly one child")
        return Not(_to_boolean(ops[0], counter))
    raise NotConvertible(f"aggregator {agg!r} has no boolean semantics")


def _flip(leaf: object) -> object:
    if isinstance(leaf, Literal):
        return Literal(leaf.source_side, leaf.path, leaf.value, not leaf.negated)
    if isinstance(leaf, NumericLiteral):
        return NumericLiteral(leaf.source_side, leaf.path, leaf.value, leaf.precision, not leaf.negated)
    return Opaque(not leaf.negated)


def _push_not(node: object, flip: bool = False) -> object:
    if isinstance(node, (Literal, NumericLiteral, Opaque)):
        return _flip(node) if flip else node
    if isinstance(node, Not):
        return _push_not(node.child, not flip)
    cls = And if isinstance(node, And) else Or
    if flip:
        cls = Or if cls is And else And
    return cls(tuple(_push_not(c, flip) for c in node.children))


def _to_cnf(node: object) -> list[list]:
    """NNF tree → list of OR-clauses (each a list of leaves)."""
    if isinstance(node, (Literal, NumericLiteral, Opaque)):
        return [[node]]
    if isinstance(node, And):
        out = []
        for c in node.children:
            out.extend(_to_cnf(c))
        return out
    # Or: distribute over the children's clause sets
    clause_sets = [_to_cnf(c) for c in node.children]
    acc: list[list] = [[]]
    for cs in clause_sets:
        nxt = []
        for base in acc:
            for clause in cs:
                if len(nxt) > 4096:
                    raise NotConvertible("CNF distribution exploded")
                nxt.append(base + clause)
        acc = nxt
    return acc


def _clause_pushable(clause: list, source_or_target: bool, remove_inequalities: bool) -> bool:
    for leaf in clause:
        if isinstance(leaf, Opaque):
            return False
        if leaf.source_side != source_or_target:
            return False  # mixes sides → satisfiable by neither filter alone
        if isinstance(leaf, NumericLiteral) and leaf.negated:
            return False  # NumericEqualityRestriction.inverted = None
        if remove_inequalities and leaf.negated:
            return False
    return True


def rule_to_restriction(
    rule_spec: dict,
    source_or_target: bool,
    remove_inequalities: bool = True,
) -> list[list] | None:
    """Restriction implied by the rule for one side as CNF clauses, or
    ``None`` when nothing can be pushed (the reference returns no
    restriction in exactly these cases)."""
    spec = rule_spec.get("operator", rule_spec)
    try:
        cnf = _to_cnf(_push_not(_to_boolean(spec, [0])))
    except NotConvertible:
        return None
    kept = [c for c in cnf if _clause_pushable(c, source_or_target, remove_inequalities)]
    return kept or None


def _numeric_mask(col: pa.ChunkedArray, lit: NumericLiteral):
    try:
        vals = pc.cast(col, pa.float64())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None  # unparseable column → unknown
    if lit.precision == 0.0:
        return pc.equal(vals, lit.value)
    return pc.less_equal(pc.abs(pc.subtract(vals, lit.value)), lit.precision)


def restriction_mask(batch: pa.Table, restriction: list[list]):
    """Boolean keep-mask for a restriction over one batch: AND of
    clauses, OR within a clause; unknown literals (missing / list-typed
    / non-string-typed / unparseable column, null value) count as
    satisfied so no linkable row is dropped."""
    n = batch.num_rows
    keep = pa.array([True] * n)
    for clause in restriction:
        clause_mask = None
        unknown = False
        for lit in clause:
            if lit.path not in batch.column_names:
                unknown = True
                continue
            col = batch[lit.path]
            if isinstance(lit, NumericLiteral):
                # numeric semantics are cast-stable only for numeric and
                # string columns; anything else (bool, date, …) formats
                # differently than the evaluator's str() → unknown
                if not (
                    pa.types.is_string(col.type)
                    or pa.types.is_integer(col.type)
                    or pa.types.is_floating(col.type)
                ):
                    unknown = True
                    continue
                m = _numeric_mask(col, lit)
                if m is None:
                    unknown = True
                    continue
            else:
                # Arrow's cast-to-string formatting differs from the
                # evaluator's Python str() (True→'true', 10.0→'10'),
                # so string equality only applies to string columns
                if not pa.types.is_string(col.type):
                    unknown = True
                    continue
                m = pc.equal(col, lit.value)
            if lit.negated:
                m = pc.invert(m)
            m = pc.fill_null(m, True)  # null value → unknown → keep
            clause_mask = m if clause_mask is None else pc.or_(clause_mask, m)
        if unknown or clause_mask is None:
            continue  # clause can't be evaluated here → no pruning
        keep = pc.and_(keep, clause_mask)
    return keep


def restriction_filter(restriction: list[list]):
    """Vectorized batch predicate applying :func:`restriction_mask`."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(restriction_mask(batch, restriction))

    return fn


def push_rule_filters(ds, rule_spec: dict, source_or_target: bool, remove_inequalities: bool = True):
    """Apply the pushable part of ``rule_spec`` to ``ds`` as a prefilter;
    returns ``ds`` unchanged when nothing can be pushed."""
    restriction = rule_to_restriction(rule_spec, source_or_target, remove_inequalities)
    if restriction is None:
        return ds
    return ds.map_batches(restriction_filter(restriction), batch_format="pyarrow")


def push_rule_filters_self(ds, rule_spec: dict, remove_inequalities: bool = True):
    """Self-link variant: the shared dataset serves BOTH roles, so a row
    may be pruned only when it fails the source-side restriction AND the
    target-side restriction (it can then appear in no link at all).
    Requires both sides to convert; otherwise nothing is pruned."""
    rs = rule_to_restriction(rule_spec, True, remove_inequalities)
    rt = rule_to_restriction(rule_spec, False, remove_inequalities)
    if rs is None or rt is None:
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.or_(restriction_mask(batch, rs), restriction_mask(batch, rt))
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")
