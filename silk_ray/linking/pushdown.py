"""Linkage-rule → source-restriction pushdown.

Tabular re-expression of the reference's ComparisonToRestrictionConverter
(silk-rules/.../rule/execution/ComparisonToRestrictionConverter.scala:52-140)
and BooleanLinkageRule (rule/BooleanLinkageRule.scala:13-157):

1. the rule tree is mapped to a boolean tree — ``min`` → AND, ``max`` →
   OR, ``negate`` → NOT, an ``equality``/``inequality`` comparison
   between a plain path input and a ``constant`` transformer becomes a
   literal; anything else aborts the conversion (returns ``None``);
2. the boolean tree is converted to CNF (NOT pushed to the leaves by De
   Morgan, OR distributed over AND), capped at
   ``MAX_COMPARISONS_FOR_CNF`` = 24 comparisons like the reference
   (BooleanLinkageRule.scala:157);
3. every CNF clause whose literals ALL restrict the requested side
   becomes one filter clause; other clauses are dropped — each CNF
   clause is a necessity, so the pushed filter only removes rows that
   can never link (ComparisonToRestrictionConverter.scala:79-96);
4. clauses containing inequalities are dropped by default
   (``removeDisjunctionsWithInEqualities`` = true, reference.conf:87).

Where the reference emits a SPARQL ``FILTER``, we emit a vectorized
Arrow predicate applied with ``map_batches`` before indexing — the
Ray-Data "prune at the read" analogue. Null / missing / list-typed
columns make a literal *unknown* and unknown keeps the row (the filter
must never drop a row the full rule could still link). Disabled by
default like the reference (reference.conf:85, ``pushFilters.enabled``).
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


def _to_boolean(spec: dict, counter: list) -> object:
    """Rule-spec subtree → boolean tree (BooleanLinkageRule.scala:13-60
    semantics); raises NotConvertible outside the supported fragment."""
    if "metric" in spec:
        counter[0] += 1
        if counter[0] > MAX_COMPARISONS_FOR_CNF:
            raise NotConvertible("too many comparisons for CNF conversion")
        metric = spec["metric"]
        if metric not in ("equality", "inequality"):
            raise NotConvertible(f"metric {metric!r} is not a boolean restriction")
        s_in, t_in = spec.get("source", {}), spec.get("target", {})
        s_const, t_const = _const_value(s_in), _const_value(t_in)
        if s_const is not None and "path" in t_in and len(t_in) == 1:
            lit = Literal(False, t_in["path"], s_const, metric == "inequality")
        elif t_const is not None and "path" in s_in and len(s_in) == 1:
            lit = Literal(True, s_in["path"], t_const, metric == "inequality")
        else:
            raise NotConvertible("comparison is not plain-path vs constant")
        return lit
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


def _push_not(node: object, flip: bool = False) -> object:
    if isinstance(node, Literal):
        return Literal(node.source_side, node.path, node.value, node.negated ^ flip) if flip else node
    if isinstance(node, Not):
        return _push_not(node.child, not flip)
    cls = And if isinstance(node, And) else Or
    if flip:
        cls = Or if cls is And else And
    return cls(tuple(_push_not(c, flip) for c in node.children))


def _to_cnf(node: object) -> list[list[Literal]]:
    """NNF tree → list of OR-clauses (each a list of literals)."""
    if isinstance(node, Literal):
        return [[node]]
    if isinstance(node, And):
        out = []
        for c in node.children:
            out.extend(_to_cnf(c))
        return out
    # Or: distribute over the children's clause sets
    clause_sets = [_to_cnf(c) for c in node.children]
    acc: list[list[Literal]] = [[]]
    for cs in clause_sets:
        nxt = []
        for base in acc:
            for clause in cs:
                merged = base + clause
                if len(nxt) > 4096:
                    raise NotConvertible("CNF distribution exploded")
                nxt.append(merged)
        acc = nxt
    return acc


def rule_to_restriction(
    rule_spec: dict,
    source_or_target: bool,
    remove_inequalities: bool = True,
) -> list[list[Literal]] | None:
    """Restriction implied by the rule for one side as CNF clauses, or
    ``None`` when nothing can be pushed (the reference returns no
    restriction in exactly these cases)."""
    spec = rule_spec.get("operator", rule_spec)
    try:
        cnf = _to_cnf(_push_not(_to_boolean(spec, [0])))
    except NotConvertible:
        return None
    kept = []
    for clause in cnf:
        if any(lit.source_side != source_or_target for lit in clause):
            continue  # mixes sides → satisfiable by neither filter alone
        if remove_inequalities and any(lit.negated for lit in clause):
            continue
        kept.append(clause)
    return kept or None


def restriction_filter(restriction: list[list[Literal]]):
    """Vectorized batch predicate for a restriction: AND of clauses, OR
    within a clause; unknown literals (missing / list-typed column,
    null value) count as satisfied so no linkable row is dropped."""

    def fn(batch: pa.Table) -> pa.Table:
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
                if pa.types.is_nested(col.type):
                    unknown = True
                    continue
                col = col if pa.types.is_string(col.type) else pc.cast(col, pa.string())
                m = pc.equal(col, lit.value)
                if lit.negated:
                    m = pc.invert(m)
                m = pc.fill_null(m, True)  # null value → unknown → keep
                clause_mask = m if clause_mask is None else pc.or_(clause_mask, m)
            if unknown or clause_mask is None:
                continue  # clause can't be evaluated here → no pruning
            keep = pc.and_(keep, clause_mask)
        return batch.filter(keep)

    return fn


def push_rule_filters(ds, rule_spec: dict, source_or_target: bool, remove_inequalities: bool = True):
    """Apply the pushable part of ``rule_spec`` to ``ds`` as a prefilter;
    returns ``ds`` unchanged when nothing can be pushed."""
    restriction = rule_to_restriction(rule_spec, source_or_target, remove_inequalities)
    if restriction is None:
        return ds
    return ds.map_batches(restriction_filter(restriction), batch_format="pyarrow")
