"""Rule → source-restriction pushdown, mirroring
ComparisonToRestrictionConverterTest.scala (simple and / and-or mix /
unsatisfiable mixed clause / exponential-explosion cap) in tabular form.
"""

import pyarrow as pa

from silk_ray.linking.pushdown import (
    Literal,
    push_rule_filters,
    restriction_filter,
    rule_to_restriction,
)


def _src_eq(path, value, metric="equality"):
    return {
        "metric": metric,
        "source": {"path": path},
        "target": {"transform": "constant", "params": {"value": value}},
    }


def _tgt_eq(path, value, metric="equality"):
    return {
        "metric": metric,
        "source": {"transform": "constant", "params": {"value": value}},
        "target": {"path": path},
    }


def _and(*ops):
    return {"aggregator": "min", "operators": list(ops)}


def _or(*ops):
    return {"aggregator": "max", "operators": list(ops)}


def _not(op):
    return {"aggregator": "negate", "operators": [op]}


def test_simple_and():
    # ComparisonToRestrictionConverterTest.scala:19-32
    rule = {"operator": _and(_src_eq("p1", "P1"), _tgt_eq("t1", "T1"))}
    src = rule_to_restriction(rule, source_or_target=True)
    assert src == [[Literal(True, "p1", "P1", False)]]
    tgt = rule_to_restriction(rule, source_or_target=False)
    assert tgt == [[Literal(False, "t1", "T1", False)]]


def test_and_or_mix_removes_inequalities():
    # ComparisonToRestrictionConverterTest.scala:34-67
    # NOTE: the reference test's targetInEqual helper actually builds an
    # EqualityMetric (ComparisonToRestrictionConverterTest.scala:129-131),
    # so its golden output's `!= "T2"` literal is not(equality) — an
    # inverted equality — which is exactly our flip-through-NOT.
    rule = {
        "operator": _and(
            _or(_not(_src_eq("P1", "P1")), _src_eq("P3", "P3", metric="inequality")),
            _or(_src_eq("P2", "P2")),
            _or(_tgt_eq("T1", "T1"), _not(_tgt_eq("T2", "T2"))),
        )
    }
    # default: clauses with inequalities dropped → only the P2 clause
    src = rule_to_restriction(rule, source_or_target=True)
    assert src == [[Literal(True, "P2", "P2", False)]]
    # target side: its only clause contains an inequality leaf → None
    assert rule_to_restriction(rule, source_or_target=False) is None
    # keep inequalities: both clauses on the source side
    src_all = rule_to_restriction(rule, source_or_target=True, remove_inequalities=False)
    assert len(src_all) == 2
    assert [[l.negated for l in c] for c in src_all] == [[True, True], [False]]
    tgt_all = rule_to_restriction(rule, source_or_target=False, remove_inequalities=False)
    # (= "T1" || != "T2") — the reference's golden FILTER
    assert tgt_all == [[Literal(False, "T1", "T1", False), Literal(False, "T2", "T2", True)]]


def test_mixed_side_clause_is_unsatisfiable():
    # ComparisonToRestrictionConverterTest.scala:69-80
    rule = {"operator": _and(_or(_src_eq("p1", "P1"), _tgt_eq("t1", "T1")))}
    assert rule_to_restriction(rule, source_or_target=True) is None
    assert rule_to_restriction(rule, source_or_target=False) is None


def test_comparison_count_cap():
    # BooleanLinkageRule.scala:157 (MAX = 24)
    ok = {"operator": _and(*[_src_eq(f"p{i}", "v") for i in range(24)])}
    assert rule_to_restriction(ok, source_or_target=True) is not None
    too_many = {"operator": _and(*[_src_eq(f"p{i}", "v") for i in range(25)])}
    assert rule_to_restriction(too_many, source_or_target=True) is None


def test_non_boolean_fragment_returns_none():
    rule = {"operator": {"metric": "levenshteinDistance", "threshold": 2,
                         "source": {"path": "a"}, "target": {"path": "b"}}}
    assert rule_to_restriction(rule, source_or_target=True) is None
    rule2 = {"operator": {"aggregator": "average", "operators": [_src_eq("p", "v")]}}
    assert rule_to_restriction(rule2, source_or_target=True) is None


def test_opaque_comparison_drops_only_its_clause():
    # the common real rule: equality AND a fuzzy measure — the equality
    # clause still pushes (reference: convertComparison returns None per
    # leaf, only that disjunction is skipped)
    rule = {
        "operator": _and(
            _src_eq("lang", "en"),
            {"metric": "levenshteinDistance", "threshold": 2,
             "source": {"path": "a"}, "target": {"path": "b"}},
        )
    }
    assert rule_to_restriction(rule, source_or_target=True) == [[Literal(True, "lang", "en", False)]]
    # but an OR with an opaque leaf cannot push its clause
    rule2 = {"operator": _or(_src_eq("lang", "en"),
                             {"metric": "levenshteinDistance", "threshold": 2,
                              "source": {"path": "a"}, "target": {"path": "b"}})}
    assert rule_to_restriction(rule2, source_or_target=True) is None


def test_numeric_equality_literal():
    from silk_ray.linking.pushdown import NumericLiteral

    rule = {"operator": {"metric": "numericEquality", "params": {"precision": 0.5},
                         "source": {"path": "size"},
                         "target": {"transform": "constant", "params": {"value": "10"}}}}
    r = rule_to_restriction(rule, source_or_target=True)
    assert r == [[NumericLiteral(True, "size", 10.0, 0.5)]]
    fn = restriction_filter(r)
    batch = pa.table({"size": ["10.2", "11.0", None, "junk"], "x": [1, 2, 3, 4]})
    # junk makes the whole column unparseable → clause unknown → no pruning
    assert fn(batch)["x"].to_pylist() == [1, 2, 3, 4]
    clean = pa.table({"size": ["10.2", "11.0", None], "x": [1, 2, 3]})
    assert fn(clean)["x"].to_pylist() == [1, 3]  # 11.0 outside ±0.5; null kept
    # negated numericEquality is not invertible → clause dropped
    neg = {"operator": _not(rule["operator"])}
    assert rule_to_restriction(neg, source_or_target=True) is None
    # unparseable constant → opaque
    bad = {"operator": {"metric": "numericEquality",
                        "source": {"path": "size"},
                        "target": {"transform": "constant", "params": {"value": "ten"}}}}
    assert rule_to_restriction(bad, source_or_target=True) is None


def test_restriction_filter_semantics():
    restriction = [[Literal(True, "lang", "en", False)]]
    fn = restriction_filter(restriction)
    batch = pa.table({"lang": ["en", "de", None], "x": [1, 2, 3]})
    out = fn(batch)
    # null → unknown → kept; "de" pruned
    assert out["x"].to_pylist() == [1, 3]
    # missing column → clause unknown → nothing pruned
    assert fn(pa.table({"y": [1, 2]})).num_rows == 2
    # list-typed column → unknown → nothing pruned
    assert fn(pa.table({"lang": [["en"], ["de"]]})).num_rows == 2


def test_end_to_end_pushdown_matches_unfiltered(ray_session):
    import ray.data as rd

    from silk_ray.linking.pipeline import add_uri_column, generate_links

    rule = {
        "operator": _and(
            _src_eq("lang", "en"),
            _tgt_eq("lang", "en"),
            {
                "metric": "levenshteinDistance",
                "threshold": 2,
                "source": {"path": "name"},
                "target": {"path": "name"},
            },
        )
    }
    rows_s = [{"id": f"s{i}", "name": f"alpha{i}", "lang": "en" if i % 2 else "de"} for i in range(20)]
    rows_t = [{"id": f"t{i}", "name": f"alpha{i}", "lang": "en"} for i in range(20)]
    src = add_uri_column(rd.from_items(rows_s), cols=("id",))
    tgt = add_uri_column(rd.from_items(rows_t), cols=("id",))
    plain = generate_links(src, tgt, rule).to_pandas()
    src2 = add_uri_column(rd.from_items(rows_s), cols=("id",))
    tgt2 = add_uri_column(rd.from_items(rows_t), cols=("id",))
    pushed = generate_links(src2, tgt2, rule, push_filters=True).to_pandas()
    key = lambda df: sorted(map(tuple, df[["source", "target"]].values.tolist()))
    assert key(pushed) == key(plain)
    assert len(plain) > 0
    assert all(s.startswith("s") and int(s[1:]) % 2 for s, _ in key(pushed))


def test_threshold_nonzero_equality_not_pushed():
    # with θ ≥ 1 the scorer links UNEQUAL values (1 - 1/θ ≥ 0), so a
    # hard filter would drop linkable rows — must stay opaque
    op = _src_eq("lang", "en")
    op["threshold"] = 1.0
    assert rule_to_restriction({"operator": op}, source_or_target=True) is None


def test_non_string_columns_are_unknown():
    # Arrow's cast formatting (True→'true', 10.0→'10') differs from the
    # evaluator's str(); non-string columns must not be pruned
    fn = restriction_filter([[Literal(True, "flag", "True", False)]])
    batch = pa.table({"flag": [True, False], "x": [1, 2]})
    assert fn(batch)["x"].to_pylist() == [1, 2]
    fn2 = restriction_filter([[Literal(True, "num", "10.0", False)]])
    assert fn2(pa.table({"num": [10.0, 11.0], "x": [1, 2]}))["x"].to_pylist() == [1, 2]
    # numeric literal over bool is also unknown
    from silk_ray.linking.pushdown import NumericLiteral

    fn3 = restriction_filter([[NumericLiteral(True, "flag", 1.0, 0.0)]])
    assert fn3(pa.table({"flag": [True, False], "x": [1, 2]}))["x"].to_pylist() == [1, 2]


def test_self_link_pushdown_keeps_either_side(ray_session):
    # self-link: the one dataset serves both roles; a row failing only
    # the source restriction must survive (it can still be a target)
    import ray.data as rd

    from silk_ray.linking.pushdown import push_rule_filters_self

    rule = {
        "operator": _and(
            _src_eq("src_lang", "en"),
            _tgt_eq("tgt_lang", "de"),
        )
    }
    ds = rd.from_items(
        [
            {"src_lang": "en", "tgt_lang": "fr", "x": 1},  # valid source only
            {"src_lang": "fr", "tgt_lang": "de", "x": 2},  # valid target only
            {"src_lang": "fr", "tgt_lang": "fr", "x": 3},  # neither → pruned
        ]
    )
    out = push_rule_filters_self(ds, rule).to_pandas()
    assert sorted(out.x) == [1, 2]
