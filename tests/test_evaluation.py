"""Ported reference vectors: EvaluationResultTest.scala:12-24 plus
LinkageRuleEvaluator-style set comparison."""

from silk_ray.kernel.evaluation import EvaluationResult, evaluate_links


def test_true_values_only():
    # EvaluationResultTest.scala:12-17
    r = EvaluationResult(true_positives=1, true_negatives=9999, false_positives=0, false_negatives=0)
    assert r.precision == 1.0
    assert r.recall == 1.0
    assert r.f_measure == 1.0


def test_mixed_values():
    # EvaluationResultTest.scala:19-24
    r = EvaluationResult(true_positives=1, true_negatives=9999, false_positives=1, false_negatives=1)
    assert r.precision == 0.5
    assert r.recall == 0.5
    assert r.f_measure == 0.5


def test_zero_denominators():
    r = EvaluationResult(0, 0, 0, 0)
    assert r.precision == 0.0 and r.recall == 0.0 and r.f_measure == 0.0 and r.mcc == 0.0


def test_evaluate_links_sets():
    found = {("a", "b"), ("c", "d")}
    positives = {("a", "b"), ("e", "f")}
    negatives = {("c", "d")}
    r = evaluate_links(found, positives, negatives)
    assert r.true_positives == 1   # (a,b)
    assert r.false_negatives == 1  # (e,f) missed
    assert r.false_positives == 1  # (c,d) found but negative
    assert r.true_negatives == 0
