"""Link evaluation metrics — TP/TN/FP/FN, precision/recall/F1/MCC.

Mirrors ``silk-rules/.../rule/evaluation/EvaluationResult.scala:36-64``
and ``LinkageRuleEvaluator.scala:10-85``: positives are reference links
expected to score ≥ 0, negatives reference non-links expected to score
< 0.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class EvaluationResult:
    true_positives: int
    true_negatives: int
    false_positives: int
    false_negatives: int

    @property
    def precision(self) -> float:
        denom = self.true_positives + self.false_positives
        return self.true_positives / denom if denom else 0.0

    @property
    def recall(self) -> float:
        denom = self.true_positives + self.false_negatives
        return self.true_positives / denom if denom else 0.0

    @property
    def f_measure(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    @property
    def mcc(self) -> float:
        tp, tn, fp, fn = (
            self.true_positives,
            self.true_negatives,
            self.false_positives,
            self.false_negatives,
        )
        denom = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        return (tp * tn - fp * fn) / denom if denom else 0.0


def evaluate_links(
    found: set[tuple[str, str]],
    positives: set[tuple[str, str]],
    negatives: set[tuple[str, str]] | None = None,
) -> EvaluationResult:
    """Compare a found link set against reference links
    (LinkageRuleEvaluator semantics: each positive should be found, each
    negative should not)."""
    negatives = negatives or set()
    tp = len(found & positives)
    fn = len(positives - found)
    fp = len(found & negatives)
    tn = len(negatives - found)
    return EvaluationResult(tp, tn, fp, fn)


def pairs_completeness(candidate_pairs: set[tuple[str, str]], positives: set[tuple[str, str]]) -> float:
    """Recall of candidate generation (GenerateLinksTest.scala:104-125)."""
    if not positives:
        return 1.0
    return len(candidate_pairs & positives) / len(positives)


def pairs_quality(candidate_pairs: set[tuple[str, str]], positives: set[tuple[str, str]]) -> float:
    """Precision of candidate generation."""
    if not candidate_pairs:
        return 0.0
    return len(candidate_pairs & positives) / len(candidate_pairs)
