"""Supervised linkage-rule learning (GenLink genetic programming)."""

from silk_ray.learning.genlink import (
    LearningConfig,
    LearningResult,
    ReferenceEntities,
    RuleGenerator,
    evaluate_rule,
    learn,
)

__all__ = [
    "LearningConfig",
    "LearningResult",
    "ReferenceEntities",
    "RuleGenerator",
    "evaluate_rule",
    "learn",
]
