"""Pure-Python / pyarrow rule kernel with Silk-equivalent semantics.

No Ray dependency: everything in this subpackage operates on plain
Python values (cells are ``list[str]``) or Arrow arrays, so it can run
inside ``map_batches`` workers and be unit-tested without a cluster.
"""

from silk_ray.kernel.index import Index
from silk_ray.kernel.distances import DISTANCE_MEASURES, get_distance
from silk_ray.kernel.aggregators import AGGREGATORS, get_aggregator
from silk_ray.kernel.transformers import TRANSFORMERS, get_transformer
from silk_ray.kernel.rule import (
    Aggregation,
    Comparison,
    LinkageRule,
    PathInput,
    TransformInput,
)
from silk_ray.kernel.evaluation import EvaluationResult, evaluate_links
from silk_ray.kernel import temporal as _temporal  # noqa: F401 — registers the temporal pack
from silk_ray.kernel import spatial as _spatial  # noqa: F401 — registers the spatial pack
from silk_ray.kernel import asian as _asian  # noqa: F401 — registers the asian pack

__all__ = [
    "Index",
    "DISTANCE_MEASURES",
    "get_distance",
    "AGGREGATORS",
    "get_aggregator",
    "TRANSFORMERS",
    "get_transformer",
    "PathInput",
    "TransformInput",
    "Comparison",
    "Aggregation",
    "LinkageRule",
    "EvaluationResult",
    "evaluate_links",
]
