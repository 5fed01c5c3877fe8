"""Aggregator conformance — exact example vectors ported from the
reference's @AggregatorExamples annotations
(silk-rules/.../rule/plugins/aggegrator/*.scala)."""

import pytest

from silk_ray.kernel.aggregators import AGGREGATORS, get_aggregator
from silk_ray.kernel.index import Index

N = None  # missing score (Double.NaN in the annotations)

# (aggregator_id, params, [(score, weight), ...], expected or None)
VECTORS = [
    # AverageAggregator.scala:28-43
    ("average", {}, [(0.4, 1), (0.5, 1), (0.9, 1)], 0.6),
    ("average", {}, [(0.3, 1), (0.5, 1), (0.6, 2)], 0.5),
    ("average", {}, [(-1.0, 1), (N, 1), (1.0, 1)], None),
    # MinimumAggregator.scala
    ("min", {}, [(1.0, 1), (0.0, 1)], 0.0),
    ("min", {}, [(-1.0, 1), (0.0, 1), (0.5, 1), (1.0, 1)], -1.0),
    ("min", {}, [(1.0, 1), (N, 1), (-0.5, 1)], -1.0),
    ("min", {}, [(1.0, 1000), (0.0, 1)], 0.0),  # weights ignored
    # MaximumAggregator.scala
    ("max", {}, [(0.5, 1), (0.0, 1)], 0.5),
    ("max", {}, [(-1.0, 1), (-0.5, 1), (-0.3, 1)], -0.3),
    ("max", {}, [(N, 1)], -1.0),
    ("max", {}, [(1.0, 1000), (0.0, 1)], 1.0),
    # GeometricMeanAggregator.scala
    ("geometricMean", {}, [(0.0, 1), (0.0, 2), (0.0, 1)], 0.0),
    ("geometricMean", {}, [(1.0, 1), (1.0, 2), (1.0, 1)], 1.0),
    ("geometricMean", {}, [(0.5, 2), (1.0, 1)], 0.629961),
    ("geometricMean", {}, [(0.5, 2), (1.0, 1), (0.7, 5)], 0.672866),
    ("geometricMean", {}, [(0.1, 10), (0.9, 2), (0.2, 3)], 0.153971),
    ("geometricMean", {}, [(-1.0, 1), (N, 1), (1.0, 1)], None),
    # QuadraticMeanAggregator.scala
    ("quadraticMean", {}, [(1.0, 1), (1.0, 1), (1.0, 1)], 1.0),
    ("quadraticMean", {}, [(1.0, 1), (0.0, 1)], 0.707107),
    ("quadraticMean", {}, [(0.4, 1), (0.5, 1), (0.6, 1)], 0.506623),
    ("quadraticMean", {}, [(0.0, 1), (0.0, 1)], 0.0),
    ("quadraticMean", {}, [(1.0, 2), (0.0, 1), (0.0, 1)], 0.707107),
    ("quadraticMean", {}, [(0.4, 1), (0.5, 2), (0.6, 3)], 0.538516),
    ("quadraticMean", {}, [(-1.0, 1), (N, 1), (1.0, 1)], None),
    # ScalingAggregator.scala
    ("scale", {"factor": 0.5}, [(1.0, 1)], 0.5),
    ("scale", {"factor": 0.1}, [(0.1, 1)], 0.01),
    ("scale", {}, [(N, 1)], None),
    # HandleMissingValuesAggregator.scala
    ("handleMissingValues", {}, [(0.1, 1)], 0.1),
    ("handleMissingValues", {"defaultValue": 1.0}, [(N, 1)], 1.0),
    # NegationAggregator.scala
    ("negate", {}, [(0.5, 1)], -0.5),
    ("negate", {}, [(N, 1)], 1.0),
]


@pytest.mark.parametrize("agg_id,params,values,expected", VECTORS)
def test_aggregator_vectors(agg_id, params, values, expected):
    agg = get_aggregator(agg_id, **params)
    result = agg.evaluate(values, limit=0.0)
    if expected is None:
        assert result is None
    else:
        assert result == pytest.approx(expected, abs=1e-5)


def test_registry_has_all_eight():
    assert set(AGGREGATORS) == {
        "average", "min", "max", "geometricMean", "quadraticMean",
        "scale", "negate", "handleMissingValues",
    }


def test_index_combination_modes():
    i1, i2 = Index.one_dim({1}), Index.one_dim({2})
    # disjunction for average/max: either child key matches
    d = get_aggregator("average").aggregate_indexes([i1, i2])
    assert d.matches(Index.one_dim({1}).disjunction(Index.one_dim(set())))
    # conjunction for min: both needed
    c = get_aggregator("min").aggregate_indexes([i1, i2])
    assert c.matches(i1.conjunction(i2))
    assert not c.matches(i1.conjunction(Index.one_dim({9})))
    # negate/handleMissingValues disable blocking → default index
    n = get_aggregator("negate").aggregate_indexes([i1, i2])
    assert n == Index.default()
    # empty → Index.empty
    assert get_aggregator("average").aggregate_indexes([]).is_empty()


def test_min_respects_limit():
    agg = get_aggregator("min")
    # score below the current confidence limit kills the pair
    assert agg.evaluate([(0.3, 1), (0.9, 1)], limit=0.5) == -1.0
    assert agg.evaluate([(0.6, 1), (0.9, 1)], limit=0.5) == 0.6
