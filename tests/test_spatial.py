"""Spatial pack vectors, ported from the reference's spatial plugin tests
(silk-plugins-spatial-temporal/src/test/.../spatial/)."""

import math

import pytest

from silk_ray.kernel.distances import get_distance
from silk_ray.kernel.spatial import de9im, parse_wkt, relate, to_wkt
from silk_ray.kernel.transformers import get_transformer

INF = math.inf

SQUARE = "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"


# --- relation metric vectors (spatial/relation/*MetricTest.scala) ----------


def test_contains_metric():
    m = get_distance("SContainsMetric")
    assert m.evaluate(SQUARE, "POINT (1 1)", 0.0) == 0.0


def test_crosses_metric():
    m = get_distance("CrossesMetric")
    assert m.evaluate("LINESTRING (0 0, 2 2)", "LINESTRING (2 0, 0 2)", 0.0) == 0.0


def test_disjoint_metric():
    m = get_distance("DisjointMetric")
    assert m.evaluate(SQUARE, "POINT (3 3)", 0.0) == 0.0


def test_equals_metric():
    m = get_distance("SEqualsMetric")
    assert m.evaluate("POINT (0 0)", "POINT (0 0)", 0.0) == 0.0


def test_intersects_metric():
    m = get_distance("IntersectsMetric")
    assert (
        m.evaluate(
            "POLYGON ((0 0, 0 3, 3 3, 3 0, 0 0))",
            "POLYGON ((1 1, 1 2, 2 2, 2 1, 1 1))",
            0.0,
        )
        == 0.0
    )


def test_touches_metric():
    m = get_distance("TouchesMetric")
    assert m.evaluate(SQUARE, "POLYGON ((0 2, 0 4, 4 4, 4 2, 0 2))", 0.0) == 0.0


def test_overlaps_metric():
    m = get_distance("SOverlapsMetric")
    assert m.evaluate(SQUARE, "POLYGON ((0 1, 0 3, 3 3, 3 1, 0 1))", 0.0) == 0.0


def test_within_metric():
    m = get_distance("WithinMetric")
    assert m.evaluate("POINT (1 1)", SQUARE, 0.0) == 0.0
    assert m.evaluate("POINT (3 3)", SQUARE, 0.0) != 0.0


def test_relate_metric():
    # disjoint DE-9IM pattern (RelateMetricTest.scala)
    m = get_distance("RelateMetric", relation="FF*FF****")
    assert m.evaluate(SQUARE, "POINT (3 3)", 0.0) == 0.0


def test_negate_relation_metric():
    # NegateMetricTest.scala
    neg_disjoint = get_distance("NegateRelationMetric", relation="FF*FF****")
    assert neg_disjoint.evaluate(SQUARE, "POINT (3 3)", 0.0) == INF
    neg_contains = get_distance("NegateRelationMetric", relation="contains")
    assert neg_contains.evaluate(SQUARE, "POINT (0 3)", 0.0) == 0.0


def test_within_multipolygon():
    # WithinMetricTest.scala test 3 (simplified polygon shape, same
    # semantics: point inside a MULTIPOLYGON shell)
    m = get_distance("WithinMetric")
    mp = "MULTIPOLYGON(((10.6 52.3, 10.6 52.5, 10.9 52.5, 10.9 52.3, 10.6 52.3)))"
    assert m.evaluate("POINT(10.7381045 52.3717856)", mp, 0.0) == 0.0


# --- distance metric vectors (spatial/distance/*MetricTest.scala) ----------


def test_centroid_distance_metric():
    m = get_distance("CentroidDistanceMetric")
    assert m.evaluate("POINT (0 0)", "POINT (0 0)", 1.0) == 0.0
    # polygon centroid == point
    assert m.evaluate(SQUARE, "POINT (1 1)", 1.0) == 0.0
    a, b = "POINT (37.9889023 23.7180747)", "POINT (37.9884826 23.7181476)"
    assert m.evaluate(a, b, 100.0) != INF
    assert m.evaluate(a, b, 10.0) == INF


def test_min_distance_metric():
    m = get_distance("MinDistanceMetric")
    assert m.evaluate("POINT (0 0)", "POINT (0 0)", 1.0) == 0.0
    assert m.evaluate(SQUARE, "POINT (1 1)", 1.0) == 0.0  # contained → 0
    a, b = "POINT (37.9889023 23.7180747)", "POINT (37.9884826 23.7181476)"
    assert m.evaluate(a, b, 100.0) != INF
    assert m.evaluate(a, b, 10.0) == INF


def test_envelope_blocking_index():
    m = get_distance("CentroidDistanceMetric")
    i1 = m.index(["POINT (37.98 23.71)"], 5000.0, True)
    i2 = m.index(["POINT (37.99 23.72)"], 5000.0, False)
    assert i1.matches(i2)


# --- transformer vectors (spatial/transformer/*TransformerTest.scala) ------


def test_area_transformer():
    t = get_transformer("AreaTransformer")
    assert t.apply([["POINT (0 0)"]]) == ["0.0"]
    assert t.apply([[SQUARE]]) == ["4.0"]


def test_buffer_transformer():
    t = get_transformer("BufferTransformer")
    assert t.apply([["POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0, 1 1, 0 0))"]]) == [SQUARE]


def test_envelope_transformer():
    t = get_transformer("EnvelopeTransformer")
    assert t.apply([["POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0, 1 1, 0 0))"]]) == [SQUARE]


def test_geometry_transformer():
    t = get_transformer("GeometryTransformer")
    assert t.apply([["Point(1 0)"]]) == ["Point(1 0)"]
    assert t.apply([["<http://www.opengis.net/def/crs/EPSG/0/4326> POINT (1 0)"]]) == ["POINT (1 0)"]
    assert t.apply([["<http://www.opengis.net/def/crs/EPSG/0/3857> POINT (0 0)"]]) == ["POINT (0 0)"]
    assert t.apply([["POINT (1 0);http://www.opengis.net/def/crs/EPSG/0/4326"]]) == ["POINT (1 0)"]
    assert t.apply([["POINT (0 0);http://www.opengis.net/def/crs/EPSG/0/3857"]]) == ["POINT (0 0)"]
    assert t.apply([["1"], ["0"]]) == ["POINT (1 0)"]


def test_points_to_centroid_transformer():
    t = get_transformer("PointsToCentroidCTransformer")
    assert t.apply([["1", "3"], ["1", "3"]]) == ["POINT (2.0 2.0)"]


def test_simplify_transformer():
    t = get_transformer("SimplifyTransformer", distanceTolerance=0.5)
    out = t.apply([["LINESTRING (0 0, 1 0.1, 2 0)"]])
    assert out == ["LINESTRING (0 0, 2 0)"]
    keep = get_transformer("SimplifyTransformer", distanceTolerance=0.01)
    assert keep.apply([["LINESTRING (0 0, 1 0.1, 2 0)"]]) == ["LINESTRING (0 0, 1 0.1, 2 0)"]


# --- DE-9IM sanity beyond the reference vectors ----------------------------


def test_de9im_predicates():
    sq = parse_wkt(SQUARE)
    assert relate(sq, sq, "equals")
    assert relate(sq, parse_wkt("POINT (1 1)"), "contains")
    assert relate(parse_wkt("POINT (1 1)"), sq, "within")
    assert relate(sq, parse_wkt("POLYGON ((1 1, 1 3, 3 3, 3 1, 1 1))"), "overlaps")
    assert not relate(sq, parse_wkt("POLYGON ((0 2, 0 4, 4 4, 4 2, 0 2))"), "overlaps")
    assert relate(sq, parse_wkt("POLYGON ((0 2, 0 4, 4 4, 4 2, 0 2))"), "touches")
    # point on boundary: touches, not within
    assert relate(parse_wkt("POINT (0 1)"), sq, "touches")
    assert not relate(parse_wkt("POINT (0 1)"), sq, "within")
    # line through polygon: crosses
    assert relate(parse_wkt("LINESTRING (-1 1, 3 1)"), sq, "crosses")
    # line along boundary: touches
    assert relate(parse_wkt("LINESTRING (0 0, 0 2)"), sq, "touches")
    # polygon containing polygon with shared boundary is NOT within-proper? it is within
    inner = parse_wkt("POLYGON ((0.5 0.5, 0.5 1.5, 1.5 1.5, 1.5 0.5, 0.5 0.5))")
    assert relate(inner, sq, "within")
    assert relate(sq, inner, "contains")
    # holes: point inside the hole is outside the polygon
    donut = parse_wkt(
        "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))"
    )
    assert relate(parse_wkt("POINT (2 2)"), donut, "disjoint")
    assert relate(parse_wkt("POINT (0.5 0.5)"), donut, "within")


def test_wkt_roundtrip():
    for wkt in (
        "POINT (1 0)",
        "LINESTRING (0 0, 1 1, 2 0)",
        SQUARE,
        "MULTIPOINT (0 0, 1 1)",
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)))",
    ):
        assert to_wkt(parse_wkt(wkt)) == wkt
