"""Temporal pack conformance (reference: silk-plugins-spatial-temporal
temporal distance/relation metrics; semantics from utils/Utils.scala)."""

import math

import pytest

import silk_ray.kernel.temporal  # noqa: F401  (registers plugins)
from silk_ray.kernel.distances import get_distance


def test_unit_distances():
    d_days = get_distance("DaysDistanceMetric")
    assert d_days.evaluate("2020-01-01", "2020-01-11") == pytest.approx(10.0)
    d_hours = get_distance("HoursDistanceMetric")
    assert d_hours.evaluate("2020-01-01T00:00:00", "2020-01-01T06:00:00") == pytest.approx(6.0)
    d_years = get_distance("YearsDistanceMetric")
    assert d_years.evaluate("2019-01-01", "2020-01-01") == pytest.approx(1.0)
    d_secs = get_distance("SecsDistanceMetric")
    assert d_secs.evaluate("2020-01-01T00:00:00", "2020-01-01T00:01:30") == pytest.approx(90.0)
    assert d_secs.evaluate("garbage", "2020-01-01") == math.inf


def test_period_distance_is_min_endpoint_diff():
    d = get_distance("DaysDistanceMetric")
    # overlapping periods → closest endpoints 0-ish
    assert d.evaluate("[2020-01-01, 2020-02-01]", "[2020-02-01, 2020-03-01]") == pytest.approx(0.0)
    assert d.evaluate("[2020-01-01, 2020-01-10]", "[2020-01-20, 2020-01-30]") == pytest.approx(10.0)


@pytest.mark.parametrize(
    "rel,a,b,holds",
    [
        ("BeforeMetric", "[2020-01-01, 2020-01-05]", "[2020-01-10, 2020-01-20]", True),
        ("BeforeMetric", "[2020-01-01, 2020-01-15]", "[2020-01-10, 2020-01-20]", False),
        ("AfterMetric", "[2020-02-01, 2020-02-05]", "[2020-01-01, 2020-01-20]", True),
        ("MeetsMetric", "[2020-01-01, 2020-01-10]", "[2020-01-10, 2020-01-20]", True),
        ("IsMetByMetric", "[2020-01-10, 2020-01-20]", "[2020-01-01, 2020-01-10]", True),
        ("OverlapsMetric", "[2020-01-01, 2020-01-15]", "[2020-01-10, 2020-01-20]", True),
        ("IsOverlappedByMetric", "[2020-01-10, 2020-01-20]", "[2020-01-01, 2020-01-15]", True),
        ("DuringMetric", "[2020-01-05, 2020-01-10]", "[2020-01-01, 2020-01-20]", True),
        ("ContainsMetric", "[2020-01-01, 2020-01-20]", "[2020-01-05, 2020-01-10]", True),
        ("StartsMetric", "[2020-01-01, 2020-01-10]", "[2020-01-01, 2020-01-20]", True),
        ("IsStartedByMetric", "[2020-01-01, 2020-01-20]", "[2020-01-01, 2020-01-10]", True),
        ("FinishesMetric", "[2020-01-10, 2020-01-20]", "[2020-01-01, 2020-01-20]", True),
        ("IsFinishedByMetric", "[2020-01-01, 2020-01-20]", "[2020-01-10, 2020-01-20]", True),
        ("EqualsMetric", "[2020-01-01, 2020-01-20]", "[2020-01-01, 2020-01-20]", True),
        ("EqualsMetric", "[2020-01-01, 2020-01-20]", "[2020-01-01, 2020-01-21]", False),
    ],
)
def test_allen_relations(rel, a, b, holds):
    m = get_distance(rel)
    assert m.evaluate(a, b) == (0.0 if holds else 1.0)


def test_instant_is_degenerate_period():
    m = get_distance("DuringMetric")
    assert m.evaluate("2020-01-05", "[2020-01-01, 2020-01-20]") == 0.0


def test_temporal_blocking():
    d = get_distance("DaysDistanceMetric")
    i1 = d.index(["2020-01-01"], 30.0, True)
    i2 = d.index(["2020-01-15"], 30.0, False)
    assert i1.matches(i2)


def test_reference_id_aliases():
    # the reference prefixes the three spatial-clashing relations
    # (temporal/relation/{Contains,Equals,Overlaps}Metric.scala)
    for ref_id, rel in [
        ("TContainsMetric", "contains"),
        ("TEqualsMetric", "equals"),
        ("TOverlapsMetric", "overlaps"),
    ]:
        m = get_distance(ref_id)
        assert m.relation == rel
