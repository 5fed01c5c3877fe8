"""Temporal distance pack — per-unit distances + Allen interval relations.

Mirrors the reference's temporal plugin pack
(``silk-plugins/silk-plugins-spatial-temporal/src/main/scala/de/fuberlin/
wiwiss/silk/plugins/temporal/``):

- values are *instants* (``"2020-01-01"`` / ``"2020-01-01T12:00:00"``)
  or *periods* (``"[2020-01-01, 2020-06-01]"``); an instant is the
  degenerate period (t, t) (utils/Parser.scala:40-60);
- distance = min over the four endpoint differences, scaled to the
  unit (utils/Utils.scala:86-110): millisecs / secs / mins / hours /
  days / months (30 d) / years (365 d);
- Allen relations evaluate to 0.0 iff the relation holds
  (utils/Utils.scala:124-170: before, after, meets, isMetBy, overlaps,
  isOverlappedBy, finishes, isFinishedBy, contains, during, starts,
  isStartedBy, equals);
- blocking: distances index via continuous time blocks over a
  configurable range (utils/Utils.scala:40 ``indexTimes``); relations
  use ``Index.default`` (BeforeMetric.scala indexValue).
"""

from __future__ import annotations

from math import inf

from silk_ray.kernel.distances import (
    SimpleDistanceMeasure,
    _parse_date,
    register_distance,
)
from silk_ray.kernel.index import Index

MS_PER = {
    "millisecs": 1.0,
    "secs": 1000.0,
    "mins": 60_000.0,
    "hours": 3_600_000.0,
    "days": 86_400_000.0,
    "months": 30 * 86_400_000.0,
    "years": 365 * 86_400_000.0,
}

_RANGE_MIN = "1900-01-01"
_RANGE_MAX = "2100-01-01"


def parse_time(s: str) -> tuple[float, float] | None:
    """Parse an instant or '[start, end]' period → (start_ms, end_ms)."""
    s = s.strip()
    if s.startswith("[") and s.endswith("]"):
        parts = s[1:-1].split(",")
        if len(parts) != 2:
            return None
        a, b = _instant_ms(parts[0].strip()), _instant_ms(parts[1].strip())
        if a is None or b is None:
            return None
        return (a, b)
    t = _instant_ms(s)
    return None if t is None else (t, t)


def _instant_ms(s: str) -> float | None:
    d = _parse_date(s)
    if d is None:
        return None
    return d.toordinal() * 86_400_000.0 + (
        d.hour * 3600 + d.minute * 60 + d.second
    ) * 1000.0 + d.microsecond / 1000.0


class _TemporalDistance(SimpleDistanceMeasure):
    unit: str = "millisecs"

    def __init__(self, blockingParameter: float = 1.0):
        self.blocking_parameter = blockingParameter
        self._min_ms = _instant_ms(_RANGE_MIN)
        self._max_ms = _instant_ms(_RANGE_MAX)

    def evaluate(self, v1, v2, limit=inf):
        p1, p2 = parse_time(v1), parse_time(v2)
        if p1 is None or p2 is None:
            return inf
        (s1, e1), (s2, e2) = p1, p2
        diff = min(abs(s1 - e2), abs(e1 - s2), abs(s1 - s2), abs(e1 - e2))
        return diff / MS_PER[self.unit]

    def empty_index(self, limit):
        return Index.continuous_empty(self._min_ms, self._max_ms, max(limit, 1e-9) * MS_PER[self.unit])

    def index_value(self, value, limit, source_or_target):
        p = parse_time(value)
        if p is None:
            return self.empty_index(limit)
        limit_ms = max(limit, 1e-9) * MS_PER[self.unit] * self.blocking_parameter
        return Index.continuous(p[0], self._min_ms, self._max_ms, limit=limit_ms)


def _make_distance(unit: str):
    cls = type(
        f"{unit.capitalize()}DistanceMetric",
        (_TemporalDistance,),
        {"unit": unit, "id": f"{unit.capitalize()}DistanceMetric"},
    )
    return register_distance(cls)


MillisecsDistanceMetric = _make_distance("millisecs")
SecsDistanceMetric = _make_distance("secs")
MinsDistanceMetric = _make_distance("mins")
HoursDistanceMetric = _make_distance("hours")
DaysDistanceMetric = _make_distance("days")
MonthsDistanceMetric = _make_distance("months")
YearsDistanceMetric = _make_distance("years")


_RELATIONS = {
    "before": lambda s1, e1, s2, e2: e1 < s2,
    "after": lambda s1, e1, s2, e2: s1 > e2,
    "meets": lambda s1, e1, s2, e2: e1 == s2,
    "isMetBy": lambda s1, e1, s2, e2: s1 == e2,
    "overlaps": lambda s1, e1, s2, e2: e1 > s2 and e1 < e2,
    "isOverlappedBy": lambda s1, e1, s2, e2: s1 > s2 and s1 < e2,
    "finishes": lambda s1, e1, s2, e2: s1 > s2 and e1 == e2,
    "isFinishedBy": lambda s1, e1, s2, e2: s1 < s2 and e1 == e2,
    "contains": lambda s1, e1, s2, e2: s1 < s2 and e1 > e2,
    "during": lambda s1, e1, s2, e2: s1 > s2 and e1 < e2,
    "starts": lambda s1, e1, s2, e2: s1 == s2 and e1 < e2,
    "isStartedBy": lambda s1, e1, s2, e2: s1 == s2 and e1 > e2,
    "equals": lambda s1, e1, s2, e2: s1 == s2 and e1 == e2,
}


class _TemporalRelation(SimpleDistanceMeasure):
    relation: str = ""

    def evaluate(self, v1, v2, limit=inf):
        p1, p2 = parse_time(v1), parse_time(v2)
        if p1 is None or p2 is None:
            return 1.0
        return 0.0 if _RELATIONS[self.relation](p1[0], p1[1], p2[0], p2[1]) else 1.0

    def index_value(self, value, limit, source_or_target):
        return Index.default()


def _make_relation(rel: str):
    name = rel[0].upper() + rel[1:] + "Metric"
    cls = type(name, (_TemporalRelation,), {"relation": rel, "id": name})
    return register_distance(cls)


BeforeMetric = _make_relation("before")
AfterMetric = _make_relation("after")
MeetsMetric = _make_relation("meets")
IsMetByMetric = _make_relation("isMetBy")
OverlapsMetric = _make_relation("overlaps")
IsOverlappedByMetric = _make_relation("isOverlappedBy")
FinishesMetric = _make_relation("finishes")
IsFinishedByMetric = _make_relation("isFinishedBy")
ContainsMetric = _make_relation("contains")
DuringMetric = _make_relation("during")
StartsMetric = _make_relation("starts")
IsStartedByMetric = _make_relation("isStartedBy")
EqualsMetric = _make_relation("equals")

# reference plugin-id aliases: the temporal pack prefixes the three
# relations that clash with the spatial pack (ContainsMetric.scala:27,
# EqualsMetric.scala:27, OverlapsMetric.scala:27 annotate
# TContainsMetric / TEqualsMetric / TOverlapsMetric)
from silk_ray.kernel.distances import DISTANCE_MEASURES as _DM  # noqa: E402

_DM["TContainsMetric"] = ContainsMetric
_DM["TEqualsMetric"] = EqualsMetric
_DM["TOverlapsMetric"] = OverlapsMetric
