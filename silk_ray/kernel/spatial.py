"""Spatial distance pack — WKT geometries, DE-9IM topology relations,
distances and geometry transformers.

Mirrors the reference's spatial plugin pack
(``silk-plugins/silk-plugins-spatial-temporal/.../spatial/``,
SpatialPlugins.scala:28-53): relation metrics evaluate a topology
predicate and return ``limit`` when it holds else +inf
(utils/Utils.scala:197-216 evaluateRelation); distance metrics compute
orthodromic metres normalized by ``limit``
(utils/Utils.scala:167-194); blocking indexes geometries by their
lat/long envelope grid (utils/Utils.scala:139-164).

The reference delegates topology to JTS; this container has no
geometry library, so the predicates are computed here with plain
computational geometry over a DE-9IM intersection matrix
(`de9im`). Supported geometry types: (MULTI)POINT, (MULTI)LINESTRING,
(MULTI)POLYGON (with holes); geometries are assumed simple (no
self-intersection), matching JTS preconditions. Each side of a
predicate must be homogeneous in dimension (like the reference's
usage); GEOMETRYCOLLECTION is rejected and surfaces as +inf through
the relation metrics' exception path, exactly like the reference's
catch-all (Utils.scala:208-211).
"""

from __future__ import annotations

import math
import re
from math import inf

from silk_ray.kernel.distances import (
    SimpleDistanceMeasure,
    register_distance,
)
from silk_ray.kernel.index import Index
from silk_ray.kernel.transformers import (
    SimpleTransformer,
    Transformer,
    register_transformer,
)

EPS = 1e-9

# utils/Constants.scala
EARTH_CIRCUMFERENCE_EQUATORIAL = 40075160.0
EARTH_CIRCUMFERENCE_MERIDIONAL = 40008000.0
MIN_LAT, MAX_LAT = -90.0, 90.0
MIN_LONG, MAX_LONG = -180.0, 180.0
LAT_RANGE = MAX_LAT - MIN_LAT
LONG_RANGE = MAX_LONG - MIN_LONG


# ---------------------------------------------------------------------------
# WKT parse / serialize
# ---------------------------------------------------------------------------


class WktError(ValueError):
    pass


_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coords(body: str) -> list[tuple[float, float]]:
    pts = []
    for part in body.split(","):
        nums = re.findall(_NUM, part)
        if len(nums) < 2:
            raise WktError(f"bad coordinate {part!r}")
        pts.append((float(nums[0]), float(nums[1])))
    return pts


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized group list at depth 0: '(a),(b)' -> ['a','b']."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(body[start:i])
    if depth != 0:
        raise WktError("unbalanced parentheses")
    return out


def parse_wkt(text: str):
    """WKT → (type, coords). Types: Point (x,y), MultiPoint [pt],
    LineString [pt], MultiLineString [[pt]], Polygon [ring],
    MultiPolygon [[ring]]."""
    s = text.strip()
    m = re.match(r"^\s*(\w+)\s*(EMPTY|\(.*\))\s*$", s, re.DOTALL)
    if not m:
        raise WktError(f"cannot parse WKT: {text[:60]!r}")
    typ = m.group(1).upper()
    body = m.group(2)
    if body == "EMPTY":
        raise WktError("empty geometry")
    inner = body[1:-1].strip()
    if typ == "POINT":
        return ("Point", _parse_coords(inner)[0])
    if typ == "MULTIPOINT":
        if "(" in inner:
            return ("MultiPoint", [_parse_coords(g)[0] for g in _split_groups(inner)])
        return ("MultiPoint", _parse_coords(inner))
    if typ == "LINESTRING":
        return ("LineString", _parse_coords(inner))
    if typ == "MULTILINESTRING":
        return ("MultiLineString", [_parse_coords(g) for g in _split_groups(inner)])
    if typ == "POLYGON":
        return ("Polygon", [_parse_coords(g) for g in _split_groups(inner)])
    if typ == "MULTIPOLYGON":
        return (
            "MultiPolygon",
            [[_parse_coords(r) for r in _split_groups(g)] for g in _split_groups(inner)],
        )
    raise WktError(f"unsupported WKT type {typ}")


def _fmt(c: float) -> str:
    return str(int(c)) if float(c).is_integer() else repr(float(c))


def _fmt_pt(p) -> str:
    return f"{_fmt(p[0])} {_fmt(p[1])}"


def to_wkt(geom) -> str:
    typ, coords = geom
    if typ == "Point":
        return f"POINT ({_fmt_pt(coords)})"
    if typ == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(_fmt_pt(p) for p in coords) + ")"
    if typ == "LineString":
        return "LINESTRING (" + ", ".join(_fmt_pt(p) for p in coords) + ")"
    if typ == "MultiLineString":
        return (
            "MULTILINESTRING ("
            + ", ".join("(" + ", ".join(_fmt_pt(p) for p in line) + ")" for line in coords)
            + ")"
        )
    if typ == "Polygon":
        return (
            "POLYGON ("
            + ", ".join("(" + ", ".join(_fmt_pt(p) for p in _closed(r)) + ")" for r in coords)
            + ")"
        )
    if typ == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join(
                "(" + ", ".join("(" + ", ".join(_fmt_pt(p) for p in _closed(r)) + ")" for r in poly) + ")"
                for poly in coords
            )
            + ")"
        )
    raise WktError(f"unsupported geometry {typ}")


def _closed(ring):
    return ring if ring and ring[0] == ring[-1] else list(ring) + [ring[0]]


def _open(ring):
    return ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else list(ring)


# ---------------------------------------------------------------------------
# component views
# ---------------------------------------------------------------------------


def _dim(geom) -> int:
    t = geom[0]
    if t in ("Point", "MultiPoint"):
        return 0
    if t in ("LineString", "MultiLineString"):
        return 1
    if t in ("Polygon", "MultiPolygon"):
        return 2
    raise WktError(f"unsupported geometry {t}")


def _points(geom):
    return [geom[1]] if geom[0] == "Point" else list(geom[1])


def _lines(geom):
    return [geom[1]] if geom[0] == "LineString" else [list(l) for l in geom[1]]


def _polys(geom):
    """→ list of ring lists (shell first, then holes), rings closed."""
    if geom[0] == "Polygon":
        return [[_closed(r) for r in geom[1]]]
    return [[_closed(r) for r in poly] for poly in geom[1]]


# ---------------------------------------------------------------------------
# planar primitives
# ---------------------------------------------------------------------------


def _peq(p, q) -> bool:
    return abs(p[0] - q[0]) <= EPS and abs(p[1] - q[1]) <= EPS


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_segment(p, a, b) -> bool:
    if abs(_cross(a, b, p)) > EPS * (1 + abs(p[0]) + abs(p[1])):
        return False
    return (
        min(a[0], b[0]) - EPS <= p[0] <= max(a[0], b[0]) + EPS
        and min(a[1], b[1]) - EPS <= p[1] <= max(a[1], b[1]) + EPS
    )


def _seg_intersection(a, b, c, d):
    """('none', None) | ('point', p) | ('overlap', (p, q)) for segments
    ab and cd."""
    d1 = _cross(c, d, a)
    d2 = _cross(c, d, b)
    d3 = _cross(a, b, c)
    d4 = _cross(a, b, d)
    scale = 1 + max(abs(x) for p in (a, b, c, d) for x in p)
    tol = EPS * scale
    if abs(d1) <= tol and abs(d2) <= tol and abs(d3) <= tol and abs(d4) <= tol:
        # collinear: project onto the longer axis
        axis = 0 if abs(b[0] - a[0]) >= abs(b[1] - a[1]) else 1
        lo1, hi1 = sorted((a[axis], b[axis]))
        lo2, hi2 = sorted((c[axis], d[axis]))
        lo, hi = max(lo1, lo2), min(hi1, hi2)
        if lo > hi + tol:
            return ("none", None)
        def at(v):
            if abs(b[axis] - a[axis]) <= tol:
                return a
            t = (v - a[axis]) / (b[axis] - a[axis])
            return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        p, q = at(lo), at(hi)
        if _peq(p, q):
            return ("point", p)
        return ("overlap", (p, q))
    if (d1 > tol and d2 > tol) or (d1 < -tol and d2 < -tol):
        return ("none", None)
    if (d3 > tol and d4 > tol) or (d3 < -tol and d4 < -tol):
        return ("none", None)
    denom = (b[0] - a[0]) * (d[1] - c[1]) - (b[1] - a[1]) * (d[0] - c[0])
    if abs(denom) <= tol * tol:
        # touching at an endpoint (near-parallel)
        for p in (a, b):
            if _on_segment(p, c, d):
                return ("point", p)
        for p in (c, d):
            if _on_segment(p, a, b):
                return ("point", p)
        return ("none", None)
    t = ((c[0] - a[0]) * (d[1] - c[1]) - (c[1] - a[1]) * (d[0] - c[0])) / denom
    t = min(max(t, 0.0), 1.0)
    p = (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
    if _on_segment(p, a, b) and _on_segment(p, c, d):
        return ("point", p)
    return ("none", None)


def _point_in_ring_raw(p, ring) -> int:
    """0 outside, 1 on boundary, 2 inside (even-odd ray cast)."""
    n = len(ring)
    inside = False
    for i in range(n - 1):
        a, b = ring[i], ring[i + 1]
        if _on_segment(p, a, b):
            return 1
        if (a[1] > p[1]) != (b[1] > p[1]):
            x = a[0] + (p[1] - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if x > p[0]:
                inside = not inside
    return 2 if inside else 0


def _point_in_polyset(p, polys) -> int:
    """0 outside, 1 on boundary, 2 inside — even-odd over shells and
    holes of every polygon component."""
    for rings in polys:
        crossings_in = 0
        on = False
        for ring in rings:
            r = _point_in_ring_raw(p, ring)
            if r == 1:
                on = True
                break
            if r == 2:
                crossings_in += 1
        if on:
            return 1
        if crossings_in % 2 == 1:
            return 2
    return 0


def _line_boundary(lines) -> list:
    """Boundary points of a polyline set = endpoints occurring an odd
    number of times (mod-2 rule; closed rings have no boundary)."""
    counts: list = []
    for line in lines:
        if len(line) > 1 and _peq(line[0], line[-1]):
            continue
        for p in (line[0], line[-1]):
            for entry in counts:
                if _peq(entry[0], p):
                    entry[1] += 1
                    break
            else:
                counts.append([p, 1])
    return [p for p, c in counts if c % 2 == 1]


def _point_on_lines(p, lines) -> bool:
    for line in lines:
        for i in range(len(line) - 1):
            if _on_segment(p, line[i], line[i + 1]):
                return True
    return False


def _split_segment(a, b, cut_points):
    """Segment → ordered piece midpoints + the cut points themselves."""
    pts = [(0.0, a), (1.0, b)]
    dx, dy = b[0] - a[0], b[1] - a[1]
    L2 = dx * dx + dy * dy
    for p in cut_points:
        if L2 <= EPS:
            continue
        t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / L2
        if EPS < t < 1 - EPS:
            pts.append((t, p))
    pts.sort(key=lambda e: e[0])
    mids = []
    for i in range(len(pts) - 1):
        t0, p0 = pts[i]
        t1, p1 = pts[i + 1]
        if t1 - t0 > EPS:
            mids.append(((p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0))
    return mids


def _segments(lines):
    for line in lines:
        for i in range(len(line) - 1):
            if not _peq(line[i], line[i + 1]):
                yield (line[i], line[i + 1])


def _classify_lines_vs_polys(lines, polys):
    """Split every segment at polygon-boundary crossings; classify the
    piece midpoints. Returns (has_in, has_on, has_out, crossing_points)."""
    rings = [r for rings in polys for r in rings]
    has_in = has_on = has_out = False
    crossings = []
    for a, b in _segments(lines):
        cuts = []
        for ring in rings:
            for c, d in _segments([ring]):
                kind, data = _seg_intersection(a, b, c, d)
                if kind == "point":
                    cuts.append(data)
                    crossings.append(data)
                elif kind == "overlap":
                    cuts.extend(data)
        for mid in _split_segment(a, b, cuts):
            r = _point_in_polyset(mid, polys)
            if r == 2:
                has_in = True
            elif r == 1:
                has_on = True
            else:
                has_out = True
    return has_in, has_on, has_out, crossings


def _covered_by_lines(target_lines, cover_lines) -> bool:
    """Every segment of target covered by collinear overlaps with cover."""
    for a, b in _segments(target_lines):
        intervals = []
        axis = 0 if abs(b[0] - a[0]) >= abs(b[1] - a[1]) else 1
        denom = b[axis] - a[axis]
        if abs(denom) <= EPS:
            if not _point_on_lines(a, cover_lines):
                return False
            continue
        for c, d in _segments(cover_lines):
            kind, data = _seg_intersection(a, b, c, d)
            if kind == "overlap":
                t0 = (data[0][axis] - a[axis]) / denom
                t1 = (data[1][axis] - a[axis]) / denom
                intervals.append((min(t0, t1), max(t0, t1)))
        intervals.sort()
        covered_to = 0.0
        for lo, hi in intervals:
            if lo > covered_to + EPS:
                return False
            covered_to = max(covered_to, hi)
        if covered_to < 1.0 - EPS:
            return False
    return True


# ---------------------------------------------------------------------------
# DE-9IM
# ---------------------------------------------------------------------------

F = -1


def de9im(g1, g2) -> list[int]:
    """9-entry intersection matrix [II, IB, IE, BI, BB, BE, EI, EB, EE]
    with entries in {-1 (empty), 0, 1, 2} (JTS Geometry.relate
    semantics for simple homogeneous geometries)."""
    d1, d2 = _dim(g1), _dim(g2)
    if d1 > d2:
        m = de9im(g2, g1)
        # transpose
        return [m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8]]
    if d1 == 0 and d2 == 0:
        return _im_pp(_points(g1), _points(g2))
    if d1 == 0 and d2 == 1:
        return _im_pl(_points(g1), _lines(g2))
    if d1 == 0 and d2 == 2:
        return _im_pa(_points(g1), _polys(g2))
    if d1 == 1 and d2 == 1:
        return _im_ll(_lines(g1), _lines(g2))
    if d1 == 1 and d2 == 2:
        return _im_la(_lines(g1), _polys(g2))
    return _im_aa(_polys(g1), _polys(g2))


def _im_pp(pa, pb):
    common = any(any(_peq(p, q) for q in pb) for p in pa)
    a_only = any(not any(_peq(p, q) for q in pb) for p in pa)
    b_only = any(not any(_peq(q, p) for p in pa) for q in pb)
    return [0 if common else F, F, 0 if a_only else F,
            F, F, F,
            0 if b_only else F, F, 2]


def _im_pl(pa, lines):
    bnd = _line_boundary(lines)
    def role(p):
        if any(_peq(p, e) for e in bnd):
            return "b"
        if _point_on_lines(p, lines):
            return "i"
        return "e"
    roles = [role(p) for p in pa]
    ii = 0 if "i" in roles else F
    ib = 0 if "b" in roles else F
    ie = 0 if "e" in roles else F
    eb = 0 if any(not any(_peq(e, p) for p in pa) for e in bnd) else F
    return [ii, ib, ie, F, F, F, 1, eb, 2]


def _im_pa(pa, polys):
    rs = [_point_in_polyset(p, polys) for p in pa]
    return [0 if 2 in rs else F, 0 if 1 in rs else F, 0 if 0 in rs else F,
            F, F, F, 2, 1, 2]


def _im_ll(la, lb):
    ba = _line_boundary(la)
    bb_pts = _line_boundary(lb)

    def role(p, lines, bnd):
        if any(_peq(p, e) for e in bnd):
            return "b"
        if _point_on_lines(p, lines):
            return "i"
        return "e"

    has_overlap = False
    touch_pts = []
    for a, b in _segments(la):
        for c, d in _segments(lb):
            kind, data = _seg_intersection(a, b, c, d)
            if kind == "overlap":
                has_overlap = True
            elif kind == "point":
                touch_pts.append(data)
    ii = 1 if has_overlap else F
    ib = bi = bb = F
    for p in touch_pts:
        ra = role(p, la, ba)
        rb = role(p, lb, bb_pts)
        if ra == "i" and rb == "i" and ii == F:
            ii = 0
        elif ra == "i" and rb == "b":
            ib = 0
        elif ra == "b" and rb == "i":
            bi = 0
        elif ra == "b" and rb == "b":
            bb = 0
    ie = F if _covered_by_lines(la, lb) else 1
    ei = F if _covered_by_lines(lb, la) else 1
    be = 0 if any(not _point_on_lines(e, lb) for e in ba) else F
    eb = 0 if any(not _point_on_lines(e, la) for e in bb_pts) else F
    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def _im_la(la, polys):
    bnd = _line_boundary(la)
    has_in, has_on, has_out, crossings = _classify_lines_vs_polys(la, polys)
    ii = 1 if has_in else F
    # interior of line on polygon boundary: collinear runs → 1; isolated
    # crossing points that are not line endpoints → 0
    if has_on:
        ib = 1
    else:
        ib = F
        for p in crossings:
            if not any(_peq(p, e) for e in bnd):
                ib = 0
                break
    ie = 1 if has_out else F
    b_roles = [_point_in_polyset(e, polys) for e in bnd]
    bi = 0 if 2 in b_roles else F
    bb = 0 if 1 in b_roles else F
    be = 0 if 0 in b_roles else F
    rings = [r for rings in polys for r in rings]
    eb = F if _covered_by_lines(rings, la) else 1
    return [ii, ib, ie, bi, bb, be, 2, eb, 2]


def _im_aa(pa, pb):
    ra = [r for rings in pa for r in rings]
    rb = [r for rings in pb for r in rings]
    a_in, a_on, a_out, crossings = _classify_lines_vs_polys(ra, pb)
    b_in, b_on, b_out, _ = _classify_lines_vs_polys(rb, pa)
    identical = not a_out and not a_in and not b_out and not b_in
    ii = 2 if (a_in or b_in or identical) else F
    ib = 1 if b_in else F
    bi = 1 if a_in else F
    # int(A) ∩ ext(B) empty iff A ⊆ closure(B): no ∂A piece strictly
    # outside B and no ∂B piece strictly inside A (the latter would put
    # interior of A on the outer side of B's boundary)
    ie = 2 if (a_out or b_in) else F
    ei = 2 if (b_out or a_in) else F
    bb = 1 if (a_on or b_on) else (0 if crossings else F)
    be = 1 if a_out else F
    eb = 1 if b_out else F
    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def _matches_pattern(matrix: list[int], pattern: str) -> bool:
    if len(pattern) != 9:
        raise ValueError(f"DE-9IM pattern must have 9 characters: {pattern!r}")
    for dim, ch in zip(matrix, pattern):
        if ch == "*":
            continue
        if ch in ("T", "t"):
            if dim < 0:
                return False
        elif ch in ("F", "f"):
            if dim >= 0:
                return False
        else:
            if dim != int(ch):
                return False
    return True


def relate(g1, g2, relation: str) -> bool:
    """Named relation or raw DE-9IM pattern (Utils.scala:230-243)."""
    m = de9im(g1, g2)
    d1, d2 = _dim(g1), _dim(g2)
    r = relation.lower()
    if r == "equals":
        return _matches_pattern(m, "T*F**FFF*")
    if r == "disjoint":
        return _matches_pattern(m, "FF*FF****")
    if r == "intersects":
        return not _matches_pattern(m, "FF*FF****")
    if r == "touches":
        return any(
            _matches_pattern(m, p) for p in ("FT*******", "F**T*****", "F***T****")
        )
    if r == "crosses":
        if d1 < d2:
            return _matches_pattern(m, "T*T******")
        if d1 > d2:
            return _matches_pattern(m, "T*****T**")
        return d1 == 1 and _matches_pattern(m, "0********")
    if r == "within":
        return _matches_pattern(m, "T*F**F***")
    if r == "contains":
        return relate(g2, g1, "within")
    if r == "overlaps":
        if d1 != d2:
            return False
        if d1 == 1:
            return _matches_pattern(m, "1*T***T**")
        return _matches_pattern(m, "T*T***T**")
    # raw DE-9IM pattern (Geometry.relate)
    return _matches_pattern(m, relation)


# ---------------------------------------------------------------------------
# centroid / distance helpers
# ---------------------------------------------------------------------------


def centroid(geom):
    d = _dim(geom)
    if d == 0:
        pts = _points(geom)
        return (sum(p[0] for p in pts) / len(pts), sum(p[1] for p in pts) / len(pts))
    if d == 1:
        sx = sy = sw = 0.0
        for a, b in _segments(_lines(geom)):
            w = math.hypot(b[0] - a[0], b[1] - a[1])
            sx += w * (a[0] + b[0]) / 2.0
            sy += w * (a[1] + b[1]) / 2.0
            sw += w
        if sw <= EPS:
            return _lines(geom)[0][0]
        return (sx / sw, sy / sw)
    sx = sy = sa = 0.0
    for rings in _polys(geom):
        for k, ring in enumerate(rings):
            a2 = _ring_signed_area(ring)
            sign = 1.0 if k == 0 else -1.0
            cx, cy = _ring_centroid(ring)
            w = sign * abs(a2)
            sx += w * cx
            sy += w * cy
            sa += w
    if abs(sa) <= EPS:
        return _polys(geom)[0][0][0]
    return (sx / sa, sy / sa)


def _ring_signed_area(ring) -> float:
    s = 0.0
    for i in range(len(ring) - 1):
        s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return s / 2.0


def _ring_centroid(ring):
    a = _ring_signed_area(ring)
    if abs(a) <= EPS:
        xs = [p[0] for p in _open(ring)]
        ys = [p[1] for p in _open(ring)]
        return (sum(xs) / len(xs), sum(ys) / len(ys))
    cx = cy = 0.0
    for i in range(len(ring) - 1):
        f = ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
        cx += (ring[i][0] + ring[i + 1][0]) * f
        cy += (ring[i][1] + ring[i + 1][1]) * f
    return (cx / (6.0 * a), cy / (6.0 * a))


def orthodromic_metres(p1, p2) -> float:
    """Great-circle distance; coordinates are (lat, long) in EPSG:4326
    axis order like the reference's orthodromicDistance calls."""
    lat1, lon1 = math.radians(p1[0]), math.radians(p1[1])
    lat2, lon2 = math.radians(p2[0]), math.radians(p2[1])
    dlat, dlon = lat2 - lat1, lon2 - lon1
    a = math.sin(dlat / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2) ** 2
    return 2 * 6371008.8 * math.asin(min(1.0, math.sqrt(a)))


def _closest_point_on_segment(p, a, b):
    dx, dy = b[0] - a[0], b[1] - a[1]
    L2 = dx * dx + dy * dy
    if L2 <= EPS:
        return a
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / L2
    t = min(max(t, 0.0), 1.0)
    return (a[0] + t * dx, a[1] + t * dy)


def _all_segments(geom):
    d = _dim(geom)
    if d == 1:
        return list(_segments(_lines(geom)))
    if d == 2:
        return list(_segments([r for rings in _polys(geom) for r in rings]))
    return []


def _all_vertices(geom):
    d = _dim(geom)
    if d == 0:
        return _points(geom)
    if d == 1:
        return [p for line in _lines(geom) for p in line]
    return [p for rings in _polys(geom) for r in rings for p in r]


def nearest_points(g1, g2):
    """Planar nearest point pair between two geometries (JTS
    DistanceOp.nearestPoints over the supported types)."""
    if not relate(g1, g2, "disjoint"):
        # intersecting → any shared point; use a vertex inside/overlap
        for p in _all_vertices(g1):
            if _dim(g2) == 2 and _point_in_polyset(p, _polys(g2)) > 0:
                return (p, p)
            if _dim(g2) == 1 and _point_on_lines(p, _lines(g2)):
                return (p, p)
            if _dim(g2) == 0 and any(_peq(p, q) for q in _points(g2)):
                return (p, p)
        for p in _all_vertices(g2):
            if _dim(g1) == 2 and _point_in_polyset(p, _polys(g1)) > 0:
                return (p, p)
            if _dim(g1) == 1 and _point_on_lines(p, _lines(g1)):
                return (p, p)
        # boundary crossing
        for a, b in _all_segments(g1):
            for c, d in _all_segments(g2):
                kind, data = _seg_intersection(a, b, c, d)
                if kind == "point":
                    return (data, data)
                if kind == "overlap":
                    return (data[0], data[0])
    best = None
    best_d2 = inf

    def consider(p, q):
        nonlocal best, best_d2
        d2 = (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
        if d2 < best_d2:
            best_d2 = d2
            best = (p, q)

    segs1, segs2 = _all_segments(g1), _all_segments(g2)
    for p in _all_vertices(g1):
        for c, d in segs2:
            consider(p, _closest_point_on_segment(p, c, d))
        for q in _all_vertices(g2):
            consider(p, q)
    for q in _all_vertices(g2):
        for a, b in segs1:
            consider(_closest_point_on_segment(q, a, b), q)
    return best


# ---------------------------------------------------------------------------
# blocking index (Utils.scala:139-164 indexGeometriesByEnvelope)
# ---------------------------------------------------------------------------


def envelope(geom):
    vs = _all_vertices(geom)
    xs = [p[0] for p in vs]
    ys = [p[1] for p in vs]
    return (min(xs), min(ys), max(xs), max(ys))


def index_by_envelope(wkt: str, blocking_parameter: float = 1.0, distance: float = 0.0) -> Index:
    try:
        geom = parse_wkt(wkt)
        minx, miny, maxx, maxy = envelope(geom)
        if distance != 0.0:
            dx = (distance / EARTH_CIRCUMFERENCE_EQUATORIAL) * LONG_RANGE
            dy = (distance / EARTH_CIRCUMFERENCE_MERIDIONAL) * LAT_RANGE
            minx, miny, maxx, maxy = minx - dx, miny - dy, maxx + dx, maxy + dy
        bp = blocking_parameter
        lat_count = int(LAT_RANGE * bp)
        long_count = int(LONG_RANGE * bp)
        lat_off = -int(MIN_LAT * bp)
        long_off = -int(MIN_LONG * bp)
        lat_blocks = {i + lat_off for i in range(int(miny * bp), int(maxy * bp) + 1)}
        long_blocks = {i + long_off for i in range(int(minx * bp), int(maxx * bp) + 1)}
        return Index.one_dim(lat_blocks, lat_count).conjunction(
            Index.one_dim(long_blocks, long_count)
        )
    except Exception:
        return Index.empty()


# ---------------------------------------------------------------------------
# relation metrics (spatial/relation/*.scala)
# ---------------------------------------------------------------------------


class _SpatialRelationBase(SimpleDistanceMeasure):
    relation: str = ""
    negate = False

    def __init__(self, blockingParameter: float = 1.0, relation: str | None = None):
        self.blocking_parameter = blockingParameter
        if relation is not None:
            self.relation = relation

    def evaluate(self, v1, v2, limit=inf):
        try:
            holds = relate(parse_wkt(v1), parse_wkt(v2), self.relation)
        except Exception:
            return inf if not self.negate else limit
        if self.negate:
            return inf if holds else limit
        return limit if holds else inf

    def index_value(self, value, limit, source_or_target):
        return index_by_envelope(value, self.blocking_parameter)


@register_distance
class SEqualsMetric(_SpatialRelationBase):
    """spatial/relation/EqualsMetric.scala"""
    id = "SEqualsMetric"
    relation = "equals"


@register_distance
class DisjointMetric(_SpatialRelationBase):
    id = "DisjointMetric"
    relation = "disjoint"


@register_distance
class IntersectsMetric(_SpatialRelationBase):
    id = "IntersectsMetric"
    relation = "intersects"


@register_distance
class TouchesMetric(_SpatialRelationBase):
    id = "TouchesMetric"
    relation = "touches"


@register_distance
class CrossesMetric(_SpatialRelationBase):
    id = "CrossesMetric"
    relation = "crosses"


@register_distance
class WithinMetric(_SpatialRelationBase):
    id = "WithinMetric"
    relation = "within"


@register_distance
class SContainsMetric(_SpatialRelationBase):
    """spatial/relation/ContainsMetric.scala"""
    id = "SContainsMetric"
    relation = "contains"


@register_distance
class SOverlapsMetric(_SpatialRelationBase):
    id = "SOverlapsMetric"
    relation = "overlaps"


@register_distance
class RelateMetric(_SpatialRelationBase):
    """Arbitrary DE-9IM pattern or named relation
    (spatial/relation/RelateMetric.scala)."""
    id = "RelateMetric"
    relation = ""


@register_distance
class NegateRelationMetric(_SpatialRelationBase):
    """Negated relation (spatial/relation/NegateMetric.scala): returns
    limit when the relation does NOT hold; exceptions also yield limit
    (Utils.scala negatsRelation catch branch)."""
    id = "NegateRelationMetric"
    relation = ""
    negate = True


# ---------------------------------------------------------------------------
# distance metrics (spatial/distance/*.scala)
# ---------------------------------------------------------------------------


class _SpatialDistanceBase(SimpleDistanceMeasure):
    def __init__(self, blockingParameter: float = 1.0):
        self.blocking_parameter = blockingParameter
        self._index_limit = 0.0

    def _metres(self, g1, g2) -> float:
        raise NotImplementedError

    def evaluate(self, v1, v2, limit=inf):
        try:
            metres = self._metres(parse_wkt(v1), parse_wkt(v2))
        except Exception:
            return inf
        normalized = metres / limit if limit else (0.0 if metres == 0.0 else inf)
        return normalized if normalized <= 1.0 else inf

    def index(self, values, limit, source_or_target):
        out = None
        for v in values:
            idx = index_by_envelope(v, self.blocking_parameter, distance=limit)
            out = idx if out is None else out.merge(idx)
        return out if out is not None else Index.empty()


@register_distance
class CentroidDistanceMetric(_SpatialDistanceBase):
    """Orthodromic distance of centroids, normalized by the threshold
    (spatial/distance/CentroidDistanceMetric.scala)."""

    id = "CentroidDistanceMetric"

    def _metres(self, g1, g2):
        return orthodromic_metres(centroid(g1), centroid(g2))


@register_distance
class MinDistanceMetric(_SpatialDistanceBase):
    """Orthodromic distance of the nearest point pair
    (spatial/distance/MinDistanceMetric.scala)."""

    id = "MinDistanceMetric"

    def _metres(self, g1, g2):
        p, q = nearest_points(g1, g2)
        return orthodromic_metres(p, q)


# ---------------------------------------------------------------------------
# transformers (spatial/transformer/*.scala)
# ---------------------------------------------------------------------------

_CRS_RE = re.compile(r"^<?http://www\.opengis\.net/def/crs/EPSG/0/(\d+)>?$")


def _web_mercator_to_wgs84(p):
    r = 6378137.0
    lon = math.degrees(p[0] / r)
    lat = math.degrees(math.atan(math.sinh(p[1] / r)))
    return (lon, lat)


def _map_coords(geom, fn):
    typ, coords = geom
    if typ == "Point":
        return (typ, fn(coords))
    if typ in ("MultiPoint", "LineString"):
        return (typ, [fn(p) for p in coords])
    if typ in ("MultiLineString", "Polygon"):
        return (typ, [[fn(p) for p in part] for part in coords])
    return (typ, [[[fn(p) for p in ring] for ring in poly] for poly in coords])


@register_transformer
class GeometryTransformer(Transformer):
    """Normalize GeoSPARQL / stSPARQL / W3C-Geo literals to plain WKT in
    WGS84 (spatial/transformer/GeometryTransformer.scala;
    Utils.scala stSPARQLGeoSPARQLTransformer + w3cGeoTransformer).
    Non-default SRIDs: EPSG:3857 (web mercator) is reprojected; other
    SRIDs are returned unchanged like the reference's fallback."""

    id = "GeometryTransformer"

    def _normalize(self, literal: str) -> str:
        s = literal.strip()
        srid = None
        if s.startswith("<"):
            uri, _, rest = s.partition(">")
            m = _CRS_RE.match(uri + ">")
            if m:
                srid = int(m.group(1))
                s = rest.strip()
        elif ";" in s:
            body, _, uri = s.rpartition(";")
            m = _CRS_RE.match(uri.strip())
            if m:
                srid = int(m.group(1))
                s = body.strip()
        if srid in (None, 4326):
            return s
        try:
            geom = parse_wkt(s)
        except WktError:
            return literal
        if srid == 3857:
            return to_wkt(_map_coords(geom, _web_mercator_to_wgs84))
        return to_wkt(geom)

    def apply(self, values):
        if len(values) >= 2:
            # W3C Geo: separate lat / long inputs
            return [f"POINT ({lat} {long})" for lat, long in zip(values[0], values[1])]
        return [self._normalize(v) for v in values[0]] if values else []


@register_transformer
class PointsToCentroidTransformer(Transformer):
    """Centroid of coordinate lists (Utils.scala pointsToCentroidTransformer)."""

    id = "PointsToCentroidCTransformer"

    def apply(self, values):
        if len(values) < 2:
            return [v for vs in values for v in vs]
        set1, set2 = values[0], values[1]
        try:
            lat = sum(float(v) for v in set1) / len(set1)
            long = sum(float(v) for v in set2) / len(set2)
        except (ValueError, ZeroDivisionError):
            return list(set1) + list(set2)
        return [f"POINT ({lat} {long})"]


def _clean_ring(ring):
    """Drop repeated points and degenerate spikes (prev == next) —
    JTS buffer(0)-style normalization."""
    pts = _open(ring)
    changed = True
    while changed and len(pts) > 2:
        changed = False
        out = []
        n = len(pts)
        for i in range(n):
            if _peq(pts[i], pts[(i + 1) % n]):
                changed = True
                continue
            out.append(pts[i])
        pts = out
        n = len(pts)
        out = []
        for i in range(n):
            if n > 2 and _peq(pts[(i - 1) % n], pts[(i + 1) % n]):
                changed = True
                continue
            out.append(pts[i])
        pts = out
    return pts


@register_transformer
class BufferTransformer(SimpleTransformer):
    """Geometry buffer (spatial/transformer/BufferTransformer.scala).
    distance == 0 normalizes the geometry (degenerate spikes removed,
    JTS buffer(0) behaviour); a positive distance buffers points into
    32-gon circles; other positive-distance buffers are returned
    unchanged (the reference returns the input on failure,
    Utils.scala getBufferedGeometry catch branch)."""

    id = "BufferTransformer"

    def __init__(self, distance: float = 0.0):
        self.distance = distance

    def evaluate(self, value):
        try:
            geom = parse_wkt(value)
        except WktError:
            return value
        if self.distance == 0.0:
            if _dim(geom) == 2:
                cleaned = [
                    [_closed(_clean_ring(r)) for r in rings] for rings in _polys(geom)
                ]
                if len(cleaned) == 1:
                    return to_wkt(("Polygon", cleaned[0]))
                return to_wkt(("MultiPolygon", cleaned))
            return to_wkt(geom)
        if geom[0] == "Point":
            cx, cy = geom[1]
            ring = [
                (
                    cx + self.distance * math.cos(2 * math.pi * k / 32),
                    cy + self.distance * math.sin(2 * math.pi * k / 32),
                )
                for k in range(32)
            ]
            return to_wkt(("Polygon", [_closed(ring)]))
        return value


@register_transformer
class EnvelopeTransformer(SimpleTransformer):
    """Bounding box as WKT (spatial/transformer/EnvelopeTransformer.scala)."""

    id = "EnvelopeTransformer"

    def evaluate(self, value):
        try:
            geom = parse_wkt(value)
            minx, miny, maxx, maxy = envelope(geom)
        except WktError:
            return value
        if abs(maxx - minx) <= EPS and abs(maxy - miny) <= EPS:
            return to_wkt(("Point", (minx, miny)))
        ring = [(minx, miny), (minx, maxy), (maxx, maxy), (maxx, miny), (minx, miny)]
        return to_wkt(("Polygon", [ring]))


@register_transformer
class AreaTransformer(SimpleTransformer):
    """Planar area in squared degrees (spatial/transformer/AreaTransformer.scala;
    JTS getArea semantics — 0.0 for points and lines)."""

    id = "AreaTransformer"

    def evaluate(self, value):
        try:
            geom = parse_wkt(value)
        except WktError:
            return value
        if _dim(geom) < 2:
            return "0.0"
        total = 0.0
        for rings in _polys(geom):
            for k, ring in enumerate(rings):
                a = abs(_ring_signed_area(ring))
                total += a if k == 0 else -a
        return str(total)


@register_transformer
class SimplifyTransformer(SimpleTransformer):
    """Douglas-Peucker simplification
    (spatial/transformer/SimplifyTransformer.scala; the
    preserveTopology variant uses the same tolerance semantics here)."""

    id = "SimplifyTransformer"

    def __init__(self, distanceTolerance: float = 0.0, preserveTopology: bool = False):
        self.tolerance = distanceTolerance
        self.preserve_topology = preserveTopology

    def _dp(self, pts):
        if len(pts) < 3:
            return list(pts)
        a, b = pts[0], pts[-1]
        max_d, idx = -1.0, 0
        for i in range(1, len(pts) - 1):
            q = _closest_point_on_segment(pts[i], a, b)
            d = math.hypot(pts[i][0] - q[0], pts[i][1] - q[1])
            if d > max_d:
                max_d, idx = d, i
        if max_d <= self.tolerance:
            return [a, b]
        left = self._dp(pts[: idx + 1])
        right = self._dp(pts[idx:])
        return left[:-1] + right

    def evaluate(self, value):
        try:
            geom = parse_wkt(value)
        except WktError:
            return value
        d = _dim(geom)
        if d == 0:
            return to_wkt(geom)
        if d == 1:
            lines = [self._dp(line) for line in _lines(geom)]
            if geom[0] == "LineString":
                return to_wkt(("LineString", lines[0]))
            return to_wkt(("MultiLineString", lines))
        polys = []
        for rings in _polys(geom):
            new_rings = []
            for ring in rings:
                simplified = self._dp(ring)
                new_rings.append(_closed(simplified) if len(simplified) >= 4 else ring)
            polys.append(new_rings)
        if geom[0] == "Polygon":
            return to_wkt(("Polygon", polys[0]))
        return to_wkt(("MultiPolygon", polys))
