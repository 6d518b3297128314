"""IsValid (Operation/Valid/IsValidOp.cs + PolygonTopologyAnalyzer.cs
semantics).

Pipeline per polygonal geometry (IsValidOp.IsValidGeometry(Polygon)
:283-316):
1. finite coordinates; rings closed (parser guarantees) with ≥ 4
   non-repeated points (:431-484);
2. ring intersection analysis (PolygonIntersectionAnalyzer): any collinear
   overlap between ring segments, any proper (interior×interior) crossing,
   any ring SELF-touch, or ≥2 touch points between the same ring pair
   (double touch ⇒ disconnected interior) is invalid;
3. holes inside shell (vertex/midpoint probe — IsRingNested analog);
4. holes not nested in each other; shells of a MultiPolygon not nested
   (a shell inside another polygon's HOLE is valid);
5. touch-cycle detection via union-find over ring touch points
   (PolygonRing.AddTouch cycle rule ⇒ disconnected interior).

Lineal/puntal rules per :223-282: points always valid, linestrings need
≥2 distinct points, linearrings additionally closed+simple+≥4 points.
"""

from __future__ import annotations


import numpy as np

from .geom import (
    LINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)
from .overlay import _seg_intersection
from .pip import BOUNDARY, EXTERIOR, INTERIOR, PreparedPolygon


def _coords_finite(g: Geom) -> bool:
    c = g.all_coords()
    return bool(np.isfinite(c).all()) if len(c) else True


def _non_repeated_count(pts: np.ndarray) -> int:
    if len(pts) < 2:
        return len(pts)
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    return int(keep.sum())


def _trim_repeated(pts: np.ndarray) -> np.ndarray:
    if len(pts) < 2:
        return pts
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    return pts[keep]


class _RingSet:
    """All rings of a polygonal geometry with ownership metadata."""

    def __init__(self, polys: list[Geom]):
        self.rings: list[np.ndarray] = []
        self.owner: list[tuple[int, int]] = []  # (poly_idx, ring_idx)
        for pi, p in enumerate(polys):
            for ri, r in enumerate(p.rings):
                self.rings.append(_trim_repeated(r))
                self.owner.append((pi, ri))


def _ring_pair_analysis(rs: _RingSet):
    """Returns (ok, touches) — touches: list of (i, j, point) between
    DIFFERENT rings; ok False on any invalid intersection."""
    touches: list[tuple[int, int, tuple]] = []
    n = len(rs.rings)
    for i in range(n):
        ri = rs.rings[i]
        # self-analysis: any self intersection/touch is invalid
        m = len(ri) - 1
        for a in range(m):
            p1 = (float(ri[a, 0]), float(ri[a, 1]))
            p2 = (float(ri[a + 1, 0]), float(ri[a + 1, 1]))
            if p1 == p2:
                continue
            for b in range(a + 1, m):
                q1 = (float(ri[b, 0]), float(ri[b, 1]))
                q2 = (float(ri[b + 1, 0]), float(ri[b + 1, 1]))
                if q1 == q2:
                    continue
                kind, payload = _seg_intersection(p1, p2, q1, q2)
                if kind == "none":
                    continue
                if kind == "overlap":
                    return False, touches
                pt, _t = payload
                adjacent = b == a + 1
                closing = a == 0 and b == m - 1
                if adjacent and pt == q1:
                    continue
                if closing and pt == p1:
                    continue
                return False, touches  # ring self-intersection / self-touch
        for j in range(i + 1, n):
            rj = rs.rings[j]
            # envelope prefilter
            if (
                ri[:, 0].max() < rj[:, 0].min() or rj[:, 0].max() < ri[:, 0].min()
                or ri[:, 1].max() < rj[:, 1].min() or rj[:, 1].max() < ri[:, 1].min()
            ):
                continue
            pair_pts = set()
            for a in range(len(ri) - 1):
                p1 = (float(ri[a, 0]), float(ri[a, 1]))
                p2 = (float(ri[a + 1, 0]), float(ri[a + 1, 1]))
                if p1 == p2:
                    continue
                for b in range(len(rj) - 1):
                    q1 = (float(rj[b, 0]), float(rj[b, 1]))
                    q2 = (float(rj[b + 1, 0]), float(rj[b + 1, 1]))
                    if q1 == q2:
                        continue
                    kind, payload = _seg_intersection(p1, p2, q1, q2)
                    if kind == "none":
                        continue
                    if kind == "overlap":
                        return False, touches
                    pt, _t = payload
                    # proper crossing: interior of both segments
                    if pt not in (p1, p2) and pt not in (q1, q2):
                        return False, touches
                    pair_pts.add(pt)
            same_poly = rs.owner[i][0] == rs.owner[j][0]
            if same_poly and len(pair_pts) >= 2:
                # double touch between rings of ONE polygon disconnects its
                # interior; rings of different polygons may touch repeatedly
                return False, touches
            for pt in pair_pts:
                # touch-not-crossing is validated by the nesting probes below
                # (interior/exterior evidence of the other vertices)
                touches.append((i, j, pt))
    return True, touches


def _probe_ring_vs_area(ring: np.ndarray, prep: PreparedPolygon) -> int:
    """INTERIOR/EXTERIOR classification of a ring known not to cross the
    area's boundary: first vertex (or edge midpoint) strictly off-boundary."""
    loc = prep.locate(ring[:-1, 0], ring[:-1, 1])
    inside = (loc == INTERIOR).any()
    outside = (loc == EXTERIOR).any()
    if inside and not outside:
        return INTERIOR
    if outside and not inside:
        return EXTERIOR
    if inside and outside:
        return EXTERIOR  # crossing — invalid, caller treats as outside
    mids = (ring[:-1] + ring[1:]) * 0.5
    locm = prep.locate(mids[:, 0], mids[:, 1])
    in_m = bool((locm == INTERIOR).any())
    out_m = bool((locm == EXTERIOR).any())
    if in_m and out_m:
        return EXTERIOR  # straddles the boundary — not properly inside
    if in_m:
        return INTERIOR
    if out_m:
        return EXTERIOR
    return BOUNDARY  # degenerate: ring identical to boundary (invalid earlier)


def _polygonal_valid(polys: list[Geom]) -> bool:
    for p in polys:
        if not p.rings:
            continue
        for r in p.rings:
            if len(r) and (r[0] != r[-1]).any():
                return False
            if _non_repeated_count(r) - 1 < 3:  # closed ring: ≥4 incl. closure
                return False
    rs = _RingSet(polys)
    ok, touches = _ring_pair_analysis(rs)
    if not ok:
        return False

    shells = {}
    shell_preps = {}
    for pi, p in enumerate(polys):
        if p.rings:
            shells[pi] = p.rings[0]
            shell_preps[pi] = PreparedPolygon(Geom(POLYGON, rings=[p.rings[0]]))

    # holes inside shell; holes not nested
    for pi, p in enumerate(polys):
        if len(p.rings) <= 1:
            continue
        sp = shell_preps[pi]
        hole_preps = []
        for hi, h in enumerate(p.rings[1:], start=1):
            if _probe_ring_vs_area(h, sp) == EXTERIOR:
                return False
            hole_preps.append(PreparedPolygon(Geom(POLYGON, rings=[h])))
        for a in range(len(hole_preps)):
            for b in range(len(hole_preps)):
                if a == b:
                    continue
                if _probe_ring_vs_area(p.rings[a + 1], hole_preps[b]) == INTERIOR:
                    return False

    # shells not nested (unless inside a hole of the other polygon)
    if len(polys) > 1:
        for pi in shells:
            for pj in shells:
                if pi == pj:
                    continue
                if _probe_ring_vs_area(shells[pi], shell_preps[pj]) == INTERIOR:
                    # inside pj's shell: valid only if inside one of pj's holes
                    in_hole = False
                    for h in polys[pj].rings[1:]:
                        hp = PreparedPolygon(Geom(POLYGON, rings=[h]))
                        if _probe_ring_vs_area(shells[pi], hp) == INTERIOR:
                            in_hole = True
                            break
                    if not in_hole:
                        return False

    # touch-cycle detection per polygon, incidence-based union-find over
    # (ring, touch-point) nodes: several rings pinching at ONE point stay
    # connected-valid; a chain meeting again at a DIFFERENT point is a cycle
    # that disconnects the interior (PolygonRing.AddTouch rule)
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    seen_incidence = set()
    for i, j, pt in touches:
        if rs.owner[i][0] != rs.owner[j][0]:
            continue  # cross-polygon touches don't disconnect an interior
        poly = rs.owner[i][0]
        for ring in (i, j):
            inc = (ring, pt)
            if inc in seen_incidence:
                continue
            seen_incidence.add(inc)
            rn = ("r", poly, ring)
            pn = ("p", poly, pt)
            a, b = find(rn), find(pn)
            if a == b:
                return False
            parent[a] = b
    return True


def is_valid(g: Geom) -> bool:
    if g.is_empty:
        return True
    if not _coords_finite(g):
        return False
    if g.gtype in (POINT, MULTIPOINT):
        return True
    if g.gtype == LINESTRING:
        if _non_repeated_count(g.coords) < 2:
            return False
        if getattr(g, "is_ring", False):
            from .simple import is_simple

            return (
                (g.coords[0] == g.coords[-1]).all()
                and _non_repeated_count(g.coords) - 1 >= 3
                and is_simple(g)
            )
        return True
    if g.gtype == POLYGON:
        return _polygonal_valid([g])
    if g.gtype == MULTIPOLYGON:
        return _polygonal_valid([p for p in g.parts if not p.is_empty])
    # collections: every component valid
    return all(is_valid(p) for p in g.parts)
