"""General geometry fixer: make ANY geometry valid while preserving shape.

Mirrors the semantic rules of the reference
``Geometries/Utilities/GeometryFixer.cs:16-462``:

1. vertices with non-finite X or Y are removed;
2. consecutive repeated points reduce to one;
3. empty atomic geometries are valid and returned unchanged;
4. empty elements are removed from collections;
5. POINT: keep valid coordinate, else EMPTY;
6. LINESTRING: coordinates fixed; <2 points → EMPTY (or POINT when
   ``keep_collapsed``);
7. POLYGON: each ring rebuilt as a valid area (buffer(0)-style even-odd
   face extraction, ``FixRing`` :408-414); holes intersecting the fixed
   shell subtract from it, holes outside it become shells of their own
   (``FixPolygonElement`` :310-346); a collapsed shell → EMPTY (or the
   shell line when ``keep_collapsed``);
8. MULTIPOLYGON: elements fixed then unioned non-overlapping (:416-441);
9. GEOMETRYCOLLECTION: elements fixed recursively (:443-451);
10. ``keep_multi``: single-element results of fixed MULTI inputs stay MULTI
    (default) or unwrap.

(The reference's standalone LINEARRING branch has no analog here: the WKB
object model — like WKB itself — has no LinearRing type.)
"""

from __future__ import annotations

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
    linestring,
    multi,
    point,
    polygon,
)
from .overlay import DIFFERENCE, UNION, overlay
from .predicates import intersects
from .union_op import cascaded_union

_EMPTY_COORDS = np.empty((0, 2), dtype=np.float64)


def _empty(gtype: int) -> Geom:
    if gtype in (POINT, LINESTRING):
        return Geom(gtype, coords=_EMPTY_COORDS)
    if gtype == POLYGON:
        return Geom(POLYGON, rings=[])
    return Geom(gtype, parts=[])


def _fix_coords(pts: np.ndarray | None) -> np.ndarray:
    """Drop non-finite vertices, collapse consecutive repeats
    (CoordinateArrays.RemoveRepeatedOrInvalidPoints analog)."""
    if pts is None or len(pts) == 0:
        return _EMPTY_COORDS
    pts = np.asarray(pts, dtype=np.float64)
    pts = pts[np.isfinite(pts).all(axis=1)]
    if len(pts) == 0:
        return _EMPTY_COORDS
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    return pts[keep]


def _fix_ring_area(ring: np.ndarray) -> Geom:
    """Valid area of one ring regardless of orientation / self-crossings —
    the ``FixRing`` analog (GeometryFixer.cs:408-414): buffer(0) in BOTH
    orientations, i.e. keep every region with NONZERO winding (a doubly-
    wound loop stays filled; a +1/−1 figure-eight lobe pair keeps both
    lobes; only net-zero regions become holes)."""
    from .offset import extract_positive_region

    pts = _fix_coords(ring)
    if len(pts) >= 2 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    if len(pts) < 3:
        return _empty(POLYGON)
    closed = np.concatenate([pts, pts[:1]], axis=0)
    pos = extract_positive_region([closed])
    neg = extract_positive_region([closed[::-1].copy()])
    areas = [a for a in (pos, neg) if a is not None and not a.is_empty]
    if not areas:
        return _empty(POLYGON)
    if len(areas) == 1:
        return areas[0]
    return overlay(areas[0], areas[1], UNION)


def _fix_point_element(g: Geom) -> Geom | None:
    pts = _fix_coords(g.coords)
    if len(pts) == 0:
        return None
    return point(float(pts[0, 0]), float(pts[0, 1]))


def _fix_linestring_element(g: Geom, keep_collapsed: bool) -> Geom | None:
    pts = _fix_coords(g.coords)
    if keep_collapsed and len(pts) == 1:
        return point(float(pts[0, 0]), float(pts[0, 1]))
    if len(pts) <= 1:
        return None
    return linestring(pts)


def _union(parts: list[Geom]) -> Geom:
    if not parts:
        return _empty(POLYGON)
    if len(parts) == 1:
        return parts[0]
    return cascaded_union(parts)


def _fix_polygon_element(g: Geom, keep_collapsed: bool) -> Geom | None:
    if not g.rings:
        return None
    shell_fix = _fix_ring_area(g.rings[0])
    if shell_fix.is_empty:
        if keep_collapsed:
            return _fix_linestring_element(
                Geom(LINESTRING, coords=g.rings[0]), keep_collapsed
            )
        return None
    if len(g.rings) == 1:
        return shell_fix
    holes_fixed = [
        h for h in (_fix_ring_area(r) for r in g.rings[1:]) if not h.is_empty
    ]
    holes: list[Geom] = []
    shells: list[Geom] = []
    for h in holes_fixed:
        (holes if intersects(shell_fix, h) else shells).append(h)
    poly_with_holes = (
        overlay(shell_fix, _union(holes), DIFFERENCE) if holes else shell_fix
    )
    if not shells:
        return poly_with_holes
    return _union(shells + [poly_with_holes])


def fix(g: Geom, keep_collapsed: bool = False, keep_multi: bool = True) -> Geom:
    """Fix ``g`` to a valid geometry (GeometryFixer.Fix :55-75)."""
    if g.is_empty and g.gtype != GEOMETRYCOLLECTION:
        return _empty(g.gtype) if g.gtype not in (
            MULTIPOINT, MULTILINESTRING, MULTIPOLYGON
        ) else Geom(g.gtype, parts=[])
    t = g.gtype
    if t == POINT:
        return _fix_point_element(g) or _empty(POINT)
    if t == LINESTRING:
        return _fix_linestring_element(g, keep_collapsed) or _empty(LINESTRING)
    if t == POLYGON:
        return _fix_polygon_element(g, keep_collapsed) or _empty(POLYGON)
    if t == MULTIPOINT:
        pts = [
            p for p in (
                _fix_point_element(e) for e in g.parts if not e.is_empty
            ) if p is not None
        ]
        if not keep_multi and len(pts) == 1:
            return pts[0]
        return multi(MULTIPOINT, pts)
    if t == MULTILINESTRING:
        fixed = [
            f for f in (
                _fix_linestring_element(e, keep_collapsed)
                for e in g.parts if not e.is_empty
            ) if f is not None
        ]
        if len(fixed) == 1 and (not keep_multi or fixed[0].gtype != LINESTRING):
            return fixed[0]
        if any(f.gtype != LINESTRING for f in fixed):
            return multi(GEOMETRYCOLLECTION, fixed)
        return multi(MULTILINESTRING, fixed)
    if t == MULTIPOLYGON:
        polys = [
            f for f in (
                _fix_polygon_element(e, keep_collapsed) for e in g.parts
            ) if f is not None and not f.is_empty
        ]
        if keep_collapsed and any(f.dimension() < 2 for f in polys):
            # collapses kept as lower-dim elements → heterogeneous result
            areas = _union([f for f in polys if f.dimension() == 2])
            lows = [f for f in polys if f.dimension() < 2]
            return multi(GEOMETRYCOLLECTION, lows + [areas])
        if not polys:
            return Geom(MULTIPOLYGON, parts=[])
        result = _union(polys)
        if keep_multi and result.gtype == POLYGON:
            result = multi(MULTIPOLYGON, [result])
        return result
    if t == GEOMETRYCOLLECTION:
        return multi(
            GEOMETRYCOLLECTION,
            [fix(e, keep_collapsed, keep_multi) for e in g.parts],
        )
    raise ValueError(f"unsupported geometry type {g.type_name}")
