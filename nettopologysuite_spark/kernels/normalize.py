"""Canonical form + exact comparison (Geometry.Normalize / EqualsExact).

Reference semantics:
- ring normalize: scroll start to the minimum coordinate, shell CW / holes
  CCW (``Geometries/Polygon.cs:530-547``), holes sorted;
- linestring normalize: lexicographically smaller direction
  (``Geometries/LineString.cs:448-463``);
- collections: normalize children then sort by the class sort-index +
  per-class comparison (``Geometries/GeometryCollection.cs:399-404``,
  ``Geometry.cs`` CompareTo);
- EqualsExact(tol): same structure, coordinates pairwise within tol
  (``Geometry.cs:1669``).

These are the comparison idiom of the golden corpus
(``test/NetTopologySuite.Tests.NUnit/GeometryTestCase.cs:41-92``).
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
)

# Geometry.SortIndex order (Geometry.cs)
_SORT_INDEX = {
    POINT: 0,
    MULTIPOINT: 1,
    LINESTRING: 2,
    MULTILINESTRING: 4,
    POLYGON: 5,
    MULTIPOLYGON: 6,
    GEOMETRYCOLLECTION: 7,
}


def _ring_is_ccw(r: np.ndarray) -> bool:
    x, y = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
    return float(np.sum(x * y2 - x2 * y)) > 0.0


def _scroll_ring(r: np.ndarray) -> np.ndarray:
    """Start the (closed) ring at its minimum coordinate."""
    body = r[:-1]
    if len(body) == 0:
        return r
    idx = np.lexsort((body[:, 1], body[:, 0]))[0]
    out = np.concatenate([body[idx:], body[:idx], body[idx : idx + 1]], axis=0)
    return out


def _normalize_ring(r: np.ndarray, clockwise: bool) -> np.ndarray:
    if len(r) == 0:
        return r
    r = _scroll_ring(r)
    if _ring_is_ccw(r) == clockwise:
        r = r[::-1].copy()
        r = _scroll_ring(r)
    return r


def _cmp_seq(a: np.ndarray, b: np.ndarray) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i, 0] != b[i, 0]:
            return -1 if a[i, 0] < b[i, 0] else 1
        if a[i, 1] != b[i, 1]:
            return -1 if a[i, 1] < b[i, 1] else 1
    if len(a) != len(b):
        return -1 if len(a) < len(b) else 1
    return 0


def compare_geoms(a: Geom, b: Geom) -> int:
    sa, sb = _SORT_INDEX[a.gtype], _SORT_INDEX[b.gtype]
    if sa != sb:
        return -1 if sa < sb else 1
    if a.gtype == POINT:
        ca = a.coords if a.coords is not None else np.empty((0, 2))
        cb = b.coords if b.coords is not None else np.empty((0, 2))
        return _cmp_seq(ca, cb)
    if a.gtype == LINESTRING:
        return _cmp_seq(a.coords, b.coords)
    if a.gtype == POLYGON:
        ra = a.rings[0] if a.rings else np.empty((0, 2))
        rb = b.rings[0] if b.rings else np.empty((0, 2))
        c = _cmp_seq(ra, rb)
        if c != 0:
            return c
        for ha, hb in zip(a.rings[1:], b.rings[1:]):
            c = _cmp_seq(ha, hb)
            if c != 0:
                return c
        na, nb = len(a.rings), len(b.rings)
        return 0 if na == nb else (-1 if na < nb else 1)
    # collections: element-wise
    for pa, pb in zip(a.parts, b.parts):
        c = compare_geoms(pa, pb)
        if c != 0:
            return c
    na, nb = len(a.parts), len(b.parts)
    return 0 if na == nb else (-1 if na < nb else 1)


def normalize(g: Geom) -> Geom:
    """Canonical copy (Geometry.Normalized())."""
    import functools

    if g.gtype == POINT:
        return Geom(POINT, coords=None if g.coords is None else g.coords.copy())
    if g.gtype == LINESTRING:
        c = g.coords.copy()
        n = len(c)
        for i in range(n // 2):
            j = n - 1 - i
            if c[i, 0] != c[j, 0] or c[i, 1] != c[j, 1]:
                if (c[i, 0], c[i, 1]) > (c[j, 0], c[j, 1]):
                    c = c[::-1].copy()
                break
        return Geom(LINESTRING, coords=c)
    if g.gtype == POLYGON:
        if not g.rings:
            return Geom(POLYGON)
        shell = _normalize_ring(g.rings[0], clockwise=True)
        holes = [_normalize_ring(h, clockwise=False) for h in g.rings[1:]]
        holes.sort(key=functools.cmp_to_key(_cmp_seq))
        return Geom(POLYGON, rings=[shell] + holes)
    parts = [normalize(p) for p in g.parts]
    parts.sort(key=functools.cmp_to_key(compare_geoms))
    return Geom(g.gtype, parts=parts)


def equals_exact(a: Geom, b: Geom, tol: float = 0.0) -> bool:
    if a.gtype != b.gtype:
        return False
    if a.is_empty or b.is_empty:
        return a.is_empty == b.is_empty

    def seq_eq(ca: np.ndarray, cb: np.ndarray) -> bool:
        if len(ca) != len(cb):
            return False
        if tol == 0.0:
            return bool((ca == cb).all())
        return bool((np.abs(ca - cb) <= tol).all())

    if a.gtype in (POINT, LINESTRING):
        return seq_eq(a.coords, b.coords)
    if a.gtype == POLYGON:
        return len(a.rings) == len(b.rings) and all(
            seq_eq(ra, rb) for ra, rb in zip(a.rings, b.rings)
        )
    return len(a.parts) == len(b.parts) and all(
        equals_exact(pa, pb, tol) for pa, pb in zip(a.parts, b.parts)
    )


def equals_normalized(a: Geom, b: Geom, tol: float = 0.0) -> bool:
    """The golden-corpus comparison (GeometryTestCase.CheckEqual)."""
    return equals_exact(normalize(a), normalize(b), tol)
