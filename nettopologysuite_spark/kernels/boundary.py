"""Boundary operator (Operation/BoundaryOp.cs, Mod-2 node rule).

- Point/MultiPoint → GEOMETRYCOLLECTION EMPTY
- LineString/MultiLineString → MULTIPOINT of odd-degree endpoints
  (single endpoint pair → the reference returns MULTIPOINT of them;
  closed/empty → MULTIPOINT EMPTY)
- Polygon → LinearRing as LINESTRING (1 ring) or MULTILINESTRING
- MultiPolygon → MULTILINESTRING of all rings
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


def boundary(g: Geom) -> Geom:
    if g.gtype in (POINT, MULTIPOINT):
        return Geom(GEOMETRYCOLLECTION)
    if g.gtype in (LINESTRING, MULTILINESTRING):
        lines = [l for l in g.flatten() if l.gtype == LINESTRING and len(l.coords) >= 2]
        cnt: dict[tuple[float, float], int] = {}
        order: list[tuple[float, float]] = []
        for ln in lines:
            for p in (tuple(ln.coords[0]), tuple(ln.coords[-1])):
                if p not in cnt:
                    order.append(p)
                cnt[p] = cnt.get(p, 0) + 1
        pts = [p for p in order if cnt[p] % 2 == 1]
        return Geom(
            MULTIPOINT,
            parts=[Geom(POINT, coords=np.array([p], dtype=np.float64)) for p in pts],
        )
    if g.gtype == POLYGON:
        rings = [Geom(LINESTRING, coords=r.copy()) for r in g.rings]
        if len(rings) == 1:
            return rings[0]
        return Geom(MULTILINESTRING, parts=rings)
    if g.gtype == MULTIPOLYGON:
        rings = [
            Geom(LINESTRING, coords=r.copy()) for p in g.parts for r in p.rings
        ]
        if not rings:
            return Geom(MULTILINESTRING)
        return Geom(MULTILINESTRING, parts=rings)
    # GeometryCollection: boundary of each, collected (reference throws for
    # GC; corpus doesn't exercise it)
    parts = [boundary(p) for p in g.parts]
    return Geom(GEOMETRYCOLLECTION, parts=parts)
