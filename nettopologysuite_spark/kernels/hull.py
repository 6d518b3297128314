"""Convex hull (Algorithm/ConvexHull.cs semantics, monotone-chain build).

Degenerate outputs match the reference: 0 points → empty GC-like polygon,
1 point → POINT, collinear → LINESTRING of the two extremes, else POLYGON.
Distributed form: hull(hull(part_1) ∪ …) — associativity makes it a
two-phase aggregate (SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np

from .geom import GEOMETRYCOLLECTION, LINESTRING, POINT, POLYGON, Geom, polygon


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def hull_coords(pts: np.ndarray) -> np.ndarray:
    """CCW convex hull vertices (open ring) of a point array."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    n = len(pts)
    if n <= 2:
        return pts
    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(g: Geom) -> Geom:
    pts = g.all_coords()
    if len(pts) == 0:
        return Geom(GEOMETRYCOLLECTION)
    h = hull_coords(pts)
    if len(h) == 1:
        return Geom(POINT, coords=h.copy())
    if len(h) == 2:
        return Geom(LINESTRING, coords=h.copy())
    return polygon(h)
