"""Interior point / point-on-surface (Algorithm/InteriorPoint*.cs exact port).

Dispatch by effective dimension (Algorithm/InteriorPoint.GetInteriorCoord):
- areal: scan-line bisector — Y chosen between the closest vertex ordinates
  around the envelope centre (``InteriorPointArea.cs:412-470``), crossings
  with the parity-safe counting rule (:302-330), widest section midpoint
  (:260-290); polygon with the widest section wins (strict >).
- lineal: interior vertex closest to the centroid, endpoints as fallback
  (``InteriorPointLine.cs:38-113``).
- puntal: component point closest to the centroid (``InteriorPointPoint.cs``).
"""

from __future__ import annotations

import numpy as np

from .geom import LINESTRING, POINT, POLYGON, Geom
from .measures import centroid


def _scan_line_y(poly: Geom) -> float:
    all_pts = np.concatenate([r for r in poly.rings], axis=0)
    lo = float(all_pts[:, 1].min())
    hi = float(all_pts[:, 1].max())
    centre = (lo + hi) / 2.0
    lo_y, hi_y = lo, hi
    for y in all_pts[:, 1]:
        y = float(y)
        if y <= centre:
            if y > lo_y:
                lo_y = y
        elif y < hi_y:
            hi_y = y
    return (hi_y + lo_y) / 2.0


def _polygon_interior_point(poly: Geom) -> tuple[tuple[float, float], float]:
    """((x, y), section_width); width 0 with first coordinate for degenerate."""
    scan_y = _scan_line_y(poly)
    crossings: list[float] = []
    for ring in poly.rings:
        ry = ring[:, 1]
        if scan_y < ry.min() or scan_y > ry.max():
            continue
        for i in range(len(ring) - 1):
            x0, y0 = float(ring[i, 0]), float(ring[i, 1])
            x1, y1 = float(ring[i + 1, 0]), float(ring[i + 1, 1])
            if scan_y < min(y0, y1) or scan_y > max(y0, y1):
                continue
            if y0 == y1:
                continue
            if y0 == scan_y and y1 < scan_y:
                continue
            if y1 == scan_y and y0 < scan_y:
                continue
            if x0 == x1:
                crossings.append(x0)
            else:
                m = (y1 - y0) / (x1 - x0)
                crossings.append(x0 + ((scan_y - y0) / m))
    default = (float(poly.rings[0][0, 0]), float(poly.rings[0][0, 1]))
    if not crossings:
        return default, 0.0
    crossings.sort()
    best = default
    best_w = 0.0
    for i in range(0, len(crossings) - 1, 2):
        w = crossings[i + 1] - crossings[i]
        if w > best_w:
            best_w = w
            best = ((crossings[i] + crossings[i + 1]) / 2.0, scan_y)
    return best, best_w


def interior_point_area(g: Geom) -> tuple[float, float] | None:
    best = None
    max_w = -1.0
    for leaf in g.flatten():
        if leaf.gtype != POLYGON or not leaf.rings:
            continue
        pt, w = _polygon_interior_point(leaf)
        if w > max_w:
            max_w = w
            best = pt
    return best


def _closest_to(cands: list[tuple[float, float]], target: tuple[float, float]):
    best = None
    best_d = np.inf
    for x, y in cands:
        d = (x - target[0]) ** 2 + (y - target[1]) ** 2
        if d < best_d:
            best_d = d
            best = (x, y)
    return best


def interior_point_line(g: Geom) -> tuple[float, float] | None:
    cent = centroid(g)
    if cent is None:
        return None
    inner: list[tuple[float, float]] = []
    ends: list[tuple[float, float]] = []
    for leaf in g.flatten():
        if leaf.gtype != LINESTRING or len(leaf.coords) == 0:
            continue
        for i in range(1, len(leaf.coords) - 1):
            inner.append((float(leaf.coords[i, 0]), float(leaf.coords[i, 1])))
        ends.append((float(leaf.coords[0, 0]), float(leaf.coords[0, 1])))
        ends.append((float(leaf.coords[-1, 0]), float(leaf.coords[-1, 1])))
    return _closest_to(inner, cent) or _closest_to(ends, cent)


def interior_point_point(g: Geom) -> tuple[float, float] | None:
    cent = centroid(g)
    if cent is None:
        return None
    pts = [
        (float(l.coords[0, 0]), float(l.coords[0, 1]))
        for l in g.flatten()
        if l.gtype == POINT
    ]
    return _closest_to(pts, cent)


def interior_point(g: Geom) -> tuple[float, float] | None:
    dim = g.dimension()
    if dim == 2:
        return interior_point_area(g)
    if dim == 1:
        return interior_point_line(g)
    if dim == 0:
        return interior_point_point(g)
    return None
