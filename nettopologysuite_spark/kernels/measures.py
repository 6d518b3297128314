"""Scalar measures: area, length, centroid, distance.

Semantics per the reference:
- area: shoelace over rings, holes negative (``Algorithm/Area.cs:1-105``)
- length: segment-length sum (``Algorithm/Length.cs:1-50``)
- centroid: dimension-weighted — areal centroid when any 2-D component has
  nonzero area, else lineal, else point average (``Algorithm/Centroid.cs:46``)
- distance: min pairwise facet distance with envelope-style short-circuits
  (``Operation/Distance/DistanceOp.cs:32-107``)
"""

from __future__ import annotations

import math

import numpy as np

from .geom import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)


def _ring_signed_area2(r: np.ndarray) -> float:
    """Twice the signed area (CCW positive) of a closed ring."""
    if len(r) < 3:
        return 0.0
    x = r[:, 0]
    y = r[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(g: Geom) -> float:
    if g.gtype == POLYGON:
        if not g.rings:
            return 0.0
        total = abs(_ring_signed_area2(g.rings[0])) / 2.0
        for h in g.rings[1:]:
            total -= abs(_ring_signed_area2(h)) / 2.0
        return total
    if g.gtype in (MULTIPOLYGON,) or g.parts:
        return float(sum(area(p) for p in g.parts))
    return 0.0


def length(g: Geom) -> float:
    if g.gtype == LINESTRING:
        c = g.coords
        if c is None or len(c) < 2:
            return 0.0
        d = np.diff(c, axis=0)
        return float(np.sqrt((d * d).sum(axis=1)).sum())
    if g.gtype == POLYGON:
        total = 0.0
        for r in g.rings:
            d = np.diff(r, axis=0)
            total += float(np.sqrt((d * d).sum(axis=1)).sum())
        return total
    if g.parts:
        return float(sum(length(p) for p in g.parts))
    return 0.0


def centroid(g: Geom) -> tuple[float, float] | None:
    """Dimension-weighted centroid (Centroid.cs Add/GetCentroid logic)."""
    a_sum = 0.0
    a_cx = 0.0
    a_cy = 0.0
    l_sum = 0.0
    l_cx = 0.0
    l_cy = 0.0
    p_n = 0
    p_cx = 0.0
    p_cy = 0.0

    def add(geom: Geom):
        nonlocal a_sum, a_cx, a_cy, l_sum, l_cx, l_cy, p_n, p_cx, p_cy
        if geom.gtype == POINT:
            if not geom.is_empty:
                p_n += 1
                p_cx += geom.coords[0, 0]
                p_cy += geom.coords[0, 1]
        elif geom.gtype == LINESTRING:
            c = geom.coords
            if c is None or len(c) < 2:
                if c is not None and len(c) == 1:
                    p_n += 1
                    p_cx += c[0, 0]
                    p_cy += c[0, 1]
                return
            d = np.diff(c, axis=0)
            seg_len = np.sqrt((d * d).sum(axis=1))
            mid = (c[:-1] + c[1:]) * 0.5
            l_sum += float(seg_len.sum())
            l_cx += float((mid[:, 0] * seg_len).sum())
            l_cy += float((mid[:, 1] * seg_len).sum())
        elif geom.gtype == POLYGON:
            for k, r in enumerate(geom.rings):
                x = r[:, 0]
                y = r[:, 1]
                cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                a2 = float(cross.sum())
                sx = float((cross * (x[:-1] + x[1:])).sum())
                sy = float((cross * (y[:-1] + y[1:])).sum())
                if a2 < 0:  # normalize ring orientation to CCW
                    a2, sx, sy = -a2, -sx, -sy
                sign = 1.0 if k == 0 else -1.0  # holes subtract
                a_sum += sign * a2
                a_cx += sign * sx
                a_cy += sign * sy
                # lineal fallback accumulators (used when total area is 0)
                d = np.diff(r, axis=0)
                seg_len = np.sqrt((d * d).sum(axis=1))
                mid = (r[:-1] + r[1:]) * 0.5
                l_sum += float(seg_len.sum())
                l_cx += float((mid[:, 0] * seg_len).sum())
                l_cy += float((mid[:, 1] * seg_len).sum())
        else:
            for p in geom.parts:
                add(p)

    add(g)
    if a_sum != 0.0:
        return (a_cx / (3.0 * a_sum), a_cy / (3.0 * a_sum))
    if l_sum != 0.0:
        return (l_cx / l_sum, l_cy / l_sum)
    if p_n:
        return (p_cx / p_n, p_cy / p_n)
    return None


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------

def point_segment_dist2(px, py, x1, y1, x2, y2):
    """Vectorized squared distance point(s) → segment(s) (broadcastable)."""
    dx = x2 - x1
    dy = y2 - y1
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / ll
    t = np.where(ll > 0, np.clip(t, 0.0, 1.0), 0.0)
    cx = x1 + t * dx
    cy = y1 + t * dy
    ex = px - cx
    ey = py - cy
    return ex * ex + ey * ey


def _segments_of(g: Geom) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    a_list, b_list = [], []
    if g.gtype == LINESTRING and g.coords is not None and len(g.coords) >= 2:
        a_list.append(g.coords[:-1])
        b_list.append(g.coords[1:])
    elif g.gtype == POLYGON:
        for r in g.rings:
            if len(r) >= 2:
                a_list.append(r[:-1])
                b_list.append(r[1:])
    else:
        for p in g.parts:
            x1, y1, x2, y2 = _segments_of(p)
            if len(x1):
                a_list.append(np.stack([x1, y1], axis=1))
                b_list.append(np.stack([x2, y2], axis=1))
    if not a_list:
        e = np.empty(0)
        return e, e, e, e
    a = np.concatenate(a_list, axis=0)
    b = np.concatenate(b_list, axis=0)
    return a[:, 0], a[:, 1], b[:, 0], b[:, 1]


def _segseg_dist2(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> float:
    """Min squared distance between two segment sets (M × N broadcast)."""
    # endpoint-to-opposite-segment distances cover non-crossing cases
    d = np.inf
    for px, py in ((ax1, ay1), (ax2, ay2)):
        d = min(d, float(point_segment_dist2(px[:, None], py[:, None], bx1[None, :], by1[None, :], bx2[None, :], by2[None, :]).min()))
    for px, py in ((bx1, by1), (bx2, by2)):
        d = min(d, float(point_segment_dist2(px[:, None], py[:, None], ax1[None, :], ay1[None, :], ax2[None, :], ay2[None, :]).min()))
    if d == 0.0:
        return 0.0
    # crossing check: if any pair properly intersects, distance is 0
    r_px = ax1[:, None]
    r_py = ay1[:, None]
    r_dx = (ax2 - ax1)[:, None]
    r_dy = (ay2 - ay1)[:, None]
    s_px = bx1[None, :]
    s_py = by1[None, :]
    s_dx = (bx2 - bx1)[None, :]
    s_dy = (by2 - by1)[None, :]
    denom = r_dx * s_dy - r_dy * s_dx
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((s_px - r_px) * s_dy - (s_py - r_py) * s_dx) / denom
        u = ((s_px - r_px) * r_dy - (s_py - r_py) * r_dx) / denom
    crossing = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    if bool(crossing.any()):
        return 0.0
    return d


def distance(a: Geom, b: Geom) -> float:
    """DistanceOp.Distance semantics (facet min distance, 0 if intersecting
    interiors — polygon containment handled via PIP)."""
    from .pip import EXTERIOR, PreparedPolygon

    if a.is_empty or b.is_empty:
        return math.nan

    ax1, ay1, ax2, ay2 = _segments_of(a)
    bx1, by1, bx2, by2 = _segments_of(b)
    a_pts = a.all_coords()
    b_pts = b.all_coords()

    best = np.inf
    if len(ax1) and len(bx1):
        best = _segseg_dist2(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    elif len(ax1):
        best = float(
            point_segment_dist2(
                b_pts[:, 0][:, None], b_pts[:, 1][:, None], ax1[None, :], ay1[None, :], ax2[None, :], ay2[None, :]
            ).min()
        )
    elif len(bx1):
        best = float(
            point_segment_dist2(
                a_pts[:, 0][:, None], a_pts[:, 1][:, None], bx1[None, :], by1[None, :], bx2[None, :], by2[None, :]
            ).min()
        )
    else:
        dx = a_pts[:, 0][:, None] - b_pts[None, :, 0]
        dy = a_pts[:, 1][:, None] - b_pts[None, :, 1]
        best = float((dx * dx + dy * dy).min())

    if best > 0:
        # containment: any vertex of one inside a polygonal other → 0
        for g1, g2_pts in ((a, b_pts), (b, a_pts)):
            for leaf in g1.flatten():
                if leaf.gtype == POLYGON and len(g2_pts):
                    loc = PreparedPolygon(leaf).locate(g2_pts[:, 0], g2_pts[:, 1])
                    if bool((loc != EXTERIOR).any()):
                        return 0.0
    return math.sqrt(best)


def is_within_distance(a: Geom, b: Geom, d: float) -> bool:
    """Geometry.IsWithinDistance (Geometry.cs:468)."""
    return distance(a, b) <= d
