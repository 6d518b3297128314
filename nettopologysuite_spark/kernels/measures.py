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


def _ring_is_ccw(r: np.ndarray) -> bool:
    from .orientation import is_ccw

    return is_ccw(r)


def centroid(g: Geom) -> tuple[float, float] | None:
    """Dimension-weighted centroid — exact port of ``Algorithm/Centroid.cs``:
    triangles anchored at the current shell's first coordinate (:170-190,
    numerically essential for near-degenerate rings), rings also feed the
    lineal accumulator, zero-length components degrade to their first point
    (:229-252), highest present dimension wins (:122-153)."""
    state = {
        "base": None,
        "cg3x": 0.0, "cg3y": 0.0, "areasum2": 0.0,
        "lcx": 0.0, "lcy": 0.0, "tlen": 0.0,
        "pn": 0, "pcx": 0.0, "pcy": 0.0,
    }

    def add_point(x: float, y: float):
        state["pn"] += 1
        state["pcx"] += x
        state["pcy"] += y

    def add_line_segments(pts: np.ndarray):
        line_len = 0.0
        for i in range(len(pts) - 1):
            seg = math.hypot(pts[i + 1, 0] - pts[i, 0], pts[i + 1, 1] - pts[i, 1])
            if seg == 0.0:
                continue
            line_len += seg
            state["lcx"] += seg * ((pts[i, 0] + pts[i + 1, 0]) / 2)
            state["lcy"] += seg * ((pts[i, 1] + pts[i + 1, 1]) / 2)
        state["tlen"] += line_len
        if line_len == 0.0 and len(pts) > 0:
            add_point(float(pts[0, 0]), float(pts[0, 1]))

    def add_triangles(pts: np.ndarray, positive: bool):
        sign = 1.0 if positive else -1.0
        bx, by = state["base"]
        for i in range(len(pts) - 1):
            area2 = (pts[i, 0] - bx) * (pts[i + 1, 1] - by) - (
                pts[i + 1, 0] - bx
            ) * (pts[i, 1] - by)
            cx3 = bx + pts[i, 0] + pts[i + 1, 0]
            cy3 = by + pts[i, 1] + pts[i + 1, 1]
            state["cg3x"] += sign * area2 * cx3
            state["cg3y"] += sign * area2 * cy3
            state["areasum2"] += sign * area2

    def add(geom: Geom):
        if geom.gtype == POINT:
            if not geom.is_empty:
                add_point(float(geom.coords[0, 0]), float(geom.coords[0, 1]))
        elif geom.gtype == LINESTRING:
            if geom.coords is not None and len(geom.coords) > 0:
                add_line_segments(geom.coords)
        elif geom.gtype == POLYGON:
            if not geom.rings:
                return
            shell = geom.rings[0]
            if len(shell) > 0:
                state["base"] = (float(shell[0, 0]), float(shell[0, 1]))
            add_triangles(shell, positive=not _ring_is_ccw(shell))
            add_line_segments(shell)
            for hole in geom.rings[1:]:
                add_triangles(hole, positive=_ring_is_ccw(hole))
                add_line_segments(hole)
        else:
            for p in geom.parts:
                add(p)

    add(g)
    if abs(state["areasum2"]) > 0.0:
        return (
            state["cg3x"] / 3 / state["areasum2"],
            state["cg3y"] / 3 / state["areasum2"],
        )
    if state["tlen"] > 0.0:
        return (state["lcx"] / state["tlen"], state["lcy"] / state["tlen"])
    if state["pn"] > 0:
        return (state["pcx"] / state["pn"], state["pcy"] / state["pn"])
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
        return 0.0  # DistanceOp convention for empty inputs (corpus expects 0)

    ax1, ay1, ax2, ay2 = _segments_of(a)
    bx1, by1, bx2, by2 = _segments_of(b)
    a_pts = a.all_coords()
    b_pts = b.all_coords()

    # min over: segment×segment, every A vertex/point × B segments, every
    # B vertex/point × A segments, point×point (isolated points included —
    # all_coords carries both segment vertices and point components)
    best = np.inf
    if len(ax1) and len(bx1):
        best = min(best, _segseg_dist2(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2))
    if len(bx1) and len(a_pts):
        best = min(best, float(
            point_segment_dist2(
                a_pts[:, 0][:, None], a_pts[:, 1][:, None],
                bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
            ).min()
        ))
    if len(ax1) and len(b_pts):
        best = min(best, float(
            point_segment_dist2(
                b_pts[:, 0][:, None], b_pts[:, 1][:, None],
                ax1[None, :], ay1[None, :], ax2[None, :], ay2[None, :],
            ).min()
        ))
    if len(a_pts) and len(b_pts):
        dx = a_pts[:, 0][:, None] - b_pts[None, :, 0]
        dy = a_pts[:, 1][:, None] - b_pts[None, :, 1]
        best = min(best, float((dx * dx + dy * dy).min()))

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
