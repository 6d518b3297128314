"""Rotating-caliper constructions: MinimumDiameter and
MinimumAreaRectangle (``Algorithm/MinimumDiameter.cs``,
``Algorithm/MinimumAreaRectangle.cs`` semantics).

MinimumDiameter: the minimum width of the convex hull — the shortest
segment from a hull vertex perpendicular onto a supporting hull edge.
MinimumAreaRectangle: the smallest-area rectangle containing the geometry
(one side collinear with a hull edge).
"""

from __future__ import annotations

import math

import numpy as np

from .geom import LINESTRING, POLYGON, Geom


def _hull_ring(g: Geom) -> np.ndarray | None:
    """Closed CCW hull ring, or None for degenerate (point/segment) hulls."""
    from .hull import convex_hull

    h = convex_hull(g)
    if h.gtype == POLYGON and h.rings:
        return h.rings[0]
    if h.gtype == LINESTRING:
        return None  # collinear
    return None


def _perp_dist(ax, ay, bx, by, px, py) -> float:
    """Perpendicular distance of p from the infinite line a→b."""
    dx, dy = bx - ax, by - ay
    ll = math.hypot(dx, dy)
    if ll == 0.0:
        return math.hypot(px - ax, py - ay)
    return abs(dx * (py - ay) - dy * (px - ax)) / ll


def _project_on_line(ax, ay, bx, by, px, py) -> tuple[float, float]:
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return (ax, ay)
    t = ((px - ax) * dx + (py - ay) * dy) / ll
    return (ax + t * dx, ay + t * dy)


def minimum_diameter(g: Geom) -> tuple[float, tuple, tuple]:
    """(width, width_point, base_point): the minimum width of the hull and
    the diameter segment (width_point → its projection on the supporting
    edge's line)."""
    pts = g.all_coords()
    if pts is None or len(pts) == 0:
        return (0.0, (float("nan"),) * 2, (float("nan"),) * 2)
    ring = _hull_ring(g)
    if ring is None:
        # degenerate: point or collinear — width 0 at the first hull coord
        from .hull import convex_hull

        h = convex_hull(g)
        c = h.all_coords()
        p = (float(c[0, 0]), float(c[0, 1]))
        return (0.0, p, p)
    P = ring[:-1]
    n = len(P)
    best = (math.inf, None, None)
    j = 1
    for i in range(n):
        a = P[i]
        b = P[(i + 1) % n]
        # advance the caliper: farthest vertex from edge i (monotone)
        while True:
            d_cur = _perp_dist(a[0], a[1], b[0], b[1], P[j % n][0], P[j % n][1])
            d_nxt = _perp_dist(a[0], a[1], b[0], b[1], P[(j + 1) % n][0], P[(j + 1) % n][1])
            if d_nxt > d_cur:
                j += 1
            else:
                break
        d = _perp_dist(a[0], a[1], b[0], b[1], P[j % n][0], P[j % n][1])
        if d < best[0]:
            wp = (float(P[j % n][0]), float(P[j % n][1]))
            bp = _project_on_line(a[0], a[1], b[0], b[1], wp[0], wp[1])
            best = (d, wp, (float(bp[0]), float(bp[1])))
    return best


def minimum_area_rectangle(g: Geom) -> Geom:
    """Smallest-area enclosing rectangle (a polygon; degenerates to the
    geometry's extent segment/point for collinear/point inputs)."""
    pts = g.all_coords()
    if pts is None or len(pts) == 0:
        return Geom(POLYGON)
    ring = _hull_ring(g)
    if ring is None:
        from .hull import convex_hull

        return convex_hull(g)  # point or segment
    P = ring[:-1]
    n = len(P)
    best_area = math.inf
    best_rect = None
    for i in range(n):
        a = P[i]
        b = P[(i + 1) % n]
        ux, uy = b[0] - a[0], b[1] - a[1]
        ll = math.hypot(ux, uy)
        if ll == 0.0:
            continue
        ux, uy = ux / ll, uy / ll
        vx, vy = -uy, ux
        s = (P[:, 0] - a[0]) * ux + (P[:, 1] - a[1]) * uy
        t = (P[:, 0] - a[0]) * vx + (P[:, 1] - a[1]) * vy
        w = s.max() - s.min()
        h = t.max() - t.min()
        area = w * h
        if area < best_area:
            s0, s1, t0, t1 = s.min(), s.max(), t.min(), t.max()
            corners = [
                (a[0] + s0 * ux + t0 * vx, a[1] + s0 * uy + t0 * vy),
                (a[0] + s1 * ux + t0 * vx, a[1] + s1 * uy + t0 * vy),
                (a[0] + s1 * ux + t1 * vx, a[1] + s1 * uy + t1 * vy),
                (a[0] + s0 * ux + t1 * vx, a[1] + s0 * uy + t1 * vy),
            ]
            best_area = area
            best_rect = corners
    ring_out = np.array(best_rect + best_rect[:1], dtype=np.float64)
    return Geom(POLYGON, rings=[ring_out])
