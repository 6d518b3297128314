"""Polygon hull simplifier (Simplify/PolygonHullSimplifier.cs, RingHull.cs).

Outer hulls CONTAIN the input; inner hulls are CONTAINED by it. The ring is
oriented (outer → CW, inner → CCW) so removable corners are exactly the
non-convex ones; corners are removed smallest-area first while the target
(vertex-count fraction or area-delta ratio) allows, and only when the
corner triangle contains no other vertex (of any ring)."""

from __future__ import annotations

import heapq
import math

import numpy as np

from .geom import MULTIPOLYGON, POLYGON, Geom
from .orientation import is_ccw, orient_index


class _Ring:
    def __init__(self, pts: list[tuple]):
        self.pts = pts
        n = len(pts)
        self.prev = [(i - 1) % n for i in range(n)]
        self.next = [(i + 1) % n for i in range(n)]
        self.alive = [True] * n
        self.count = n

    def remove(self, i: int):
        p, nx = self.prev[i], self.next[i]
        self.next[p] = nx
        self.prev[nx] = p
        self.alive[i] = False
        self.count -= 1

    def coords(self) -> list[tuple]:
        start = next(i for i in range(len(self.pts)) if self.alive[i])
        out = [self.pts[start]]
        j = self.next[start]
        while j != start:
            out.append(self.pts[j])
            j = self.next[j]
        out.append(self.pts[start])
        return out


def _tri_area(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2.0


def _in_triangle(q, a, b, c) -> bool:
    d1 = orient_index(a[0], a[1], b[0], b[1], q[0], q[1])
    d2 = orient_index(b[0], b[1], c[0], c[1], q[0], q[1])
    d3 = orient_index(c[0], c[1], a[0], a[1], q[0], q[1])
    has_neg = d1 < 0 or d2 < 0 or d3 < 0
    has_pos = d1 > 0 or d2 > 0 or d3 > 0
    return not (has_neg and has_pos)


def _ring_hull(pts_closed: np.ndarray, is_outer: bool,
               vertex_frac: float | None, area_delta_ratio: float | None,
               other_vertices: list[tuple]) -> list[tuple]:
    verts = [(float(x), float(y)) for x, y in pts_closed[:-1]]
    # orient: outer → CW, inner → CCW (RingHull.Init)
    ring_ccw = is_ccw(pts_closed)
    if (is_outer and ring_ccw) or (not is_outer and not ring_ccw):
        verts = list(reversed(verts))
    ring = _Ring(verts)
    n0 = len(verts)
    target_vn = None
    target_area = None
    if vertex_frac is not None:
        target_vn = math.ceil(vertex_frac * n0)
    if area_delta_ratio is not None:
        ring_area = _shoelace(verts)
        target_area = area_delta_ratio * ring_area
    area_delta = 0.0

    def convex(i: int) -> bool:
        pp, p, pn = ring.pts[ring.prev[i]], ring.pts[i], ring.pts[ring.next[i]]
        return orient_index(pp[0], pp[1], p[0], p[1], pn[0], pn[1]) == -1  # CW

    heap: list[tuple[float, int, int, int, int]] = []
    tie = 0

    def push(i: int):
        nonlocal tie
        if not ring.alive[i] or convex(i):
            return
        a = _tri_area(ring.pts[ring.prev[i]], ring.pts[i], ring.pts[ring.next[i]])
        tie += 1
        heapq.heappush(heap, (a, tie, i, ring.prev[i], ring.next[i]))

    for i in range(n0):
        push(i)
    while heap and ring.count > 3:
        a, _t, i, p0, n1 = heapq.heappop(heap)
        if not ring.alive[i] or ring.prev[i] != p0 or ring.next[i] != n1:
            continue  # removed or corner changed since queued
        # RingHull.IsAtTarget: stop when count drops BELOW the target
        if target_vn is not None and ring.count < target_vn:
            break
        if target_area is not None and area_delta + a > target_area:
            break
        # removable only if the corner triangle contains no other vertex
        tri = (ring.pts[p0], ring.pts[i], ring.pts[n1])
        blocked = False
        for j in range(len(ring.pts)):
            if not ring.alive[j] or j in (i, p0, n1):
                continue
            if _in_triangle(ring.pts[j], *tri):
                blocked = True
                break
        if not blocked:
            for q in other_vertices:
                if _in_triangle(q, *tri):
                    blocked = True
                    break
        if blocked:
            continue
        ring.remove(i)
        area_delta += a
        push(p0)
        push(n1)
    return ring.coords()


def _shoelace(verts: list[tuple]) -> float:
    s = 0.0
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def polygon_hull(g: Geom, is_outer: bool, vertex_frac: float | None = None,
                 area_delta_ratio: float | None = None) -> Geom:
    """PolygonHullSimplifier.Hull / HullByAreaDelta."""
    parts = []
    leaves = [l for l in g.flatten() if l.gtype == POLYGON]
    for leaf in leaves:
        other: list[tuple] = []
        for other_leaf in leaves:
            if other_leaf is not leaf:
                for r in other_leaf.rings:
                    other.extend((float(x), float(y)) for x, y in r[:-1])
        rings_out = []
        for ri, r in enumerate(leaf.rings):
            # shell uses the requested hull side; holes the opposite (the
            # hull must contain/be-contained consistently)
            ring_outer = is_outer if ri == 0 else not is_outer
            others = other + [
                (float(x), float(y))
                for rj, r2 in enumerate(leaf.rings) if rj != ri
                for x, y in r2[:-1]
            ]
            rings_out.append(
                np.array(_ring_hull(r, ring_outer, vertex_frac,
                                    area_delta_ratio, others))
            )
        parts.append(Geom(POLYGON, rings=rings_out))
    if not parts:
        return Geom(POLYGON)
    if len(parts) == 1:
        return parts[0]
    return Geom(MULTIPOLYGON, parts=parts)
