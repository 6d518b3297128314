"""Concave hull (Algorithm/Hull/ConcaveHull.cs:84-135 semantics).

Delaunay triangulation of the points, then border erosion: repeatedly remove
the border triangle with the longest boundary length while its size exceeds
the target edge length, provided removal keeps the hull connected (the tri
is not 'connecting') and strips no vertex (only tris with exactly one
boundary edge are candidates). maxLength = 0 erodes maximally; the
length-ratio variant interpolates between min and max Delaunay edge length.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .geom import LINESTRING, POINT, POLYGON, Geom
from .triangulate import _unique_points, delaunay_triangulation


class _Tris:
    def __init__(self, tris: list[tuple[int, int, int]]):
        self.tris = [tuple(t) for t in tris]
        self.alive = [True] * len(tris)
        self.edge_tris: dict[tuple, list[int]] = {}
        for ti, t in enumerate(self.tris):
            for i in range(3):
                self.edge_tris.setdefault(self._ekey(t[i], t[(i + 1) % 3]), []).append(ti)

    @staticmethod
    def _ekey(u: int, v: int) -> tuple:
        return (u, v) if u < v else (v, u)

    def adjacent(self, ti: int, i: int) -> int | None:
        t = self.tris[ti]
        for tj in self.edge_tris[self._ekey(t[i], t[(i + 1) % 3])]:
            if tj != ti and self.alive[tj]:
                return tj
        return None

    def num_adjacent(self, ti: int) -> int:
        return sum(1 for i in range(3) if self.adjacent(ti, i) is not None)

    def boundary_length(self, ti: int, pts: np.ndarray) -> float:
        t = self.tris[ti]
        tot = 0.0
        for i in range(3):
            if self.adjacent(ti, i) is None:
                a, b = pts[t[i]], pts[t[(i + 1) % 3]]
                tot += math.hypot(b[0] - a[0], b[1] - a[1])
        return tot

    def is_interior_vertex(self, v: int, vertex_tris: dict[int, list[int]]) -> bool:
        """v is interior iff every live edge incident to v is shared by two
        live tris (the fan around v closes)."""
        for ti in vertex_tris[v]:
            if not self.alive[ti]:
                continue
            t = self.tris[ti]
            i = t.index(v)
            # the two edges at v in this tri
            for j in (i, (i - 1) % 3):
                if self.adjacent(ti, j) is None:
                    return False
        return True

    def connecting_vertex(self, ti: int) -> int:
        """Vertex between the two NON-boundary edges (for a 2-adjacent tri)."""
        t = self.tris[ti]
        for i in range(3):
            # vertex t[i] is between edge (i-1, i) and edge (i, i+1)
            if (self.adjacent(ti, i) is not None
                    and self.adjacent(ti, (i - 1) % 3) is not None):
                return t[i]
        return -1


def concave_hull_by_length(g: Geom, max_length: float) -> Geom:
    pts = _unique_points(g)
    if len(pts) == 0:
        return Geom(POLYGON)
    tris = delaunay_triangulation(pts)
    if not tris:
        from .hull import convex_hull

        return convex_hull(g)
    return _erode(pts, tris, max_length)


def concave_hull_by_length_ratio(g: Geom, ratio: float) -> Geom:
    pts = _unique_points(g)
    if len(pts) == 0:
        return Geom(POLYGON)
    tris = delaunay_triangulation(pts)
    if not tris:
        from .hull import convex_hull

        return convex_hull(g)
    if ratio == 0:
        target = 0.0
    else:
        lens = []
        for t in tris:
            for i in range(3):
                a, b = pts[t[i]], pts[t[(i + 1) % 3]]
                lens.append(math.hypot(b[0] - a[0], b[1] - a[1]))
        mx, mn = max(lens), min(lens)
        target = 2 * mx if ratio == 1 else ratio * (mx - mn) + mn
    return _erode(pts, tris, target)


def _erode(pts: np.ndarray, tris: list, max_length: float) -> Geom:
    T = _Tris(tris)
    vertex_tris: dict[int, list[int]] = {}
    for ti, t in enumerate(T.tris):
        for v in t:
            vertex_tris.setdefault(v, []).append(ti)

    heap: list[tuple[float, int]] = []

    def add_border(ti: int):
        if ti is None or not T.alive[ti]:
            return
        if T.num_adjacent(ti) != 2:
            return
        heapq.heappush(heap, (-T.boundary_length(ti, pts), ti))

    for ti in range(len(T.tris)):
        add_border(ti)
    while heap:
        size, ti = heapq.heappop(heap)
        size = -size
        if not T.alive[ti]:
            continue
        if size < max_length:
            break  # all remaining are in the hull
        if T.num_adjacent(ti) != 2:
            continue
        cv = T.connecting_vertex(ti)
        if cv >= 0 and not T.is_interior_vertex(cv, vertex_tris):
            continue  # connecting tri: removal would split the hull
        adjs = [T.adjacent(ti, i) for i in range(3)]
        T.alive[ti] = False
        for a in adjs:
            if a is not None:
                add_border(a)
    # trace the boundary polygon (interior on the left of directed edges)
    succ: dict[int, int] = {}
    for ti, t in enumerate(T.tris):
        if not T.alive[ti]:
            continue
        for i in range(3):
            if T.adjacent(ti, i) is None:
                succ[t[i]] = t[(i + 1) % 3]
    if not succ:
        return Geom(POLYGON)
    start = min(succ)
    ring = [start]
    cur = succ[start]
    while cur != start and len(ring) <= len(succ) + 1:
        ring.append(cur)
        cur = succ[cur]
    ring.append(start)
    coords = np.array([pts[v] for v in ring], dtype=np.float64)
    return Geom(POLYGON, rings=[coords])
