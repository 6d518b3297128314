"""Indexed facet distance (Operation/Distance/IndexedFacetDistance.cs).

Build-once/probe-many distance: an STRtree over one geometry's facets
(segments and isolated points), probed by branch-and-bound with exact
segment-segment distances. The prepared analog of DistanceOp for kNN
re-ranking and repeated distance probes.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .geom import LINESTRING, POINT, POLYGON, Geom
from .strtree import STRtree


def _facets(g: Geom) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) endpoint arrays of all facets (points become zero-length)."""
    a, b = [], []
    for leaf in g.flatten():
        if leaf.gtype == POINT and not leaf.is_empty:
            a.append(leaf.coords)
            b.append(leaf.coords)
        elif leaf.gtype == LINESTRING and leaf.coords is not None and len(leaf.coords) >= 2:
            a.append(leaf.coords[:-1])
            b.append(leaf.coords[1:])
        elif leaf.gtype == POLYGON:
            for r in leaf.rings:
                if len(r) >= 2:
                    a.append(r[:-1])
                    b.append(r[1:])
    if not a:
        return np.empty((0, 2)), np.empty((0, 2))
    return np.concatenate(a), np.concatenate(b)


def _seg_seg_dist(p1, p2, q1, q2) -> float:
    from .measures import point_segment_dist2
    from .predicates import segs_intersect_any

    if segs_intersect_any(
        np.array([p1]), np.array([p2]), np.array([q1]), np.array([q2])
    ):
        return 0.0
    d2 = [
        point_segment_dist2(np.array([p1[0]]), np.array([p1[1]]),
                            np.array([q1[0]]), np.array([q1[1]]),
                            np.array([q2[0]]), np.array([q2[1]]))[0],
        point_segment_dist2(np.array([p2[0]]), np.array([p2[1]]),
                            np.array([q1[0]]), np.array([q1[1]]),
                            np.array([q2[0]]), np.array([q2[1]]))[0],
        point_segment_dist2(np.array([q1[0]]), np.array([q1[1]]),
                            np.array([p1[0]]), np.array([p1[1]]),
                            np.array([p2[0]]), np.array([p2[1]]))[0],
        point_segment_dist2(np.array([q2[0]]), np.array([q2[1]]),
                            np.array([p1[0]]), np.array([p1[1]]),
                            np.array([p2[0]]), np.array([p2[1]]))[0],
    ]
    return math.sqrt(float(min(d2)))


def _env_env_dist2(e1, e2) -> float:
    dx = max(0.0, max(e1[0] - e2[2], e2[0] - e1[2]))
    dy = max(0.0, max(e1[1] - e2[3], e2[1] - e1[3]))
    return dx * dx + dy * dy


class IndexedFacetDistance:
    """Prepared facet-distance structure over one geometry."""

    def __init__(self, g: Geom):
        self.g = g
        self.a, self.b = _facets(g)
        env = np.empty((len(self.a), 4))
        env[:, 0] = np.minimum(self.a[:, 0], self.b[:, 0])
        env[:, 1] = np.minimum(self.a[:, 1], self.b[:, 1])
        env[:, 2] = np.maximum(self.a[:, 0], self.b[:, 0])
        env[:, 3] = np.maximum(self.a[:, 1], self.b[:, 1])
        self.env = env
        self.tree = STRtree(env)

    def distance(self, other: Geom) -> float:
        """Branch-and-bound min distance between facet sets. NOTE: facet
        distance is BOUNDARY distance — containment (other inside an areal
        self) is resolved by the caller or :func:`facet_distance`."""
        qa, qb = _facets(other)
        if len(qa) == 0 or len(self.a) == 0:
            return math.inf
        best = math.inf
        tree = self.tree
        if not tree.levels:
            return best
        top = len(tree.levels) - 1
        for qi in range(len(qa)):
            qenv = (
                min(qa[qi, 0], qb[qi, 0]), min(qa[qi, 1], qb[qi, 1]),
                max(qa[qi, 0], qb[qi, 0]), max(qa[qi, 1], qb[qi, 1]),
            )
            heap = [(_env_env_dist2(tree.levels[top][0], qenv), 0, top + 1, 0)]
            tie = 0
            while heap:
                d2, _t, lvl, ni = heapq.heappop(heap)
                if d2 >= best * best:
                    break
                if lvl == 0:
                    item = int(ni)
                    d = _seg_seg_dist(self.a[item], self.b[item], qa[qi], qb[qi])
                    if d < best:
                        best = d
                        if best == 0.0:
                            return 0.0
                    continue
                ch = tree.children[lvl - 1]
                if lvl - 1 == 0:
                    for c in range(int(ch[ni, 0]), int(ch[ni, 1])):
                        item = int(tree.item_order[c])
                        tie += 1
                        heapq.heappush(
                            heap,
                            (_env_env_dist2(tree.envs[item], qenv), tie, 0, item),
                        )
                else:
                    child_env = tree.levels[lvl - 2]
                    for c in range(int(ch[ni, 0]), int(ch[ni, 1])):
                        tie += 1
                        heapq.heappush(
                            heap,
                            (_env_env_dist2(child_env[c], qenv), tie, lvl - 1, c),
                        )
        return best


def facet_distance(a: Geom, b: Geom) -> float:
    """Full distance semantics via the prepared structure: 0 when the
    geometries interact (containment included), else boundary facet
    distance."""
    from .predicates import evaluate_predicate

    if a.is_empty or b.is_empty:
        return math.inf
    if evaluate_predicate("intersects", a, b):
        return 0.0
    return IndexedFacetDistance(a).distance(b)
