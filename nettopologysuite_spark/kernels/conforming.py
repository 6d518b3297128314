"""Conforming Delaunay triangulation: sites + linear constraints, with
Steiner points inserted until every constraint segment satisfies the
Gabriel condition (its diametral circle is empty) and is therefore a
Delaunay edge of the final triangulation.

Mirrors ``Triangulate/ConformingDelaunayTriangulator.cs`` (EnforceConstraints
:310-335, EnforceGabriel :359-437, FindNonGabrielPoint :452-490) with the
``NonEncroachingSplitPointFinder`` strategy (projection of the encroaching
point clamped by the non-encroachment diameter × 0.8 safety factor and the
segment midpoint — NonEncroachingSplitPointFinder.cs:19-42,
SplitSegment.cs:80-103) and the ``ConformingDelaunayTriangulationBuilder``
surface (sites geometry + constraints geometry → edges / triangles).
"""

from __future__ import annotations

import math

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    POLYGON,
    Geom,
    linestring,
    multi,
    polygon,
)
from .triangulate import delaunay_triangulation

_MAX_SPLIT_ITERATION = 99


def _constraint_segments(g: Geom) -> list[tuple[tuple[float, float], tuple[float, float]]]:
    segs = []
    for leaf in g.flatten():
        chains = []
        if leaf.gtype == LINESTRING and leaf.coords is not None:
            chains.append(leaf.coords)
        elif leaf.gtype == POLYGON:
            chains.extend(leaf.rings)
        for c in chains:
            for i in range(len(c) - 1):
                segs.append(((float(c[i, 0]), float(c[i, 1])),
                             (float(c[i + 1, 0]), float(c[i + 1, 1]))))
    return segs


def _find_split_point(p, q, enc) -> tuple[float, float]:
    """NonEncroachingSplitPointFinder.FindSplitPoint + SplitSegment.SplitAt."""
    px, py = p
    qx, qy = q
    ex, ey = enc
    seg_len = math.hypot(qx - px, qy - py)
    if seg_len == 0.0:  # degenerate constraint: nothing to split
        return (px, py)
    mid_len = seg_len / 2.0
    # projection of the encroaching point onto the segment line
    dx, dy = qx - px, qy - py
    t = ((ex - px) * dx + (ey - py) * dy) / (dx * dx + dy * dy)
    projx, projy = px + t * dx, py + t * dy
    non_encroach_diam = math.hypot(projx - ex, projy - ey) * 2 * 0.8
    min_len = min(non_encroach_diam, mid_len)
    min_frac = min_len / seg_len
    if math.hypot(projx - px, projy - py) < min_len:
        return (px + min_frac * dx, py + min_frac * dy)
    if math.hypot(projx - qx, projy - qy) < min_len:
        # PointAlongReverse(min_frac)
        return (qx - min_frac * (qx - px), qy - min_frac * (qy - py))
    return (projx, projy)


def conforming_delaunay_points(
    sites: Geom, constraints: Geom | None
) -> tuple[np.ndarray, list]:
    """All triangulation points (sites + constraint vertices + Steiner
    splits) plus the final (fully-conformed) constraint subsegments."""
    # Insertion order matters for cocircular tie-breaking and must mirror
    # the reference: SORTED unique site coords minus constraint vertices
    # (DelaunayTriangulationBuilder.Unique:30-35 sorts), then constraint
    # vertices in sorted order (the builder's SortedDictionary), then
    # Steiner splits in discovery order.
    con_keys: list[tuple[float, float]] = []
    segments: list = []
    if constraints is not None and not constraints.is_empty:
        con_keys = sorted(
            {(float(c[0]), float(c[1])) for c in constraints.all_coords()}
        )
        segments = _constraint_segments(constraints)
    con_set = set(con_keys)
    site_keys = sorted(
        {(float(c[0]), float(c[1])) for c in sites.all_coords()} - con_set
    )
    pts_list: list[tuple[float, float]] = site_keys + con_keys
    seen: set[tuple[float, float]] = set(pts_list)

    def add(x: float, y: float):
        key = (float(x), float(y))
        if key not in seen:
            seen.add(key)
            pts_list.append(key)

    for _ in range(_MAX_SPLIT_ITERATION):
        splits = 0
        new_segments = []
        for seg in segments:
            p, q = seg
            midx, midy = (p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0
            seg_radius = math.hypot(p[0] - midx, p[1] - midy)
            # closest point strictly inside the diametral circle
            # (FindNonGabrielPoint: closest-to-midpoint heuristic)
            enc = None
            best = math.inf
            for (x, y) in pts_list:
                if (x, y) == p or (x, y) == q:
                    continue
                r = math.hypot(midx - x, midy - y)
                if r < seg_radius and r < best:
                    best = r
                    enc = (x, y)
            if enc is None:
                new_segments.append(seg)
                continue
            sp = _find_split_point(p, q, enc)
            add(sp[0], sp[1])
            new_segments.append((p, sp))
            new_segments.append((sp, q))
            splits += 1
        segments = new_segments
        if splits == 0:
            break
    else:
        raise RuntimeError("too many splitting iterations enforcing constraints")
    return np.array(pts_list, dtype=np.float64), segments


def conforming_delaunay_edges(sites: Geom, constraints: Geom | None) -> Geom:
    """MULTILINESTRING of the conforming Delaunay edge set
    (ConformingDelaunayTriangulationBuilder.GetEdges)."""
    pts, _ = conforming_delaunay_points(sites, constraints)
    tris = delaunay_triangulation(pts)
    edges = set()
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            edges.add((min(u, v), max(u, v)))
    parts = [
        linestring(np.array([pts[u], pts[v]])) for u, v in sorted(edges)
    ]
    return multi(MULTILINESTRING, parts)


def conforming_delaunay_triangles(sites: Geom, constraints: Geom | None) -> Geom:
    """GEOMETRYCOLLECTION of triangle polygons
    (ConformingDelaunayTriangulationBuilder.GetTriangles)."""
    pts, _ = conforming_delaunay_points(sites, constraints)
    tris = delaunay_triangulation(pts)
    parts = [
        polygon(np.array([pts[a], pts[b], pts[c], pts[a]]))
        for a, b, c in tris
    ]
    return multi(GEOMETRYCOLLECTION, parts)
