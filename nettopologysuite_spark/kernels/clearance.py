"""MinimumClearance (Precision/MinimumClearance.cs semantics): the smallest
distance between a vertex and any non-incident vertex or segment — the
largest amount by which vertices can move before topology changes.
Returns (distance, (p, q)) with the realizing pair; (inf, None) when no
clearance exists (single point etc.)."""

from __future__ import annotations

import math

import numpy as np

from .geom import LINESTRING, POINT, POLYGON, Geom
from .measures import point_segment_dist2


def _vertices_and_segments(g: Geom):
    verts = []
    segs = []
    for leaf in g.flatten():
        if leaf.gtype == POINT and not leaf.is_empty:
            verts.append(leaf.coords[0])
        elif leaf.gtype == LINESTRING and len(leaf.coords):
            verts.extend(leaf.coords)
            segs.extend(
                (leaf.coords[i], leaf.coords[i + 1]) for i in range(len(leaf.coords) - 1)
            )
        elif leaf.gtype == POLYGON:
            for r in leaf.rings:
                verts.extend(r[:-1])
                segs.extend((r[i], r[i + 1]) for i in range(len(r) - 1))
    return np.array(verts) if verts else np.empty((0, 2)), segs


def minimum_clearance(g: Geom):
    verts, segs = _vertices_and_segments(g)
    best = math.inf
    best_pair = None
    n = len(verts)
    # vertex-vertex
    for i in range(n):
        d = np.hypot(verts[i + 1 :, 0] - verts[i, 0], verts[i + 1 :, 1] - verts[i, 1])
        nz = d > 0
        if nz.any():
            j = int(np.argmin(np.where(nz, d, np.inf)))
            if d[j] < best:
                best = float(d[j])
                best_pair = (tuple(verts[i]), tuple(verts[i + 1 + j]))
    # vertex-segment (non-incident)
    for p in verts:
        for s0, s1 in segs:
            if (p == s0).all() or (p == s1).all():
                continue
            d2 = float(point_segment_dist2(p[0], p[1], s0[0], s0[1], s1[0], s1[1]))
            d = math.sqrt(d2)
            if 0 < d < best:
                # closest point on segment
                dx, dy = s1[0] - s0[0], s1[1] - s0[1]
                ll = dx * dx + dy * dy
                t = ((p[0] - s0[0]) * dx + (p[1] - s0[1]) * dy) / ll if ll else 0.0
                t = min(max(t, 0.0), 1.0)
                q = (s0[0] + t * dx, s0[1] + t * dy)
                best = d
                best_pair = ((float(p[0]), float(p[1])), (float(q[0]), float(q[1])))
    return best, best_pair


def minimum_clearance_line(g: Geom) -> Geom:
    d, pair = minimum_clearance(g)
    if pair is None or not math.isfinite(d):
        return Geom(LINESTRING, coords=np.empty((0, 2)))
    return Geom(LINESTRING, coords=np.array([pair[0], pair[1]], dtype=np.float64))
