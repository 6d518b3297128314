"""Coverage operations: boundary-chain union and coverage validation.

``coverage_union`` (Coverage/CoverageUnion.cs → Operation/OverlayNG/
CoverageUnion.cs): for a valid polygonal coverage (polygons share edges
exactly, no overlaps), union = drop every edge that appears twice (the
shared inner boundaries) and re-assemble the remaining rings — no noding,
no precision loss, linear time. This is the tile-mosaic fast path for the
zonal/tiling layer.

``validate_coverage`` (Coverage/CoverageValidator.cs essence): a coverage is
invalid where two polygons' boundaries cross properly or overlap partially
(shared edges must match exactly vertex-to-vertex).
"""

from __future__ import annotations

import numpy as np

from .geom import POLYGON, Geom
from .orientation import is_ccw


def _directed_ring_edges(g: Geom):
    """Directed edges of all rings, canonical orientation (shell CCW, holes
    CW — interior on the left)."""
    for leaf in g.flatten():
        if leaf.gtype != POLYGON:
            continue
        for ri, r in enumerate(leaf.rings):
            rr = r
            ccw = is_ccw(rr)
            want_ccw = ri == 0
            if ccw != want_ccw:
                rr = rr[::-1].copy()
            for i in range(len(rr) - 1):
                u = (float(rr[i, 0]), float(rr[i, 1]))
                v = (float(rr[i + 1, 0]), float(rr[i + 1, 1]))
                if u != v:
                    yield (u, v)


def coverage_union(polys: list[Geom]) -> Geom:
    """Union of an edge-matched polygonal coverage by shared-edge removal."""
    from .overlay import _assemble_rings, _rings_to_polygons, build_geometry

    count: dict[tuple, int] = {}
    for g in polys:
        for u, v in _directed_ring_edges(g):
            key = (u, v) if u <= v else (v, u)
            # store the direction of first occurrence with the count
            if key in count:
                count[key] += 1
            else:
                count[key] = 1
    directed = []
    seen: dict[tuple, tuple] = {}
    for g in polys:
        for u, v in _directed_ring_edges(g):
            key = (u, v) if u <= v else (v, u)
            if count[key] == 1:
                directed.append((u, v))
            # edges appearing exactly twice are interior — dropped
    rings = _assemble_rings(directed)
    return build_geometry(_rings_to_polygons(rings), 2)


def find_gaps(polys: list[Geom], gap_width: float) -> Geom:
    """Narrow gaps in a polygonal coverage (Coverage/CoverageGapFinder.cs):
    holes of the coverage union whose maximum-inscribed-circle diameter is at
    most ``gap_width``, returned as their boundary lines."""
    from .construct import maximum_inscribed_circle
    from .geom import LINESTRING
    from .overlay import build_geometry

    union = coverage_union(polys)
    gaps = []
    for leaf in union.flatten():
        if leaf.gtype != POLYGON or len(leaf.rings) < 2:
            continue
        for h in leaf.rings[1:]:
            hole_poly = Geom(POLYGON, rings=[h])
            _x, _y, r = maximum_inscribed_circle(hole_poly, gap_width / 100.0 + 1e-9)
            if 2 * r <= gap_width:
                gaps.append(Geom(LINESTRING, coords=h.copy()))
    return build_geometry(gaps, 1)


def validate_coverage(polys: list[Geom]) -> list[int]:
    """Indices of polygons that violate the coverage condition against some
    neighbor: boundaries that intersect anywhere other than along exactly-
    matching edges/vertices."""
    from .predicates import evaluate_predicate

    edge_sets = []
    vert_sets = []
    for g in polys:
        edges = set()
        verts = set()
        for u, v in _directed_ring_edges(g):
            edges.add((u, v) if u <= v else (v, u))
            verts.add(u)
            verts.add(v)
        edge_sets.append(edges)
        vert_sets.append(verts)
    envs = [np.asarray(g.envelope()) for g in polys]
    bad: set[int] = set()
    n = len(polys)
    for i in range(n):
        for j in range(i + 1, n):
            ei, ej = envs[i], envs[j]
            if ei[0] > ej[2] or ej[0] > ei[2] or ei[1] > ej[3] or ej[1] > ei[3]:
                continue
            if not evaluate_predicate("intersects", polys[i], polys[j]):
                continue
            # allowed: interiors disjoint AND the shared boundary is made of
            # matching edges/vertices only
            if evaluate_predicate("overlaps", polys[i], polys[j]):
                bad.add(i)
                bad.add(j)
                continue
            # touching: every boundary intersection must be a shared vertex
            # or a shared full edge — approximate via relate 'touches' plus
            # edge matching of the contact zone
            shared_edges = edge_sets[i] & edge_sets[j]
            if shared_edges:
                continue  # edge-matched contact
            contact_ok = bool(vert_sets[i] & vert_sets[j])
            if not contact_ok:
                bad.add(i)
                bad.add(j)
    return sorted(bad)
