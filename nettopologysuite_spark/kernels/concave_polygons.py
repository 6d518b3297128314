"""ConcaveHullOfPolygons: concave hull of a set of polygons, respecting the
polygons as constraints (``Algorithm/Hull/ConcaveHullOfPolygons.cs:48-625``).

Pipeline (BuildHullTris :283-300):
1. a rectangular FRAME (envelope expanded by 4× its diameter) with the
   input shell rings as holes is triangulated — here realized as a
   constrained Delaunay triangulation over frame corners + shell vertices
   with frame and ring edges as constraints, dropping triangles whose
   centroid lies inside an input shell (equivalent domain, same CDT);
2. triangles at the four frame corners are removed, seeding the border
   queue with their inward neighbors (:340-370);
3. border triangles whose outer edge exceeds the target maximum edge
   length are eroded (queue closure, :395-411); with ``tight``, border
   triangles touching a single input polygon are always removed (:459-476);
   with ``holes_allowed``, interior over-long triangles seed hole erosion
   (:413-424);
4. the surviving triangles union with the input polygons (:568-589).

The ``ratio`` criterion maps to a length via the min/max non-constraint
edge lengths of the space triangulation (ComputeTargetEdgeLength :305-333).
"""

from __future__ import annotations

import math
from collections import deque

import numpy as np

from .geom import MULTIPOLYGON, POLYGON, Geom, polygon
from .pip import PreparedPolygon
from .tri_mesh import Tri, TriMesh, _next, constrained_delaunay
from .union_op import cascaded_union

FRAME_EXPAND_FACTOR = 4


def concave_hull_of_polygons(
    g: Geom,
    max_edge_length: float | None = None,
    length_ratio: float | None = None,
    tight: bool = False,
    holes_allowed: bool = False,
    fill: bool = False,
) -> Geom:
    if g.gtype not in (POLYGON, MULTIPOLYGON):
        raise ValueError("input must be polygonal")
    if (max_edge_length is None) == (length_ratio is None):
        raise ValueError("exactly one of max_edge_length / length_ratio required")
    if max_edge_length is not None and max_edge_length < 0:
        raise ValueError("edge length must be non-negative")
    if length_ratio is not None and not (0 <= length_ratio <= 1):
        raise ValueError("edge length ratio must be in [0, 1]")
    polys = [p for p in g.flatten() if p.gtype == POLYGON and not p.is_empty]
    if not polys:
        return Geom(POLYGON)
    if fill:
        tight = True

    shells = [p.rings[0] for p in polys]
    # ---- vertex table: 4 frame corners first, then shell vertices --------
    allc = np.concatenate([r[:-1] for r in shells])
    minx, miny = allc[:, 0].min(), allc[:, 1].min()
    maxx, maxy = allc[:, 0].max(), allc[:, 1].max()
    diam = math.hypot(maxx - minx, maxy - miny)
    ex = FRAME_EXPAND_FACTOR * diam
    corners = [
        (minx - ex, miny - ex), (maxx + ex, miny - ex),
        (maxx + ex, maxy + ex), (minx - ex, maxy + ex),
    ]
    coord_id: dict[tuple[float, float], int] = {}
    pts_list: list[tuple[float, float]] = []

    def vid(x: float, y: float) -> int:
        key = (float(x), float(y))
        i = coord_id.get(key)
        if i is None:
            i = len(pts_list)
            coord_id[key] = i
            pts_list.append(key)
        return i

    corner_ids = [vid(x, y) for x, y in corners]
    ring_vids: list[list[int]] = []
    vertex_rings: dict[int, set[int]] = {}
    constraints: set[frozenset[int]] = set()
    for k in range(4):
        constraints.add(frozenset((corner_ids[k], corner_ids[(k + 1) % 4])))
    for ri, r in enumerate(shells):
        ids = [vid(x, y) for x, y in r[:-1]]
        ring_vids.append(ids)
        for i_ in ids:
            vertex_rings.setdefault(i_, set()).add(ri)
        for k in range(len(ids)):
            constraints.add(frozenset((ids[k], ids[(k + 1) % len(ids)])))
    pts = np.array(pts_list, dtype=np.float64)

    mesh = constrained_delaunay(pts, constraints)

    # ---- restrict to the space between polygons --------------------------
    preps = [PreparedPolygon(polygon(r)) for r in shells]
    for t in mesh.live():
        cx = (pts[t.v[0], 0] + pts[t.v[1], 0] + pts[t.v[2], 0]) / 3.0
        cy = (pts[t.v[0], 1] + pts[t.v[1], 1] + pts[t.v[2], 1]) / 3.0
        if any(p.contains_points(np.array([cx]), np.array([cy]))[0] for p in preps):
            t.remove()

    corner_set = set(corner_ids)

    def is_frame_tri(t: Tri) -> bool:
        return any(v in corner_set for v in t.v)

    # ---- ratio → target length (ComputeTargetEdgeLength) -----------------
    max_len = max_edge_length
    if length_ratio is not None:
        if length_ratio == 0:
            max_len = 0.0
        else:
            lmax, lmin = -1.0, -1.0
            for t in mesh.live():
                if is_frame_tri(t):
                    continue
                for i in range(3):
                    if t.adj[i] is None or not t.adj[i].alive:
                        continue
                    ln = mesh.length(t, i)
                    if ln > lmax:
                        lmax = ln
                    if lmin < 0 or ln < lmin:
                        lmin = ln
            if length_ratio == 1:
                max_len = 2 * max(lmax, 0.0)
            else:
                max_len = length_ratio * (lmax - lmin) + lmin

    # ---- remove frame corner tris; seed border queue ----------------------
    hull_tris: set[int] = set()
    border_que: deque[Tri] = deque()
    border_edge: dict[int, set[int]] = {}  # id(tri) → exposed border edges
    tri_by_id: dict[int, Tri] = {}

    def add_border_tri(t: Tri, i: int):
        adj = t.adj[i]
        if adj is None or not adj.alive:
            return
        border_que.append(adj)
        # record EVERY exposed border edge (the reference keeps only the
        # last-assigned one — Dictionary overwrite, ConcaveHullOfPolygons.cs
        # :521 — which makes its erosion depend on internal iteration order;
        # checking all exposed edges yields the order-independent closure)
        border_edge.setdefault(id(adj), set()).add(adj.index_of_adjacent(t))
        tri_by_id[id(adj)] = adj

    for t in mesh.live():
        tri_by_id[id(t)] = t
        if is_frame_tri(t):
            ci = next(i for i in range(3) if t.v[i] in corner_set)
            opp = _next(ci)  # Tri.cs OppEdge
            adj = t.adj[opp]
            if adj is not None and adj.alive and not is_frame_tri(adj):
                add_border_tri(t, opp)
            t.remove()
        else:
            hull_tris.add(id(t))

    def is_border_tri(t: Tri) -> bool:
        return any(t.adj[i] is None or not t.adj[i].alive for i in range(3))

    def touches_single_polygon(t: Tri) -> bool:
        rs = None
        for v in t.v:
            r = vertex_rings.get(v)
            if not r:
                return False
            rs = r if rs is None else rs & r
            if not rs:
                return False
        return bool(rs)

    def is_removable(t: Tri) -> bool:
        if tight and touches_single_polygon(t):
            return True
        return any(
            mesh.length(t, bi) > max_len for bi in border_edge.get(id(t), ())
        )

    def remove_border_tri(t: Tri):
        t.remove()
        hull_tris.discard(id(t))
        border_edge.pop(id(t), None)

    def add_border_tris(t: Tri):
        for i in range(3):
            add_border_tri(t, i)

    def remove_border_tris():
        while border_que:
            t = border_que.popleft()
            if id(t) not in hull_tris:
                continue
            if is_removable(t):
                add_border_tris(t)
                remove_border_tri(t)

    remove_border_tris()

    if holes_allowed:
        def is_hole_seed(t: Tri) -> bool:
            if is_border_tri(t):
                return False
            return any(
                t.adj[i] is not None and t.adj[i].alive
                and mesh.length(t, i) > max_len
                for i in range(3)
            )

        while True:
            seed = next(
                (tri_by_id[h] for h in sorted(hull_tris,
                                              key=lambda h: tri_by_id[h].v)
                 if is_hole_seed(tri_by_id[h])),
                None,
            )
            if seed is None:
                break
            add_border_tris(seed)
            remove_border_tri(seed)
            remove_border_tris()

    # ---- assemble ---------------------------------------------------------
    tri_geoms = [
        polygon(np.array([pts[tri_by_id[h].v[0]], pts[tri_by_id[h].v[1]],
                          pts[tri_by_id[h].v[2]], pts[tri_by_id[h].v[0]]]))
        for h in sorted(hull_tris, key=lambda h: tri_by_id[h].v)
    ]
    if fill:
        return cascaded_union(tri_geoms) if tri_geoms else Geom(POLYGON)
    if not tri_geoms:
        return cascaded_union(polys) if len(polys) > 1 else polys[0]
    return cascaded_union(tri_geoms + polys)
