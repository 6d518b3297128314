"""Delaunay triangulation and Voronoi diagrams.

Delaunay: Bowyer-Watson incremental insertion with an exact-rational
in-circumcircle fallback (``Triangulate/DelaunayTriangulationBuilder.cs``
semantics over ``QuadEdge/``; the output triangle set is the unique Delaunay
triangulation for sites in general position, matching the reference's
fixtures). Voronoi: dual of the triangulation — each site's cell is built
from its triangles' circumcenters (far-frame sites bound the infinite
cells), clipped to the diagram envelope = site envelope expanded by its
diameter (``VoronoiDiagramBuilder.cs:94-95``).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

from .geom import GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING, POLYGON, Geom


def _in_circumcircle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """p strictly inside the circumcircle of CCW triangle (a, b, c)."""
    adx, ady = ax - px, ay - py
    bdx, bdy = bx - px, by - py
    cdx, cdy = cx - px, cy - py
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (adx * (bdy * cd - bd * cdy)
           - ady * (bdx * cd - bd * cdx)
           + ad * (bdx * cdy - bdy * cdx))
    # error-bounded filter; exact rational fallback near zero
    scale = (abs(adx) + abs(ady) + abs(bdx) + abs(bdy) + abs(cdx) + abs(cdy))
    if abs(det) > 1e-10 * max(scale, 1.0) ** 4:
        return det > 0
    fadx, fady = Fraction(ax) - Fraction(px), Fraction(ay) - Fraction(py)
    fbdx, fbdy = Fraction(bx) - Fraction(px), Fraction(by) - Fraction(py)
    fcdx, fcdy = Fraction(cx) - Fraction(px), Fraction(cy) - Fraction(py)
    fad = fadx * fadx + fady * fady
    fbd = fbdx * fbdx + fbdy * fbdy
    fcd = fcdx * fcdx + fcdy * fcdy
    fdet = (fadx * (fbdy * fcd - fbd * fcdy)
            - fady * (fbdx * fcd - fbd * fcdx)
            + fad * (fbdx * fcdy - fbdy * fcdx))
    return fdet > 0


def _orient(ax, ay, bx, by, cx, cy) -> float:
    from .orientation import orient_index

    return orient_index(ax, ay, bx, by, cx, cy)


def delaunay_triangulation(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Indices of Delaunay triangles (CCW) over unique input points
    (Bowyer-Watson with a far super-triangle)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    minx, miny = pts[:, 0].min(), pts[:, 1].min()
    maxx, maxy = pts[:, 0].max(), pts[:, 1].max()
    d = max(maxx - minx, maxy - miny, 1.0)
    cx, cy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    big = 64.0 * d
    # super-triangle vertices (indices n, n+1, n+2)
    sup = np.array([
        [cx - 2 * big, cy - big],
        [cx + 2 * big, cy - big],
        [cx, cy + 2 * big],
    ])
    P = np.vstack([pts, sup])
    tris: set[tuple[int, int, int]] = {(n, n + 1, n + 2)}

    def ccw(t):
        a, b, c = t
        if _orient(P[a, 0], P[a, 1], P[b, 0], P[b, 1], P[c, 0], P[c, 1]) > 0:
            return t
        return (t[0], t[2], t[1])

    for i in range(n):
        px, py = float(P[i, 0]), float(P[i, 1])
        bad = []
        for t in tris:
            a, b, c = t
            if _in_circumcircle(
                P[a, 0], P[a, 1], P[b, 0], P[b, 1], P[c, 0], P[c, 1], px, py
            ):
                bad.append(t)
        if not bad:
            # point on/outside all circumcircles (duplicates filtered before)
            continue
        # boundary of the cavity: edges appearing once among bad triangles
        edge_count: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                if key in edge_count:
                    edge_count.pop(key)
                else:
                    edge_count[key] = e
            tris.discard(t)
        for key, e in edge_count.items():
            u, v = e
            if u == i or v == i:
                continue
            tris.add(ccw((u, v, i)))
    # drop super-triangle incidents; sorted for deterministic downstream
    # tie-breaking (concave-hull erosion order)
    out = [tuple(int(v) for v in t) for t in tris if all(v < n for v in t)]
    return sorted(out)


def _unique_points(g: Geom) -> np.ndarray:
    pts = g.all_coords()
    uniq = sorted({(float(x), float(y)) for x, y in pts})
    return np.array(uniq, dtype=np.float64)


def delaunay_edges(g: Geom) -> Geom:
    """MULTILINESTRING of the unique Delaunay edges."""
    P = _unique_points(g)
    tris = delaunay_triangulation(P)
    edges = set()
    for a, b, c in tris:
        for e in ((a, b), (b, c), (c, a)):
            edges.add((min(e), max(e)))
    parts = [
        Geom(LINESTRING, coords=np.array([P[u], P[v]])) for u, v in sorted(edges)
    ]
    return Geom(MULTILINESTRING, parts=parts)


def delaunay_triangles(g: Geom) -> Geom:
    """GEOMETRYCOLLECTION of the Delaunay triangles (as polygons)."""
    P = _unique_points(g)
    tris = delaunay_triangulation(P)
    parts = []
    for a, b, c in sorted(tris):
        ring = np.array([P[a], P[b], P[c], P[a]])
        parts.append(Geom(POLYGON, rings=[ring]))
    return Geom(GEOMETRYCOLLECTION, parts=parts)


def _circumcenter(a, b, c) -> tuple[float, float]:
    d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
    ux = ((a[0] ** 2 + a[1] ** 2) * (b[1] - c[1])
          + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
          + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])) / d
    uy = ((a[0] ** 2 + a[1] ** 2) * (c[0] - b[0])
          + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
          + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])) / d
    return (ux, uy)


def voronoi_diagram(g: Geom, clip_env: tuple[float, float, float, float] | None = None) -> Geom:
    """GEOMETRYCOLLECTION of Voronoi cells of the sites, clipped to the
    diagram envelope (site envelope expanded by its diameter, or a caller-
    supplied clip envelope if larger)."""
    from .overlay import overlay

    P = _unique_points(g)
    if len(P) < 2:
        return Geom(GEOMETRYCOLLECTION, parts=[])
    minx, miny = P[:, 0].min(), P[:, 1].min()
    maxx, maxy = P[:, 0].max(), P[:, 1].max()
    diam = math.hypot(maxx - minx, maxy - miny)
    env = (minx - diam, miny - diam, maxx + diam, maxy + diam)
    if clip_env is not None:
        env = (
            min(env[0], clip_env[0]), min(env[1], clip_env[1]),
            max(env[2], clip_env[2]), max(env[3], clip_env[3]),
        )
    # far frame: 8 sites on a huge ring so every real cell is bounded
    cx, cy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    R = 128.0 * max(diam, 1.0)
    frame = np.array([
        (cx + R * math.cos(k * math.pi / 4), cy + R * math.sin(k * math.pi / 4))
        for k in range(8)
    ])
    allp = np.vstack([P, frame])
    tris = delaunay_triangulation(allp)
    n = len(P)
    # site → incident triangle circumcenters
    incident: dict[int, list[tuple[int, int, int]]] = {i: [] for i in range(n)}
    for t in tris:
        for v in t:
            if v < n:
                incident[v].append(t)
    clip_ring = np.array([
        (env[0], env[1]), (env[2], env[1]), (env[2], env[3]), (env[0], env[3]),
        (env[0], env[1]),
    ])
    clip_poly = Geom(POLYGON, rings=[clip_ring])
    cells = []
    for i in range(n):
        tlist = incident[i]
        if len(tlist) < 2:
            continue
        centers = [_circumcenter(allp[t[0]], allp[t[1]], allp[t[2]]) for t in tlist]
        # order circumcenters around the site by angle
        sx, sy = float(P[i, 0]), float(P[i, 1])
        centers.sort(key=lambda q: math.atan2(q[1] - sy, q[0] - sx))
        ring = np.array(centers + centers[:1])
        cell = Geom(POLYGON, rings=[ring])
        clipped = overlay(cell, clip_poly, "intersection")
        polys = [l for l in clipped.flatten() if l.gtype == POLYGON and l.rings]
        cells.extend(polys)
    return Geom(GEOMETRYCOLLECTION, parts=cells)
