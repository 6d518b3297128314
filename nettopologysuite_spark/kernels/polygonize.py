"""Polygonizer (Operation/Polygonize/Polygonizer.cs semantics): form
polygons from fully-noded linework — minimal CCW faces become shells,
directly-nested faces become holes of their smallest container while also
remaining polygons in their own right (nested-shell output)."""

from __future__ import annotations

import numpy as np

from .buffer import _ChainShim
from .geom import GEOMETRYCOLLECTION, LINESTRING, POLYGON, Geom
from .measures import _ring_signed_area2
from .orientation import is_ccw
from .overlay import _assemble_rings, _node_chains
from .pip import EXTERIOR, INTERIOR, PreparedPolygon


def polygonize(g: Geom) -> list[Geom]:
    chains = [
        l.coords for l in g.flatten() if l.gtype == LINESTRING and len(l.coords) >= 2
    ]
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            chains.extend(leaf.rings)
    if not chains:
        return []
    # Polygonizer assumes PRE-noded linework: edges connect only at exact
    # shared vertices; dangling edges (reachable from a degree-1 vertex)
    # are pruned iteratively before ring formation
    edges = set()
    for c in chains:
        for i in range(len(c) - 1):
            u = (float(c[i, 0]), float(c[i, 1]))
            v = (float(c[i + 1, 0]), float(c[i + 1, 1]))
            if u != v:
                edges.add((u, v) if u <= v else (v, u))
    while True:
        from collections import Counter

        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        dangles = {e for e in edges if deg[e[0]] == 1 or deg[e[1]] == 1}
        if not dangles:
            break
        edges -= dangles
    directed = []
    for u, v in edges:
        directed.append((u, v))
        directed.append((v, u))
    faces = [f for f in _assemble_rings(directed) if is_ccw(f)]
    faces.sort(key=lambda f: -abs(_ring_signed_area2(f)))
    preps = [PreparedPolygon(Geom(POLYGON, rings=[f])) for f in faces]
    polys: list[Geom] = []
    for i, f in enumerate(faces):
        # holes: faces directly nested inside f (their smallest container is f)
        holes = []
        for j, h in enumerate(faces):
            if i == j:
                continue
            # h inside f?
            loc = preps[i].locate(h[:-1, 0], h[:-1, 1])
            if not ((loc == INTERIOR).any() and not (loc == EXTERIOR).any()):
                continue
            # and f is the SMALLEST such container
            direct = True
            for k in range(len(faces)):
                if k in (i, j):
                    continue
                if abs(_ring_signed_area2(faces[k])) >= abs(_ring_signed_area2(f)):
                    continue
                lk = preps[k].locate(h[:-1, 0], h[:-1, 1])
                if (lk == INTERIOR).any() and not (lk == EXTERIOR).any():
                    direct = False
                    break
            if direct:
                holes.append(h)
        polys.append(Geom(POLYGON, rings=[f] + holes))
    return polys
