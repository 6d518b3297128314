"""Coverage simplification (Coverage/CoverageSimplifier.cs semantics).

The coverage decomposes into unique EDGES (maximal ring runs split at nodes
— vertices whose incident segment set differs from a plain degree-2 chain);
shared edges exist once, so simplifying an edge updates every polygon that
uses it and edge-matching is preserved by construction. Vertex removal is
global Visvalingam-Whyatt (smallest effective area first, area ≤ tol²) with
a ring-collapse guard: a removal that would leave any parent ring with
fewer than 3 distinct vertices is blocked (TPVWSimplifier behavior).
"""

from __future__ import annotations

import heapq

import numpy as np

from .geom import MULTIPOLYGON, POLYGON, Geom


def _tri_area(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2.0


class _Edge:
    __slots__ = ("pts", "closed", "alive", "rings")

    def __init__(self, pts: list[tuple], closed: bool):
        self.pts = pts  # closed edges: WITHOUT the closing duplicate
        self.closed = closed
        self.alive = [True] * len(pts)
        self.rings: list[tuple[int, int]] = []  # (poly_idx, ring_idx) users

    def n_alive(self) -> int:
        return sum(self.alive)

    def neighbors(self, i: int) -> tuple[int, int] | None:
        n = len(self.pts)
        if self.closed:
            j = (i - 1) % n
            while not self.alive[j]:
                j = (j - 1) % n
            k = (i + 1) % n
            while not self.alive[k]:
                k = (k + 1) % n
            if j == i or k == i:
                return None
            return j, k
        j = i - 1
        while j >= 0 and not self.alive[j]:
            j -= 1
        k = i + 1
        while k < n and not self.alive[k]:
            k += 1
        if j < 0 or k >= n:
            return None
        return j, k

    def result(self) -> list[tuple]:
        return [p for p, ok in zip(self.pts, self.alive) if ok]


def _dedupe(seq: list[tuple]) -> list[tuple]:
    out = [seq[0]]
    for p in seq[1:]:
        if p != out[-1]:
            out.append(p)
    return out


def coverage_simplify(polys: list[Geom], tol: float) -> list[Geom]:
    """Simplify a polygonal coverage consistently (one result per input)."""
    tol2 = tol * tol
    # ---- collect ring vertex sequences -----------------------------------
    rings: list[tuple[int, int, list[tuple]]] = []  # (poly_idx, ring_idx, verts)
    structure: list[list[int]] = []  # per input: leaf count (for rebuild)
    leaf_rings: dict[tuple[int, int], list[list[tuple]]] = {}
    for pi, g in enumerate(polys):
        leaves = [l for l in g.flatten() if l.gtype == POLYGON]
        structure.append([len(l.rings) for l in leaves])
        ridx = 0
        for leaf in leaves:
            for r in leaf.rings:
                verts = _dedupe([(float(x), float(y)) for x, y in r])
                if len(verts) > 1 and verts[0] == verts[-1]:
                    verts = verts[:-1]
                rings.append((pi, ridx, verts))
                ridx += 1
    # ---- segment ownership / node detection ------------------------------
    seg_owners: dict[tuple, set] = {}
    vert_segs: dict[tuple, set] = {}
    for pi, ri, verts in rings:
        n = len(verts)
        if n < 2:
            continue
        for i in range(n):
            a, b = verts[i], verts[(i + 1) % n]
            if a == b:
                continue
            key = (a, b) if a < b else (b, a)
            seg_owners.setdefault(key, set()).add(pi)
            vert_segs.setdefault(a, set()).add(key)
            vert_segs.setdefault(b, set()).add(key)

    def is_node(v: tuple) -> bool:
        segs = vert_segs.get(v, set())
        if len(segs) != 2:
            return True
        s1, s2 = sorted(segs)
        return seg_owners[s1] != seg_owners[s2]

    # ---- split rings into edges, dedup shared edges -----------------------
    edges: dict[tuple, _Edge] = {}
    ring_paths: dict[tuple[int, int], list[tuple[tuple, bool]]] = {}

    def canon_open(path: list[tuple]) -> tuple[tuple, bool]:
        rev = list(reversed(path))
        if tuple(rev) < tuple(path):
            return tuple(rev), True
        return tuple(path), False

    def canon_closed(verts: list[tuple]) -> tuple[tuple, bool, int]:
        n = len(verts)
        mi = min(range(n), key=lambda i: verts[i])
        fwd = [verts[(mi + i) % n] for i in range(n)]
        bwd = [verts[(mi - i) % n] for i in range(n)]
        if tuple(bwd) < tuple(fwd):
            return tuple(bwd), True, mi
        return tuple(fwd), False, mi

    for pi, ri, verts in rings:
        n = len(verts)
        if n < 3:
            ring_paths[(pi, ri)] = [("DEGENERATE", verts)]  # passthrough
            continue
        node_idx = [i for i, v in enumerate(verts) if is_node(v)]
        path: list[tuple[tuple, bool]] = []
        if not node_idx:
            key, rev, _mi = canon_closed(verts)
            e = edges.get(key)
            if e is None:
                e = _Edge(list(key), closed=True)
                edges[key] = e
            e.rings.append((pi, ri))
            path.append((key, rev))
        else:
            k0 = node_idx[0]
            order = node_idx + [node_idx[0] + n]
            for a, b in zip(order, order[1:]):
                seg = [verts[i % n] for i in range(a, b + 1)]
                key, rev = canon_open(seg)
                e = edges.get(key)
                if e is None:
                    e = _Edge(list(key), closed=False)
                    edges[key] = e
                e.rings.append((pi, ri))
                path.append((key, rev))
        ring_paths[(pi, ri)] = path

    # ---- ring vertex budgets ----------------------------------------------
    ring_count: dict[tuple[int, int], int] = {}
    for (pi, ri), path in ring_paths.items():
        if path and path[0][0] == "DEGENERATE":
            continue
        total = 0
        for key, _rev in path:
            e = edges[key]
            total += e.n_alive() if e.closed else e.n_alive() - 1
        ring_count[(pi, ri)] = total

    # ---- global VW removal ------------------------------------------------
    heap: list[tuple[float, int, tuple, int]] = []
    tie = 0

    def push(key: tuple, e: _Edge, i: int):
        nonlocal tie
        nb = e.neighbors(i)
        if nb is None:
            return
        j, k = nb
        a = _tri_area(e.pts[j], e.pts[i], e.pts[k])
        tie += 1
        heapq.heappush(heap, (a, tie, key, i))

    for key, e in edges.items():
        rng = range(len(e.pts)) if e.closed else range(1, len(e.pts) - 1)
        for i in rng:
            push(key, e, i)
    while heap:
        a, _t, key, i = heapq.heappop(heap)
        if a > tol2:
            break
        e = edges[key]
        if not e.alive[i]:
            continue
        nb = e.neighbors(i)
        if nb is None:
            continue
        j, k = nb
        cur = _tri_area(e.pts[j], e.pts[i], e.pts[k])
        if cur != a:
            continue  # stale entry
        # ring-collapse guard
        if any(ring_count[r] - 1 < 3 for r in e.rings if r in ring_count):
            continue
        e.alive[i] = False
        for r in e.rings:
            if r in ring_count:
                ring_count[r] -= 1
        for nidx in (j, k):
            if e.closed or (0 < nidx < len(e.pts) - 1):
                push(key, e, nidx)

    # ---- rebuild ------------------------------------------------------------
    out: list[Geom] = []
    ring_cursor = 0
    flat_results: dict[tuple[int, int], np.ndarray] = {}
    for pi, ri, verts in rings:
        path = ring_paths[(pi, ri)]
        if path and path[0][0] == "DEGENERATE":
            seq = list(path[0][1])
            seq.append(seq[0])
            flat_results[(pi, ri)] = np.array(seq, dtype=np.float64)
            continue
        coords: list[tuple] = []
        for key, rev in path:
            e = edges[key]
            pts = e.result()
            if e.closed:
                # restore this ring's own starting vertex and direction
                start = verts[0]
                if start not in pts:
                    # original start was simplified away; keep canonical
                    seq = pts
                else:
                    si = pts.index(start)
                    seq = pts[si:] + pts[:si]
                # match the original ring's travel direction at the start
                orig_second = verts[1]
                if len(seq) > 1 and seq[1] != orig_second and seq[-1] == orig_second:
                    seq = [seq[0]] + list(reversed(seq[1:]))
                coords = list(seq)
            else:
                seq = list(reversed(pts)) if rev else list(pts)
                if coords:
                    coords.extend(seq[1:])
                else:
                    coords.extend(seq)
        if coords[0] != coords[-1]:
            coords.append(coords[0])
        flat_results[(pi, ri)] = np.array(coords, dtype=np.float64)
    for pi, g in enumerate(polys):
        nleaves = structure[pi]
        parts = []
        ridx = 0
        for ring_n in nleaves:
            leaf_rings2 = []
            for _ in range(ring_n):
                leaf_rings2.append(flat_results[(pi, ridx)])
                ridx += 1
            parts.append(Geom(POLYGON, rings=leaf_rings2))
        if len(parts) == 1:
            out.append(parts[0])
        else:
            out.append(Geom(MULTIPOLYGON, parts=parts))
    return out
