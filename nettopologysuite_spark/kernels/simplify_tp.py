"""Topology-preserving and Visvalingam-Whyatt simplification.

- ``simplify_tp``: TopologyPreservingSimplifier semantics
  (``Simplify/TopologyPreservingSimplifier.cs:54``,
  ``TaggedLineStringSimplifier.cs:1-345``, ``ComponentJumpChecker.cs``):
  Douglas-Peucker sectioning where a section may only flatten if the
  candidate segment introduces no interior intersection with any other
  input/output segment, does not jump across another component, and leaves
  rings with ≥ 4 points; ring endpoints get the flat-endpoint pass.
- ``simplify_vw``: VWSimplifier semantics (``Simplify/VWSimplifier.cs:37``,
  ``VWLineSimplifier.cs``): repeated min-effective-area vertex removal with
  area tolerance = distance².
"""

from __future__ import annotations

import math

import numpy as np

from .geom import LINESTRING, POINT, POLYGON, Geom


# ---------------------------------------------------------------------------
# Visvalingam-Whyatt
# ---------------------------------------------------------------------------

def _vw_line(pts: np.ndarray, area_tol: float) -> np.ndarray:
    n = len(pts)
    if n < 3:
        return pts

    def tri_area(a, b, c):
        return abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])) / 2.0

    alive = np.ones(n, dtype=bool)
    import heapq

    heap = []
    areas = {}
    for i in range(1, n - 1):
        a = tri_area(pts[i - 1], pts[i], pts[i + 1])
        areas[i] = a
        heapq.heappush(heap, (a, i))

    def nbr(i, step):
        j = i + step
        while 0 < j < n - 1 and not alive[j]:
            j += step
        return j

    while heap:
        a, i = heapq.heappop(heap)
        if not alive[i] or areas.get(i) != a:
            continue  # stale entry
        if a > area_tol:
            break
        alive[i] = False
        prev = nbr(i, -1)
        nxt = nbr(i, +1)
        if prev > 0 and alive[prev]:
            p2 = nbr(prev, -1)
            na = tri_area(pts[p2], pts[prev], pts[nxt])
            areas[prev] = na
            heapq.heappush(heap, (na, prev))
        if nxt < n - 1 and alive[nxt]:
            n2 = nbr(nxt, +1)
            na = tri_area(pts[prev], pts[nxt], pts[n2])
            areas[nxt] = na
            heapq.heappush(heap, (na, nxt))
    out = pts[alive]
    # never return a single point (VWLineSimplifier end special-case)
    if len(out) == 1:
        out = np.vstack([out, out])
    return out


def simplify_vw(g: Geom, dist_tol: float) -> Geom:
    """Visvalingam-Whyatt simplification (area tolerance = dist_tol²)."""
    from .overlay import build_geometry

    area_tol = dist_tol * dist_tol

    def do(leaf: Geom) -> Geom | None:
        if leaf.gtype == POINT:
            return leaf
        if leaf.gtype == LINESTRING:
            if leaf.coords is None or len(leaf.coords) == 0:
                return None
            return Geom(LINESTRING, coords=_vw_line(leaf.coords, area_tol))
        if leaf.gtype == POLYGON:
            rings = []
            for ri, r in enumerate(leaf.rings):
                rr = _vw_line(r, area_tol)
                if len(rr) >= 4:
                    rings.append(rr)
                elif ri == 0:
                    return None  # shell collapsed
            return Geom(POLYGON, rings=rings) if rings else None
        return None

    parts = [p for p in (do(l) for l in g.flatten()) if p is not None and not p.is_empty]
    return build_geometry(parts, g.dimension())


# ---------------------------------------------------------------------------
# topology-preserving (tagged-line) simplifier
# ---------------------------------------------------------------------------

class _TaggedLine:
    __slots__ = ("pts", "is_ring", "min_size", "result", "alive", "kind", "slot")

    def __init__(self, pts: np.ndarray, is_ring: bool, kind, slot):
        self.pts = pts
        self.is_ring = is_ring
        self.min_size = 4 if is_ring or (len(pts) > 1 and (pts[0] == pts[-1]).all()) else 2
        self.result: list[tuple[tuple, tuple]] = []  # list of (p0, p1) segments
        self.alive = [True] * (len(pts) - 1)  # input segments still indexed
        self.kind = kind  # ('line', leaf_idx) | ('ring', leaf_idx, ring_idx)
        self.slot = slot

    def component_point(self):
        return (float(self.pts[1, 0]), float(self.pts[1, 1]))

    def result_size(self) -> int:
        return len(self.result) + 1


def _seg_dist(p, a, b) -> float:
    vx, vy = b[0] - a[0], b[1] - a[1]
    ll = vx * vx + vy * vy
    if ll == 0.0:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = max(0.0, min(1.0, ((p[0] - a[0]) * vx + (p[1] - a[1]) * vy) / ll))
    return math.hypot(p[0] - (a[0] + t * vx), p[1] - (a[1] + t * vy))


def _has_interior_intersection(s0, s1) -> bool:
    """HasInvalidIntersection: equal segments, or an intersection point/
    overlap interior to either segment."""
    from .overlay import _seg_intersection

    if (s0 == s1) or (s0 == (s1[1], s1[0])):
        return True
    kind, payload = _seg_intersection(s0[0], s0[1], s1[0], s1[1])
    if kind == "none":
        return False
    if kind == "overlap":
        (t0, p0), (t1, p1) = payload
        return p0 != p1  # 1-dim overlap always has interior points
    pt, _t = payload
    interior0 = pt != s0[0] and pt != s0[1]
    interior1 = pt != s1[0] and pt != s1[1]
    return interior0 or interior1


def _crossings(pt, segs) -> int:
    """Parity of rightward-ray crossings (RayCrossingCounter analog)."""
    cnt = 0
    px, py = pt
    for (x1, y1), (x2, y2) in segs:
        if (y1 > py) != (y2 > py):
            xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if xi > px:
                cnt += 1
    return cnt


class _TPSimplifier:
    def __init__(self, lines: list[_TaggedLine], tol: float):
        self.lines = lines
        self.tol = tol
        self.output: list[tuple] = []  # flattened segments across all lines

    # -- index queries ----------------------------------------------------
    def _input_segments(self, exclude_line=None, exclude_range=None):
        for ln in self.lines:
            for i, ok in enumerate(ln.alive):
                if not ok:
                    continue
                if exclude_line is ln and exclude_range is not None:
                    lo, hi = exclude_range
                    if lo <= hi:
                        if lo <= i < hi:
                            continue
                    elif i >= lo or i <= hi:  # wrapped ring section
                        continue
                yield (
                    (float(ln.pts[i, 0]), float(ln.pts[i, 1])),
                    (float(ln.pts[i + 1, 0]), float(ln.pts[i + 1, 1])),
                )

    def _topology_valid(self, line, i, j, cand) -> bool:
        for seg in self.output:
            if _has_interior_intersection(seg, cand):
                return False
        for seg in self._input_segments(exclude_line=line, exclude_range=(i, j)):
            if _has_interior_intersection(seg, cand):
                return False
        return not self._has_jump(line, i, j, cand)

    def _has_jump(self, line, i, j, cand) -> bool:
        # ComponentJumpChecker: flattening must not move another component's
        # test point across the line (parity of ray crossings changes)
        sec = [
            ((float(line.pts[k, 0]), float(line.pts[k, 1])),
             (float(line.pts[k + 1, 0]), float(line.pts[k + 1, 1])))
            for k in range(i, j)
        ]
        xs = [p[0] for s in sec for p in s]
        ys = [p[1] for s in sec for p in s]
        env = (min(xs), min(ys), max(xs), max(ys))
        for comp in self.lines:
            if comp is line:
                continue
            cp = comp.component_point()
            if not (env[0] <= cp[0] <= env[2] and env[1] <= cp[1] <= env[3]):
                continue
            if _crossings(cp, sec) % 2 != _crossings(cp, [cand]) % 2:
                return True
        return False

    # -- main recursion ----------------------------------------------------
    def simplify_line(self, line: _TaggedLine):
        self._simplify_section(line, 0, len(line.pts) - 1, 0)
        if line.is_ring and (line.pts[0] == line.pts[-1]).all():
            self._simplify_ring_endpoint(line)

    def _simplify_section(self, line, i, j, depth):
        depth += 1
        if i + 1 == j:
            line.result.append((
                (float(line.pts[i, 0]), float(line.pts[i, 1])),
                (float(line.pts[i + 1, 0]), float(line.pts[i + 1, 1])),
            ))
            return
        valid = True
        if line.result_size() < line.min_size and depth + 1 < line.min_size:
            valid = False
        # furthest point
        a = (float(line.pts[i, 0]), float(line.pts[i, 1]))
        b = (float(line.pts[j, 0]), float(line.pts[j, 1]))
        max_d, max_k = -1.0, i
        for k in range(i + 1, j):
            d = _seg_dist((float(line.pts[k, 0]), float(line.pts[k, 1])), a, b)
            if d > max_d:
                max_d, max_k = d, k
        if max_d > self.tol:
            valid = False
        if valid:
            cand = (a, b)
            valid = self._topology_valid(line, i, j, cand)
        if valid:
            # flatten: remove input segs of the section, add to output
            for k in range(i, j):
                line.alive[k] = False
            self.output.append((a, b))
            line.result.append((a, b))
            return
        self._simplify_section(line, i, max_k, depth)
        self._simplify_section(line, max_k, j, depth)

    def _simplify_ring_endpoint(self, line):
        from .orientation import orient_index

        if line.result_size() <= line.min_size:
            return
        first = line.result[0]
        last = line.result[-1]
        simp = (last[0], first[1])
        end_pt = first[0]
        if _seg_dist(end_pt, simp[0], simp[1]) > self.tol:
            return
        # collinear shortcut: already flat → valid, but nothing to gain
        if orient_index(simp[0][0], simp[0][1], simp[1][0], simp[1][1],
                        end_pt[0], end_pt[1]) == 0:
            ok = True
        else:
            ok = True
            for seg in self.output:
                if seg in (first, last):
                    continue
                if _has_interior_intersection(seg, simp):
                    ok = False
                    break
            if ok:
                for seg in self._input_segments():
                    if seg in (first, last):
                        continue
                    if _has_interior_intersection(seg, simp):
                        ok = False
                        break
            if ok:
                # jump check over the two replaced segments
                sec = [first, last]
                xs = [p[0] for s in sec for p in s]
                ys = [p[1] for s in sec for p in s]
                env = (min(xs), min(ys), max(xs), max(ys))
                for comp in self.lines:
                    if comp is line:
                        continue
                    cp = comp.component_point()
                    if not (env[0] <= cp[0] <= env[2] and env[1] <= cp[1] <= env[3]):
                        continue
                    if _crossings(cp, sec) % 2 != _crossings(cp, [simp]) % 2:
                        ok = False
                        break
        if not ok:
            return
        line.result = line.result[1:-1] + [simp]
        if (simp[0] != simp[1]):
            self.output.append(simp)


def _result_coords(line: _TaggedLine) -> np.ndarray:
    pts = [line.result[0][0]]
    pts.extend(seg[1] for seg in line.result)
    arr = np.array(pts, dtype=np.float64)
    if line.is_ring and (arr[0] != arr[-1]).any():
        arr = np.vstack([arr, arr[:1]])
    return arr


def simplify_tp(g: Geom, tol: float) -> Geom:
    """TopologyPreservingSimplifier.Simplify(g, tol)."""
    from .overlay import build_geometry

    if g.is_empty:
        return g
    lines: list[_TaggedLine] = []
    leaves = list(g.flatten())
    for li, leaf in enumerate(leaves):
        if leaf.gtype == LINESTRING and leaf.coords is not None and len(leaf.coords) >= 2:
            closed = (leaf.coords[0] == leaf.coords[-1]).all()
            lines.append(_TaggedLine(leaf.coords, bool(closed), ("line", li), len(lines)))
        elif leaf.gtype == POLYGON:
            for ri, r in enumerate(leaf.rings):
                lines.append(_TaggedLine(r, True, ("ring", li, ri), len(lines)))
    sim = _TPSimplifier(lines, tol)
    for ln in lines:
        sim.simplify_line(ln)
    by_key = {ln.kind: ln for ln in lines}
    leaf_idx = {id(leaf): li for li, leaf in enumerate(leaves)}

    def rebuild(node: Geom) -> Geom | None:
        """GeometryTransformer analog: container structure preserved, empty
        parts dropped."""
        if node.gtype == POINT:
            return node if not node.is_empty else None
        if node.gtype == LINESTRING:
            ln = by_key.get(("line", leaf_idx.get(id(node), -1)))
            if ln is None:
                return node if not node.is_empty else None
            return Geom(LINESTRING, coords=_result_coords(ln))
        if node.gtype == POLYGON:
            li = leaf_idx.get(id(node), -1)
            rings = []
            for ri in range(len(node.rings)):
                ln = by_key.get(("ring", li, ri))
                if ln is None:
                    continue
                rr = _result_coords(ln)
                if len(rr) >= 4:
                    rings.append(rr)
                elif ri == 0:
                    return None
            return Geom(POLYGON, rings=rings) if rings else None
        kids = [rebuild(p) for p in node.parts]
        kids = [k for k in kids if k is not None and not k.is_empty]
        if not kids:
            return None
        return Geom(node.gtype, parts=kids)

    out = rebuild(g)
    if out is None:
        dims = {2: 2, 1: 1, 0: 0}
        return build_geometry([], dims.get(g.dimension(), -1))
    return out
