"""Offset-curve buffer (BufferOp / OffsetCurveBuilder semantics).

Pipeline mirrors the reference's BufferBuilder (``Operation/Buffer/
BufferBuilder.cs:87-121``): per input component generate a DIRECTED closed
offset curve (``OffsetCurveBuilder.cs`` / ``OffsetSegmentGenerator.cs``:
per-side offset segments, corner fillets / mitre / bevel joins, inside-turn
closing segments, end caps), node all curves together, then extract the
region of positive winding (the depth-labeling of ``BufferSubgraph`` /
``PolygonBuilder`` expressed as per-face winding numbers).

Style parameters follow ``BufferParameters.cs:20-222``: quadrant segments
(default 8, :28), end-cap round/flat/square, join round/mitre/bevel, mitre
limit (default 5, :42), input simplification factor (default 0.01, :49 —
``BufferInputLineSimplifier`` removes shallow concavities on the offset
side).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .geom import LINESTRING, POINT, POLYGON, Geom
from .orientation import is_ccw

CAP_ROUND = "round"
CAP_FLAT = "flat"
CAP_SQUARE = "square"
JOIN_ROUND = "round"
JOIN_MITRE = "mitre"
JOIN_BEVEL = "bevel"

# OffsetSegmentGenerator.cs:28,33,43 heuristics
_OFFSET_SEG_SEPARATION = 0.05
_INSIDE_TURN_SNAP = 1.0e-3
_CLOSING_SEG_FACTOR = 80


@dataclass(frozen=True)
class BufferParams:
    quad_segs: int = 8
    end_cap: str = CAP_ROUND
    join: str = JOIN_ROUND
    mitre_limit: float = 5.0
    simplify_factor: float = 0.01  # BufferParameters.cs:49 default


# ---------------------------------------------------------------------------
# input simplification (BufferInputLineSimplifier.cs)
# ---------------------------------------------------------------------------

def _simplify_for_side(pts: np.ndarray, tol: float, s: int, is_ring: bool) -> np.ndarray:
    """Remove shallow inside-turn vertices for offset side ``s``
    (+1 = right, -1 = left). Inside turns are cross(u0,u1)*s < 0; a vertex
    is deletable when it is within ``tol`` of the chord of its neighbors.
    End segments of open lines are never simplified."""
    if tol <= 0.0 or len(pts) < (4 if is_ring else 3):
        return pts
    # operate on the FULL array including the ring-closure duplicate, exactly
    # like the reference: windows never wrap the ring seam, so the seam
    # vertex is never deleted (BufferInputLineSimplifier.DeleteShallowConcavities)
    p = pts
    n = len(p)
    alive = np.ones(n, dtype=bool)

    def nxt(i: int) -> int:
        j = i + 1
        while j < n - 1 and not alive[j]:
            j += 1
        return j

    def shallow(i0: int, i1: int, i2: int) -> bool:
        a, b, q = p[i0], p[i2], p[i1]
        return _pt_seg_dist((q[0], q[1]), (a[0], a[1]), (b[0], b[1])) < tol

    def shallow_sampled(i0: int, i2: int) -> bool:
        # IsShallowSampled: every n'th ORIGINAL point of the skipped section
        # must stay within tol of the new chord — prevents incremental
        # deletion from drifting past the tolerance
        inc = max((i2 - i0) // 10, 1)
        for k in range(i0, i2, inc):
            if not shallow(i0, k, i2):
                return False
        return True

    def deletable(i0: int, i1: int, i2: int) -> bool:
        ux, uy = p[i1, 0] - p[i0, 0], p[i1, 1] - p[i0, 1]
        vx, vy = p[i2, 0] - p[i1, 0], p[i2, 1] - p[i1, 1]
        cross = ux * vy - uy * vx
        if cross * s >= 0.0:
            return False  # outside turn (or straight) — keep
        return shallow(i0, i1, i2) and shallow_sampled(i0, i2)

    changed = True
    while changed:
        changed = False
        index = 0 if is_ring else 1
        mid = nxt(index)
        last = nxt(mid)
        while last < n:
            deleted = False
            if deletable(index, mid, last):
                alive[mid] = False
                deleted = True
                changed = True
            index = last if deleted else mid
            mid = nxt(index)
            last = nxt(mid)
    out = p[alive]
    if is_ring and (out[0] != out[-1]).any():
        out = np.vstack([out, out[:1]])
    return out


# ---------------------------------------------------------------------------
# curve generation
# ---------------------------------------------------------------------------

def _fillet(center, a0: float, a1: float, direction: int, r: float,
            quad_segs: int) -> list[tuple[float, float]]:
    """Interior points of a circular fillet from angle a0 to a1 sweeping in
    ``direction`` (+1 CCW, -1 CW) — AddDirectedFillet semantics (even angle
    steps of at most pi/2/quad_segs)."""
    quantum = (math.pi / 2.0) / max(quad_segs, 1)
    if direction > 0:
        total = (a1 - a0) % (2 * math.pi)
    else:
        total = (a0 - a1) % (2 * math.pi)
    nseg = int(total / quantum + 0.5)
    if nseg < 1:
        return []
    inc = total / nseg * (1 if direction > 0 else -1)
    out = []
    for i in range(1, nseg):
        a = a0 + inc * i
        out.append((center[0] + r * math.cos(a), center[1] + r * math.sin(a)))
    return out


def _line_line_intersection(p1, p2, q1, q2):
    """Intersection of the infinite lines (None if parallel)."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    den = rx * sy - ry * sx
    if den == 0.0:
        return None
    t = ((q1[0] - p1[0]) * sy - (q1[1] - p1[1]) * sx) / den
    return (p1[0] + t * rx, p1[1] + t * ry)


def _seg_line_intersection(p1, p2, q1, q2):
    """Intersection of segment p with the infinite line q (None if outside)."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    den = rx * sy - ry * sx
    if den == 0.0:
        return None
    t = ((q1[0] - p1[0]) * sy - (q1[1] - p1[1]) * sx) / den
    if t < 0.0 or t > 1.0:
        return None
    return (p1[0] + t * rx, p1[1] + t * ry)


def _pt_seg_dist(q, a, b) -> float:
    vx, vy = b[0] - a[0], b[1] - a[1]
    ll = vx * vx + vy * vy
    if ll == 0.0:
        return math.hypot(q[0] - a[0], q[1] - a[1])
    t = max(0.0, min(1.0, ((q[0] - a[0]) * vx + (q[1] - a[1]) * vy) / ll))
    return math.hypot(q[0] - (a[0] + t * vx), q[1] - (a[1] + t * vy))


class _CurveWalker:
    """Accumulates one side's offset curve along a point sequence
    (OffsetSegmentGenerator analog). ``s``: +1 offset right, -1 left."""

    def __init__(self, d: float, s: int, params: BufferParams):
        self.d = d
        self.s = s
        self.p = params
        self.pts: list[tuple[float, float]] = []

    def add(self, pt):
        if not self.pts or self.pts[-1] != pt:
            self.pts.append((float(pt[0]), float(pt[1])))

    def _normal(self, p0, p1):
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]
        ll = math.hypot(dx, dy)
        return (self.s * dy / ll, -self.s * dx / ll)

    def _offset_seg(self, p0, p1):
        nx, ny = self._normal(p0, p1)
        d = self.d
        return ((p0[0] + nx * d, p0[1] + ny * d), (p1[0] + nx * d, p1[1] + ny * d))

    def _pop_if_last(self, pt):
        if self.pts and self.pts[-1] == pt:
            self.pts.pop()

    def walk(self, pts: np.ndarray, closed: bool):
        """Emit the offset of the polyline. Per vertex: segment-i's offset
        end (A) is added, then the join emits everything up to and including
        the next segment's offset start (B) when appropriate — the next
        iteration (or the epilogue) adds that segment's offset end."""
        n = len(pts) - 1  # segment count (pts closed ⇒ first == last)
        segs = [((float(pts[i, 0]), float(pts[i, 1])),
                 (float(pts[i + 1, 0]), float(pts[i + 1, 1]))) for i in range(n)]
        offs = [self._offset_seg(a, b) for a, b in segs]
        rng = range(n) if closed else range(n - 1)
        if not closed:
            self.add(offs[0][0])
        for i in rng:
            j = (i + 1) % n
            self.add(offs[i][1])
            self._join(segs[i], segs[j], offs[i], offs[j])
        if not closed:
            self.add(offs[-1][1])

    def _join(self, s0, s1, o0, o1):
        corner = s0[1]
        u0 = (s0[1][0] - s0[0][0], s0[1][1] - s0[0][1])
        u1 = (s1[1][0] - s1[0][0], s1[1][1] - s1[0][1])
        cross = u0[0] * u1[1] - u0[1] * u1[0]
        dot = u0[0] * u1[0] + u0[1] * u1[1]
        A, B = o0[1], o1[0]
        d = abs(self.d)
        if cross == 0.0:
            if dot >= 0.0:
                self.add(B)  # parallel same direction: offsets continue
                return
            # collinear reversal (AddCollinear): a 180° end-cap fillet. Sweep
            # direction follows the offset side: right-side curves cap CCW
            # (JTS's always-CW comment assumes its left-side generation).
            if self.p.join == JOIN_ROUND:
                a0 = math.atan2(A[1] - corner[1], A[0] - corner[0])
                a1 = math.atan2(B[1] - corner[1], B[0] - corner[0])
                for q in _fillet(corner, a0, a1, self.s, d, self.p.quad_segs):
                    self.add(q)
            self.add(B)
            return
        outside = cross * self.s > 0.0
        if outside:
            # near-parallel heuristic: single offset point, no join
            if math.hypot(A[0] - B[0], A[1] - B[1]) < d * _OFFSET_SEG_SEPARATION:
                len0 = math.hypot(*u0)
                len1 = math.hypot(*u1)
                self._pop_if_last(A)
                self.add(A if len0 > len1 else B)
                return
            if self.p.join == JOIN_MITRE:
                self._mitre(corner, o0, o1, A, B, d)
            elif self.p.join == JOIN_BEVEL:
                self.add(B)
            else:
                a0 = math.atan2(A[1] - corner[1], A[0] - corner[0])
                a1 = math.atan2(B[1] - corner[1], B[0] - corner[0])
                direction = 1 if cross > 0 else -1
                for q in _fillet(corner, a0, a1, direction, d, self.p.quad_segs):
                    self.add(q)
                self.add(B)
        else:
            # inside turn (AddInsideTurn): offsets cross — add the exact
            # intersection if it exists, else closing segments via the corner
            from .overlay import _seg_intersection

            kind, payload = _seg_intersection(o0[0], o0[1], o1[0], o1[1])
            if kind == "point":
                self._pop_if_last(A)
                self.add(payload[0])
                return
            if math.hypot(A[0] - B[0], A[1] - B[1]) < d * _INSIDE_TURN_SNAP:
                return  # keep A alone
            f = _CLOSING_SEG_FACTOR
            mid0 = ((f * A[0] + corner[0]) / (f + 1), (f * A[1] + corner[1]) / (f + 1))
            mid1 = ((f * B[0] + corner[0]) / (f + 1), (f * B[1] + corner[1]) / (f + 1))
            self.add(mid0)
            self.add(mid1)
            self.add(B)

    def _mitre(self, corner, o0, o1, A, B, d):
        limit_dist = self.p.mitre_limit * d
        ipt = _line_line_intersection(o0[0], o0[1], o1[0], o1[1])
        if ipt is not None and math.hypot(ipt[0] - corner[0], ipt[1] - corner[1]) <= limit_dist:
            self._pop_if_last(A)
            self.add(ipt)
            return
        bevel_dist = _pt_seg_dist(corner, A, B)
        if bevel_dist >= limit_dist:
            self.add(B)  # plain bevel
            return
        # limited mitre bevel (AddLimitedMitreJoin): bevel segment at the
        # mitre-limit distance along the outward corner bisector, cut against
        # the infinite offset lines
        mx = (A[0] + B[0]) * 0.5 - corner[0]
        my = (A[1] + B[1]) * 0.5 - corner[1]
        ll = math.hypot(mx, my)
        if ll == 0.0:
            self.add(B)
            return
        bx = corner[0] + mx / ll * limit_dist
        by = corner[1] + my / ll * limit_dist
        px, py = -my / ll, mx / ll  # bevel direction ⊥ bisector
        b0 = (bx + px * d, by + py * d)
        b1 = (bx - px * d, by - py * d)
        i0 = _seg_line_intersection(b0, b1, o0[0], o0[1])
        i1 = _seg_line_intersection(b0, b1, o1[0], o1[1])
        if i0 is None or i1 is None:
            self.add(B)
            return
        self._pop_if_last(A)
        self.add(i0)
        self.add(i1)
        self.add(B)


def _dist_to_ring(p, ring: np.ndarray) -> float:
    best = math.inf
    for i in range(len(ring) - 1):
        best = min(best, _pt_seg_dist(p, (ring[i, 0], ring[i, 1]),
                                      (ring[i + 1, 0], ring[i + 1, 1])))
    return best


def _is_ring_curve_inverted(ring: np.ndarray, d: float, curve: np.ndarray) -> bool:
    """BufferCurveSetBuilder.IsRingCurveInverted (jts#472): a small ring whose
    offset curve carries NO point near the buffer distance has fully inverted
    (inside-out) and would create an incorrect hole/shell — discard it."""
    if d == 0.0 or len(ring) <= 4 or len(ring) >= 10:
        return False
    if len(curve) > 4 * len(ring):
        return False
    tol = 0.99 * abs(d)
    for i in range(len(curve) - 1):
        if _dist_to_ring((curve[i, 0], curve[i, 1]), ring) > tol:
            return False
        mid = ((curve[i, 0] + curve[i + 1, 0]) * 0.5,
               (curve[i, 1] + curve[i + 1, 1]) * 0.5)
        if _dist_to_ring(mid, ring) > tol:
            return False
    return True


def ring_curve(ring: np.ndarray, d: float, params: BufferParams, side: int) -> np.ndarray | None:
    """Directed closed offset curve of a closed ring (first == last) at
    |d| on ``side`` (+1 right of travel, -1 left), traversal preserved.
    Input simplification removes shallow inside-turn detail (tol = d ×
    simplify_factor)."""
    tol = abs(d) * params.simplify_factor
    ring = _simplify_for_side(ring, tol, side, is_ring=True)
    if len(ring) < 4:
        return None
    w = _CurveWalker(abs(d), side, params)
    w.walk(ring, closed=True)
    if len(w.pts) < 3:
        return None
    pts = w.pts
    if pts[0] != pts[-1]:
        pts = pts + [pts[0]]
    curve = np.array(pts, dtype=np.float64)
    if _is_ring_curve_inverted(ring, d, curve):
        return None
    return curve


def line_curve(line: np.ndarray, d: float, params: BufferParams) -> np.ndarray | None:
    """Closed curve around an open line: right side forward, end cap, right
    side of the reversed line, start cap. CCW overall ⇒ winding +1 inside."""
    if len(line) < 2 or d <= 0.0:
        return None
    tol = d * params.simplify_factor
    fwd = _simplify_for_side(line, tol, +1, is_ring=False)
    rev = _simplify_for_side(line[::-1].copy(), tol, +1, is_ring=False)
    w = _CurveWalker(d, +1, params)
    w.walk(fwd, closed=False)
    _end_cap(w, fwd[-2], fwd[-1], d, params)
    w.walk(rev, closed=False)
    _end_cap(w, rev[-2], rev[-1], d, params)
    pts = w.pts
    if len(pts) < 3:
        return None
    if pts[0] != pts[-1]:
        pts = pts + [pts[0]]
    return np.array(pts, dtype=np.float64)


def _end_cap(w: _CurveWalker, p0, p1, d: float, params: BufferParams):
    """Cap around p1 for a line arriving from p0 (AddLineEndCap)."""
    dx, dy = float(p1[0]) - float(p0[0]), float(p1[1]) - float(p0[1])
    ll = math.hypot(dx, dy)
    ux, uy = dx / ll, dy / ll
    # arriving on the right side at A = p1 + right_normal*d; cap ends at
    # B = p1 + left_normal*d (the start of the reversed traversal's side)
    A = (float(p1[0]) + uy * d, float(p1[1]) - ux * d)
    B = (float(p1[0]) - uy * d, float(p1[1]) + ux * d)
    w.add(A)
    if params.end_cap == CAP_ROUND:
        a0 = math.atan2(A[1] - p1[1], A[0] - p1[0])
        a1 = math.atan2(B[1] - p1[1], B[0] - p1[0])
        for q in _fillet((float(p1[0]), float(p1[1])), a0, a1, +1, d, params.quad_segs):
            w.add(q)
    elif params.end_cap == CAP_SQUARE:
        w.add((A[0] + ux * d, A[1] + uy * d))
        w.add((B[0] + ux * d, B[1] + uy * d))
    # flat: A → B chord
    w.add(B)


def point_curve(x: float, y: float, d: float, params: BufferParams) -> np.ndarray | None:
    if d <= 0.0:
        return None
    if params.end_cap == CAP_FLAT:
        return None  # flat cap on a point buffers to empty
    if params.end_cap == CAP_SQUARE:
        ring = [(x - d, y - d), (x + d, y - d), (x + d, y + d), (x - d, y + d), (x - d, y - d)]
        return np.array(ring, dtype=np.float64)
    n = 4 * params.quad_segs
    ang = [2.0 * math.pi * k / n for k in range(n)]
    ring = [(x + d * math.cos(a), y + d * math.sin(a)) for a in ang]
    ring.append(ring[0])
    return np.array(ring, dtype=np.float64)


# ---------------------------------------------------------------------------
# winding-region extraction (BufferSubgraph depth labeling analog)
# ---------------------------------------------------------------------------

def _winding_at(q: tuple, curves: list[np.ndarray]) -> int:
    """Winding number of point q w.r.t. the directed curves (vectorized)."""
    wn = 0
    qx, qy = q
    for c in curves:
        x1, y1 = c[:-1, 0], c[:-1, 1]
        x2, y2 = c[1:, 0], c[1:, 1]
        cross = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
        up = (y1 <= qy) & (y2 > qy) & (cross > 0)
        dn = (y2 <= qy) & (y1 > qy) & (cross < 0)
        wn += int(up.sum()) - int(dn.sum())
    return wn


def extract_positive_region(curves: list[np.ndarray], sliver_area: float = 0.0,
                            check: bool = False) -> Geom | None:
    """Node the directed curves, walk arrangement faces, keep winding ≥ 1,
    and assemble the boundary into polygons with holes.

    With ``check=True``, every walk's BFS winding is verified against an
    independent ray-cast probe; any disagreement (micro-slivers from rounded
    intersection coordinates confuse the probes) returns ``None`` so the
    caller can retry on a snap-rounded arrangement — the BufferOp.cs:307-388
    precision-retry ladder."""
    from .overlay import (
        _assemble_rings,
        _edge_key,
        _node_chains,
        _rings_to_polygons,
        build_geometry,
    )

    class _Shim:
        def __init__(self, cs):
            self.chains = [(c, "line") for c in cs]
            self.points = []

    raw, _nodes = _node_chains([(0, _Shim(curves))])
    if not raw:
        return Geom(POLYGON)
    # net directed multiplicity per undirected edge
    mult: dict[tuple, int] = {}
    for u, v, _s, _k, _ci in raw:
        key = _edge_key(u, v)
        mult[key] = mult.get(key, 0) + (1 if (u, v) == key else -1)
    # all directed edges (both directions once each)
    directed = []
    for (u, v) in mult.keys():
        directed.append((u, v))
        directed.append((v, u))
    # face walks: each directed edge belongs to exactly one left-face walk
    walks = _face_walks(directed)
    edge_walk: dict[tuple, int] = {}
    for wi, wedges in enumerate(walks):
        for e in wedges:
            edge_walk[e] = wi
    # seed + BFS winding over the walk adjacency (cross an edge: wn changes
    # by the edge's net multiplicity)
    wn: dict[int, int | None] = {wi: None for wi in range(len(walks))}
    order = sorted(
        range(len(walks)),
        key=lambda wi: -max(
            (e[0][0] - e[1][0]) ** 2 + (e[0][1] - e[1][1]) ** 2 for e in walks[wi]
        ),
    )
    from collections import deque

    def probe(wi: int) -> int:
        # midpoint of the walk's longest edge, nudged left
        e = max(walks[wi], key=lambda ed: (ed[0][0] - ed[1][0]) ** 2 + (ed[0][1] - ed[1][1]) ** 2)
        (ux, uy), (vx, vy) = e
        mxp, myp = (ux + vx) * 0.5, (uy + vy) * 0.5
        dx, dy = vx - ux, vy - uy
        ll = math.hypot(dx, dy)
        if ll == 0.0:
            return 0
        eps = min(max(1e-9, 1e-12 * (abs(mxp) + abs(myp))), ll * 0.25)
        return _winding_at((mxp - dy / ll * eps, myp + dx / ll * eps), curves)

    for start in order:
        if wn[start] is not None:
            continue
        wn[start] = probe(start)
        dq = deque([start])
        while dq:
            wi = dq.popleft()
            for (u, v) in walks[wi]:
                # neighbor across this edge is the walk owning (v, u)
                nb = edge_walk.get((v, u))
                if nb is None or wn[nb] is not None:
                    continue
                key = _edge_key(u, v)
                m = mult.get(key, 0)
                signed = m if (u, v) == key else -m
                # wn left of (u,v) is wn[wi]; right of (u,v) = wn - signed
                wn[nb] = wn[wi] - signed
                dq.append(nb)
    if check:
        # verify: independent ray-cast per walk must agree with the BFS value
        # everywhere the kept/dropped decision could differ
        for wi in range(len(walks)):
            p = probe(wi)
            if (p >= 1) != (wn[wi] >= 1):
                return None
    # boundary edges: kept on left, not kept on right
    boundary = []
    for (u, v) in mult.keys():
        wl = wn.get(edge_walk.get((u, v)))
        wr = wn.get(edge_walk.get((v, u)))
        if wl is None or wr is None:
            continue
        kl, kr = wl >= 1, wr >= 1
        if kl and not kr:
            boundary.append((u, v))
        elif kr and not kl:
            boundary.append((v, u))
    if not boundary:
        return Geom(POLYGON)
    rings = _assemble_rings(boundary)
    polys = _rings_to_polygons(rings)
    if sliver_area > 0.0:
        polys = [_drop_gore_holes(p, sliver_area) for p in polys]
    return build_geometry(polys, 2)


def _drop_gore_holes(poly: Geom, sliver_area: float) -> Geom:
    """Remove gore holes: artifacts of quantized fillet arcs and of
    near-coincident noding intersections (BufferInputLineSimplifier.cs
    remarks call the former 'gores'). A hole is a gore when its area is tiny
    relative to d² AND it is either hair-thin (area/perimeter² far below a
    real hole's — a disc scores 1/4π ≈ 0.08) or micro-scale (perimeter ≪ d:
    a genuine buffer hole's boundary is a d-offset, never that small)."""
    if len(poly.rings) <= 1:
        return poly
    d_scale = math.sqrt(sliver_area / 0.01)  # buffer distance
    kept = [poly.rings[0]]
    for h in poly.rings[1:]:
        a = abs(_ring_area(h))
        perim = float(np.hypot(np.diff(h[:, 0]), np.diff(h[:, 1])).sum())
        thin = a / (perim * perim) if perim > 0 else 0.0
        if a < sliver_area and (thin < 2e-3 or perim < 0.05 * d_scale):
            continue
        kept.append(h)
    return Geom(POLYGON, rings=kept)


def _ring_area(r: np.ndarray) -> float:
    if len(r) < 3:
        return 0.0
    return 0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))


def _face_walks(directed: list[tuple]) -> list[list[tuple]]:
    """Partition directed edges into left-face walks (clockwise-most
    continuation — the same rule as overlay ring assembly)."""
    from .overlay import _next_edge

    out_map: dict[tuple, list] = {}
    for u, v in directed:
        out_map.setdefault(u, []).append((u, v))
    for node, lst in out_map.items():
        lst.sort(key=lambda ed: math.atan2(ed[1][1] - ed[0][1], ed[1][0] - ed[0][0]))
    used: set = set()
    walks: list[list[tuple]] = []
    for start in directed:
        if start in used:
            continue
        walk = [start]
        used.add(start)
        cur = start
        while True:
            nxt = _next_edge(out_map, cur)
            if nxt is None or nxt == start:
                break
            if nxt in used:
                break
            used.add(nxt)
            walk.append(nxt)
            cur = nxt
        walks.append(walk)
    return walks


# ---------------------------------------------------------------------------
# buffer entry (BufferOp.cs semantics)
# ---------------------------------------------------------------------------

def _fully_eroded(ring: np.ndarray, d: float) -> bool:
    """Sufficient erosion test: max inscribed radius ≤ half the smaller
    envelope dimension (OffsetCurveSetBuilder.IsErodedCompletely analog)."""
    w = ring[:, 0].max() - ring[:, 0].min()
    h = ring[:, 1].max() - ring[:, 1].min()
    return min(w, h) * 0.5 <= abs(d)


def _ring_both_sides(ring: np.ndarray, d: float, params: BufferParams,
                     curves: list[np.ndarray]):
    """Closed-line buffer band: continuous ring curves on both sides, no end
    caps (BufferCurveSetBuilder.AddLineString ring branch, JTS #523/#518)."""
    if not is_ccw(ring):
        ring = ring[::-1].copy()
    outer = ring_curve(ring, d, params, side=+1)
    if outer is not None:
        curves.append(outer)
    if not _fully_eroded(ring, d):
        inner = ring_curve(ring, d, params, side=-1)
        if inner is not None:
            curves.append(inner[::-1].copy())  # −1 winding inside shrunk ring


def _dedupe_pts(pts: np.ndarray) -> np.ndarray:
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
    return pts[keep]


def _ring_area2(r: np.ndarray) -> float:
    if len(r) < 4:
        return 0.0
    return float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))


def buffer_curves(g: Geom, dist: float, params: BufferParams) -> list[np.ndarray]:
    """Directed offset curves whose positive-winding region is buffer(g, d).

    Polygon rings are buffered RAW (no valid-area rebuild): a self-
    overlapping ring's curve winds 2 over the doubled region, so the
    positive-winding extraction reproduces the reference's NONZERO-winding
    depth semantics on invalid inputs (BufferSubgraph depth labeling —
    failure/TestBufferFailure.xml is exactly this case; an even-odd rebuild
    would turn the doubled region into a spurious hole)."""
    curves: list[np.ndarray] = []
    for poly_leaf in g.flatten():
        if poly_leaf.gtype != POLYGON or not poly_leaf.rings:
            continue
        rings = [_dedupe_pts(r) for r in poly_leaf.rings]
        shell = rings[0] if rings else None
        if shell is None or len(shell) < 4 or _ring_area2(shell) == 0.0:
            # zero-area polygon: its rings still buffer as linework
            if dist > 0.0:
                for r in rings:
                    c = None
                    if len(r) >= 4:
                        c = ring_curve(r, dist, params, side=+1)
                    elif len(r) in (2, 3):
                        # collapsed ring (2 distinct points): buffer the segment
                        c = line_curve(r[:2] if len(r) == 3 else r, dist, params)
                    if c is not None:
                        curves.append(c)
            continue
        # Rings are processed AS STORED (the reference flips the offset side
        # for reversed rings rather than reversing the array — simplifier
        # deletion order matters for bit-level parity with its fixtures);
        # curves from non-canonical rings are reversed afterwards so winding
        # stays +1 over added regions / −1 over holes. Canonical = shell CCW,
        # holes CW (interior on the LEFT of travel).
        if dist < 0.0 and _fully_eroded(shell, dist):
            continue  # polygon fully eroded

        # Erosion runs UNSIMPLIFIED: the reference's recorded erosion outputs
        # (misc/TestBufferExternal2.xml, 100 cases) match the exact inward
        # offset bit-for-close — input simplification visibly shifts thin
        # eroded cores and breaks fixture parity (measured: sf=0 → sd 0.0).
        ring_params = params if dist > 0.0 else (
            BufferParams(quad_segs=params.quad_segs, end_cap=params.end_cap,
                         join=params.join, mitre_limit=params.mitre_limit,
                         simplify_factor=0.0)
        )

        def _add_ring_curve(r: np.ndarray, is_shell: bool):
            canonical = is_ccw(r) == is_shell
            side = +1 if dist > 0.0 else -1
            walk_side = side if canonical else -side
            c = ring_curve(r, dist, ring_params, side=walk_side)
            if c is not None:
                curves.append(c if canonical else c[::-1].copy())

        _add_ring_curve(shell, True)
        for h in rings[1:]:
            if len(h) < 4:
                continue
            if dist > 0.0 and _fully_eroded(h, dist):
                continue  # hole disappears
            _add_ring_curve(h, False)
    if dist > 0.0:
        for leaf in g.flatten():
            if leaf.gtype == POINT and not leaf.is_empty:
                c = point_curve(float(leaf.coords[0, 0]), float(leaf.coords[0, 1]),
                                dist, params)
                if c is not None:
                    curves.append(c)
            elif leaf.gtype == LINESTRING and leaf.coords is not None and len(leaf.coords):
                pts = _dedupe_pts(leaf.coords)
                if len(pts) >= 4 and (pts[0] == pts[-1]).all():
                    _ring_both_sides(pts, dist, params, curves)
                elif len(pts) >= 2:
                    c = line_curve(pts, dist, params)
                    if c is not None:
                        curves.append(c)
                else:
                    c = point_curve(float(pts[0, 0]), float(pts[0, 1]), dist, params)
                    if c is not None:
                        curves.append(c)
    return curves


def offset_curve(g: Geom, dist: float, params: BufferParams | None = None) -> Geom:
    """Raw offset curve of linework (Operation/Buffer/OffsetCurve.cs:66-99
    semantics: positive distance = LEFT of the travel direction). Joins and
    the input simplifier follow the buffer parameters; no end caps."""
    from .overlay import build_geometry

    params = params or BufferParams()
    if dist == 0.0 or g.is_empty:
        return Geom(LINESTRING, coords=np.empty((0, 2)))
    side = -1 if dist > 0 else +1  # walker: +1 = right of travel
    d = abs(dist)
    parts = []
    for leaf in g.flatten():
        if leaf.gtype != LINESTRING or leaf.coords is None:
            continue
        pts = _dedupe_pts(leaf.coords)
        if len(pts) < 2:
            continue
        closed = len(pts) >= 4 and (pts[0] == pts[-1]).all()
        if closed:
            c = ring_curve(pts, d, params, side=side)
            if c is not None:
                parts.append(Geom(LINESTRING, coords=c))
        else:
            tol = d * params.simplify_factor
            simp = _simplify_for_side(pts, tol, side, is_ring=False)
            w = _CurveWalker(d, side, params)
            w.walk(simp, closed=False)
            if len(w.pts) >= 2:
                parts.append(Geom(LINESTRING, coords=np.array(w.pts)))
    return build_geometry(parts, 1)


def buffer_styled(g: Geom, dist: float, params: BufferParams | None = None) -> Geom:
    """Buffer with full style parameters (the BufferOp entry point)."""
    from .buffer import make_valid_area

    params = params or BufferParams()
    if g.is_empty:
        return Geom(POLYGON)
    if dist == 0.0:
        has_area = any(l.gtype == POLYGON for l in g.flatten())
        return make_valid_area(g) if has_area else Geom(POLYGON)
    curves = buffer_curves(g, dist, params)
    if not curves:
        return Geom(POLYGON)
    sliver = 0.01 * dist * dist
    # Precision-retry ladder (BufferOp.cs:307-388): floating extraction with
    # winding-consistency verification first; on disagreement, snap-round the
    # curve arrangement onto a grid ~1e-6 of the buffer distance
    # (SnapRoundingNoder hot pixels). Intersection points rounded to doubles
    # can land ~1 ulp apart and spawn micro-faces whose winding probes
    # misclassify (the GEOS #605 failure mode); pixel-merging them costs
    # ≤ d·1e-6 boundary perturbation — far inside the buffer matcher
    # tolerances (1e-3 relative area, d/100 Hausdorff).
    res = extract_positive_region(curves, sliver_area=sliver, check=True)
    if res is None:
        from .snapround import _snap_round_chains

        quantum = abs(dist) * 1e-6
        scale = 2.0 ** round(math.log2(1.0 / quantum))
        snapped = _snap_round_chains(curves, scale)
        curves = [c for c in snapped if c is not None and len(c) >= 3]
        if not curves:
            return Geom(POLYGON)
        res = extract_positive_region(curves, sliver_area=sliver)
    if dist < 0.0 and not res.is_empty:
        res = _drop_invalid_erosion_parts(res, g, -dist)
    elif (dist > 0.0 and not res.is_empty
          and params.join == JOIN_ROUND and params.end_cap == CAP_ROUND):
        res = _prune_false_boundary_rings(res, g, dist)
    return res


def _prune_false_boundary_rings(res: Geom, src: Geom, d: float) -> Geom:
    """Every boundary point of a round-style buffer(g, d) lies at distance
    exactly d from g; a result ring whose FARTHEST vertex is well inside
    that distance is an artifact of curve self-interaction (closing-segment
    pockets — failure/TestBufferFailure.xml #1) and is dropped (holes) or
    discarded (whole parts). Only valid for round joins/caps: mitre/bevel/
    flat styles legitimately cut inside the distance."""
    from .buffer import _point_to_geom_dist
    from .overlay import build_geometry

    tol = 0.99 * d
    kept_parts = []
    for leaf in res.flatten():
        if leaf.gtype != POLYGON or not leaf.rings:
            continue
        shell = leaf.rings[0]
        if float(_point_to_geom_dist(shell[:-1], src).max()) < tol:
            continue  # whole part is a pocket artifact
        rings = [shell]
        for h in leaf.rings[1:]:
            # a TRUE hole's entire boundary sits at distance ~d; any vertex
            # well inside that distance marks a pocket artifact
            if float(_point_to_geom_dist(h[:-1], src).min()) < tol:
                continue  # hole artifact — fill it
            rings.append(h)
        kept_parts.append(Geom(POLYGON, rings=rings))
    return build_geometry(kept_parts, 2)


def _drop_invalid_erosion_parts(res: Geom, src: Geom, d: float) -> Geom:
    """Erosion sanity: every point of buffer(g, -d) lies ≥ d inside g. A
    fully-inverted inward curve (input thinner than 2d everywhere —
    failure/TestBufferInsideNonEmpty.xml) can leave small positive-winding
    pockets; drop any result part whose interior point is closer than ~d to
    the source boundary."""
    from .buffer import _point_to_geom_dist
    from .overlay import build_geometry
    from .predicates import interior_point

    kept = []
    for leaf in res.flatten():
        if leaf.gtype != POLYGON or not leaf.rings:
            continue
        ip = interior_point(leaf)
        if ip is None:
            continue
        dist_b = float(_point_to_geom_dist(np.array([ip]), src)[0])
        if dist_b >= d * 0.9:
            kept.append(leaf)
    return build_geometry(kept, 2)
