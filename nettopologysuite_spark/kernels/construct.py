"""Construction algorithms: minimum bounding circle, maximum inscribed
circle, largest empty circle, discrete Fréchet distance.

References: ``Algorithm/MinimumBoundingCircle.cs`` (minimal enclosing
circle), ``Algorithm/Construct/MaximumInscribedCircle.cs`` and
``LargestEmptyCircle.cs`` (grid branch-and-bound to a distance tolerance),
``Algorithm/Distance/DiscreteFrechetDistance.cs`` (coupling DP).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .geom import LINESTRING, POLYGON, Geom
from .measures import point_segment_dist2
from .pip import EXTERIOR, PreparedPolygon


# ---------------------------------------------------------------------------
# minimum bounding circle (exact minimal enclosing circle)
# ---------------------------------------------------------------------------

def _circle_2(a, b):
    cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
    r = math.hypot(a[0] - b[0], a[1] - b[1]) / 2.0
    return (cx, cy, r)


def _circle_3(a, b, c):
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return None
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    return (ux, uy, math.hypot(ax - ux, ay - uy))


def _in_circle(circ, p, eps=1e-10) -> bool:
    return math.hypot(p[0] - circ[0], p[1] - circ[1]) <= circ[2] * (1 + eps) + eps


def minimum_bounding_circle(g: Geom) -> tuple[float, float, float] | None:
    """(cx, cy, radius) of the minimal enclosing circle (Welzl's algorithm,
    deterministic order — MinimumBoundingCircle.cs semantics)."""
    pts = g.all_coords()
    if pts is None or len(pts) == 0:
        return None
    # dedupe, deterministic shuffle by LCG for expected O(n)
    uniq = sorted({(float(x), float(y)) for x, y in pts})
    order = sorted(range(len(uniq)), key=lambda i: (i * 2654435761) % 1048576)
    P = [uniq[i] for i in order]

    def welzl():
        circ = (P[0][0], P[0][1], 0.0)
        for i in range(1, len(P)):
            if _in_circle(circ, P[i]):
                continue
            circ = (P[i][0], P[i][1], 0.0)
            for j in range(i):
                if _in_circle(circ, P[j]):
                    continue
                circ = _circle_2(P[i], P[j])
                for k in range(j):
                    if _in_circle(circ, P[k]):
                        continue
                    c3 = _circle_3(P[i], P[j], P[k])
                    if c3 is not None:
                        circ = c3
        return circ

    return welzl()


# ---------------------------------------------------------------------------
# maximum inscribed circle / largest empty circle (grid branch-and-bound)
# ---------------------------------------------------------------------------

def _boundary_segments(g: Geom) -> tuple[np.ndarray, np.ndarray]:
    a, b = [], []
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            for r in leaf.rings:
                if len(r) >= 2:
                    a.append(r[:-1])
                    b.append(r[1:])
        elif leaf.gtype == LINESTRING and leaf.coords is not None and len(leaf.coords) >= 2:
            a.append(leaf.coords[:-1])
            b.append(leaf.coords[1:])
    if not a:
        return np.empty((0, 2)), np.empty((0, 2))
    return np.concatenate(a), np.concatenate(b)


def _dist_to_segments(x: float, y: float, segs) -> float:
    a, b = segs
    if len(a) == 0:
        return math.inf
    d2 = point_segment_dist2(
        np.array([x]), np.array([y]),
        a[None, :, 0].reshape(1, -1) if False else a[:, 0][None, :],
        a[:, 1][None, :], b[:, 0][None, :], b[:, 1][None, :],
    )
    return float(np.sqrt(d2.min()))


def maximum_inscribed_circle(g: Geom, tol: float) -> tuple[float, float, float]:
    """(cx, cy, radius) — pole of inaccessibility of a polygonal geometry to
    within ``tol`` (MaximumInscribedCircle.cs grid refinement)."""
    segs = _boundary_segments(g)
    preps = []
    for l in g.flatten():
        if l.gtype == POLYGON and l.rings and len(l.rings[0]) >= 4:
            try:
                preps.append(PreparedPolygon(l))
            except Exception:
                pass  # degenerate (collapsed) polygon: no interior

    def signed_dist(x, y):
        d = _dist_to_segments(x, y, segs)
        inside = any(
            int(p.locate(np.array([x]), np.array([y]))[0]) != EXTERIOR for p in preps
        )
        return d if inside else -d

    env = g.envelope()
    minx, miny, maxx, maxy = float(env[0]), float(env[1]), float(env[2]), float(env[3])
    h = max(maxx - minx, maxy - miny) / 2.0
    cx0, cy0 = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    best = (signed_dist(cx0, cy0), cx0, cy0)
    # also seed with the interior point (guards degenerate centroids)
    from .predicates import interior_point

    ip = interior_point(g)
    if ip is not None:
        d = signed_dist(ip[0], ip[1])
        if d > best[0]:
            best = (d, ip[0], ip[1])
    heap = [(-(best[0] + h * math.sqrt(2)), cx0, cy0, h)]
    tie = 0
    while heap:
        nb, cx, cy, half = heapq.heappop(heap)
        if -nb <= best[0] + tol:
            break
        half2 = half / 2.0
        for dx in (-half2, half2):
            for dy in (-half2, half2):
                x, y = cx + dx, cy + dy
                d = signed_dist(x, y)
                if d > best[0]:
                    best = (d, x, y)
                bound = d + half2 * math.sqrt(2)
                if bound > best[0] + tol:
                    tie += 1
                    heapq.heappush(heap, (-bound, x + tie * 0.0, y, half2))
    return (best[1], best[2], best[0])


def largest_empty_circle(obstacles: Geom, boundary: Geom, tol: float) -> tuple[float, float, float]:
    """(cx, cy, radius) — largest circle whose center lies within ``boundary``
    and whose interior avoids ``obstacles`` (LargestEmptyCircle.cs)."""
    segs = _boundary_segments(obstacles)
    opts = obstacles.all_coords()
    preps = [PreparedPolygon(l) for l in boundary.flatten() if l.gtype == POLYGON]

    def dist_to_obstacles(x, y):
        d = _dist_to_segments(x, y, segs)
        if opts is not None and len(opts):
            dd = np.hypot(opts[:, 0] - x, opts[:, 1] - y)
            d = min(d, float(dd.min()))
        return d

    def score(x, y):
        inside = any(
            int(p.locate(np.array([x]), np.array([y]))[0]) != EXTERIOR for p in preps
        )
        if not inside:
            return -_dist_to_segments(x, y, _boundary_segments(boundary))
        return dist_to_obstacles(x, y)

    env = boundary.envelope()
    minx, miny, maxx, maxy = float(env[0]), float(env[1]), float(env[2]), float(env[3])
    h = max(maxx - minx, maxy - miny) / 2.0
    cx0, cy0 = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    best = (score(cx0, cy0), cx0, cy0)

    def refinable(d: float, bound: float) -> bool:
        # LargestEmptyCircle.cs MayContainCircleCenter: the score jumps
        # discontinuously across the boundary, so an outside cell that
        # overlaps the boundary is refined whenever its reach is above the
        # tolerance — NOT only when it beats the current best
        if bound < 0:
            return False  # fully outside
        if d < 0:
            return bound > tol  # outside but straddles the boundary
        return bound - best[0] > tol

    tie = 0
    heap = []
    d0 = best[0]
    heapq.heappush(heap, (-(d0 + h * math.sqrt(2)), tie, cx0, cy0, h, d0))
    while heap:
        nb, _t, cx, cy, half, d = heapq.heappop(heap)
        if not refinable(d, -nb):
            continue
        half2 = half / 2.0
        for dx in (-half2, half2):
            for dy in (-half2, half2):
                x, y = cx + dx, cy + dy
                dc = score(x, y)
                if dc > best[0]:
                    best = (dc, x, y)
                bound = dc + half2 * math.sqrt(2)
                if refinable(dc, bound):
                    tie += 1
                    heapq.heappush(heap, (-bound, tie, x, y, half2, dc))
    return (best[1], best[2], best[0])


# ---------------------------------------------------------------------------
# discrete Fréchet distance (coupling DP)
# ---------------------------------------------------------------------------

def discrete_frechet(a: Geom, b: Geom) -> float:
    """Discrete Fréchet distance over the vertex sequences
    (DiscreteFrechetDistance.cs coupling recurrence)."""
    p = a.all_coords()
    q = b.all_coords()
    n, m = len(p), len(q)
    if n == 0 or m == 0:
        return 0.0
    dx = p[:, 0][:, None] - q[None, :, 0]
    dy = p[:, 1][:, None] - q[None, :, 1]
    d = np.sqrt(dx * dx + dy * dy)
    ca = np.full((n, m), -1.0)
    ca[0, 0] = d[0, 0]
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        for j in range(1, m):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])
