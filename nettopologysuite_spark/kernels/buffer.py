"""Buffer support: valid-area rebuild (buffer-0), Hausdorff distances, and
the reference runner's buffer matcher. The buffer operator itself lives in
``kernels/offset.py`` (offset curves + winding-region extraction, the
``Operation/Buffer/BufferBuilder.cs:87-121`` pipeline).

buffer(0) = valid-area rebuild (even-odd face extraction over self-noded
rings — the classic buffer-0 fix).

The reference's own test runner matches buffer results by relative
symmetric-difference area (< 1e-3) and boundary Hausdorff distance
(< |d|/100) — ``test/NetTopologySuite.TestRunner/Result/BufferResultMatcher
.cs:43-105``.
"""

from __future__ import annotations

import math

import numpy as np

from .geom import LINESTRING, POLYGON, Geom
from .measures import point_segment_dist2
from .overlay import _assemble_rings, overlay
from .union_op import cascaded_union












def _all_segments(g: Geom):
    segs = []
    for leaf in g.flatten():
        if leaf.gtype == LINESTRING and len(leaf.coords) >= 2:
            c = leaf.coords
            segs.extend(
                ((float(c[i, 0]), float(c[i, 1])), (float(c[i + 1, 0]), float(c[i + 1, 1])))
                for i in range(len(c) - 1)
            )
        elif leaf.gtype == POLYGON:
            for r in leaf.rings:
                segs.extend(
                    ((float(r[i, 0]), float(r[i, 1])), (float(r[i + 1, 0]), float(r[i + 1, 1])))
                    for i in range(len(r) - 1)
                )
    return segs


# ---------------------------------------------------------------------------
# valid-area rebuild (buffer(0) / ensure-valid)
# ---------------------------------------------------------------------------

class _ChainShim:
    def __init__(self, chains):
        self.chains = chains
        self.points = []


def _ring_faces(ring: np.ndarray) -> list[Geom]:
    """Decompose one (possibly self-intersecting) ring into its minimal CCW
    faces (each as a hole-free polygon). Combining the faces of one ring
    with symmetric difference yields the even-odd region — including nested
    (annulus) configurations that per-face parity probes cannot label."""
    from .orientation import is_ccw
    from .overlay import _node_chains

    shim = _ChainShim([(ring, "line")])
    raw, _nodes = _node_chains([(0, shim)])
    directed = []
    for u, v, _s, _k, _ci in raw:
        directed.append((u, v))
        directed.append((v, u))
    faces = _assemble_rings(directed)
    return [Geom(POLYGON, rings=[f]) for f in faces if is_ccw(f)]


def _even_odd_area(faces: list[Geom]) -> Geom:
    """Symmetric-difference fold (a point is inside iff covered by an odd
    number of faces)."""
    result: Geom | None = None
    for f in faces:
        result = f if result is None else overlay(result, f, "symdifference")
    return result if result is not None else Geom(POLYGON)


def make_valid_area(g: Geom) -> Geom:
    """Rebuild a (possibly self-intersecting) polygonal geometry as a valid
    area with buffer(0) semantics: each ring decomposes into simple faces
    under the even-odd rule (a bowtie shell yields both wings), then
    shell-ring areas union and hole-ring areas subtract — a hole poking
    outside its shell removes nothing there."""
    part_areas: list[Geom] = []
    for leaf in g.flatten():
        if leaf.gtype != POLYGON:
            continue
        shell_area: Geom | None = None
        hole_areas: list[Geom] = []
        for ri, r in enumerate(leaf.rings):
            if len(r) >= 4:
                area_r = _even_odd_area(_ring_faces(r))
                if area_r.is_empty:
                    continue
                if ri == 0:
                    shell_area = area_r
                else:
                    hole_areas.append(area_r)
        if shell_area is None or shell_area.is_empty:
            continue
        # holes subtract from THEIR OWN polygon only — a sibling part nested
        # inside this hole must survive the union below
        if hole_areas:
            shell_area = overlay(shell_area, cascaded_union(hole_areas), "difference")
        if not shell_area.is_empty:
            part_areas.append(shell_area)
    if not part_areas:
        return Geom(POLYGON)
    result = cascaded_union(part_areas)
    if result is None or result.is_empty:
        return Geom(POLYGON)
    return result


# ---------------------------------------------------------------------------
# buffer (offset-curve pipeline — kernels/offset.py)
# ---------------------------------------------------------------------------

def buffer(g: Geom, dist: float, quad_segs: int = 8) -> Geom:
    """Default-style buffer (round joins/caps, BufferParameters.cs defaults).
    Full style control: ``offset.buffer_styled``."""
    from .offset import BufferParams, buffer_styled

    return buffer_styled(g, dist, BufferParams(quad_segs=quad_segs))


# ---------------------------------------------------------------------------
# discrete Hausdorff distance (Algorithm/Distance/DiscreteHausdorffDistance.cs)
# ---------------------------------------------------------------------------

def _points_of(g: Geom, densify_frac: float | None) -> np.ndarray:
    pts = [g.all_coords()]
    if densify_frac:
        n_sub = int(round(1.0 / densify_frac))
        for p0, p1 in _all_segments(g):
            for k in range(1, n_sub):
                t = k * densify_frac
                pts.append(
                    np.array([[p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1])]])
                )
    return np.concatenate([p for p in pts if len(p)], axis=0)


def _point_to_geom_dist(pts: np.ndarray, g: Geom) -> np.ndarray:
    segs = _all_segments(g)
    out = np.full(len(pts), np.inf)
    if segs:
        a = np.array([s[0] for s in segs])
        b = np.array([s[1] for s in segs])
        d2 = point_segment_dist2(
            pts[:, 0][:, None], pts[:, 1][:, None],
            a[:, 0][None, :], a[:, 1][None, :], b[:, 0][None, :], b[:, 1][None, :],
        )
        out = np.sqrt(d2.min(axis=1))
    gc = g.all_coords()
    if len(gc):
        dx = pts[:, 0][:, None] - gc[None, :, 0]
        dy = pts[:, 1][:, None] - gc[None, :, 1]
        out = np.minimum(out, np.sqrt((dx * dx + dy * dy).min(axis=1)))
    return out


def discrete_hausdorff(a: Geom, b: Geom, densify_frac: float | None = None) -> float:
    """Symmetric discrete Hausdorff distance over vertices (+ densified)."""
    if a.is_empty or b.is_empty:
        return 0.0
    pa = _points_of(a, densify_frac)
    pb = _points_of(b, densify_frac)
    d_ab = float(_point_to_geom_dist(pa, b).max()) if len(pa) else 0.0
    d_ba = float(_point_to_geom_dist(pb, a).max()) if len(pb) else 0.0
    return max(d_ab, d_ba)


def oriented_hausdorff(a: Geom, b: Geom, densify_frac: float | None = None) -> float:
    if a.is_empty or b.is_empty:
        return 0.0
    pa = _points_of(a, densify_frac)
    return float(_point_to_geom_dist(pa, b).max()) if len(pa) else 0.0


# ---------------------------------------------------------------------------
# the reference runner's buffer matcher (BufferResultMatcher.cs)
# ---------------------------------------------------------------------------

def buffer_result_match(actual: Geom, expected: Geom, dist: float) -> bool:
    from .boundary import boundary as boundary_op
    from .measures import area as geom_area

    if actual.is_empty and expected.is_empty:
        return True
    if actual.is_empty != expected.is_empty:
        return False
    exp_area = geom_area(expected)
    diff = overlay(actual, expected, "symdifference")
    area_diff = geom_area(diff)
    if area_diff > 0.0:
        frac = area_diff / exp_area if exp_area > 0 else math.inf
        if frac >= 1.0e-3:
            return False
    haus = oriented_hausdorff(
        boundary_op(actual), boundary_op(expected), densify_frac=0.25
    )
    tol = max(abs(dist) / 100.0, 1.0e-8)
    return haus <= tol
