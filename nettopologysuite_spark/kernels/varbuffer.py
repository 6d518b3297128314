"""Variable-distance buffer (Operation/Buffer/VariableBuffer.cs).

Per-vertex buffer distances interpolated by arc length; each segment buffers
to a tapered capsule (outer tangent lines of the end circles + caps sampled
on the GLOBAL quadrant-angle grid so overlapping caps share vertices,
VariableBuffer.cs:359-427); the union of the capsules is extracted with the
same positive-winding machinery as the fixed-distance buffer.
"""

from __future__ import annotations

import math

import numpy as np

from .geom import LINESTRING, POLYGON, Geom

_MIN_CAP_SEG_LEN_FACTOR = 4


def _project_polar(p, r, ang):
    return (p[0] + r * math.cos(ang), p[1] + r * math.sin(ang))


def _angle(p, q) -> float:
    return math.atan2(q[1] - p[1], q[0] - p[0])


def _outer_tangent(p0, r0, p1, r1):
    """Touch points of the outer tangent on the left of p0→p1, or None when
    one circle swallows the other."""
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    d = math.hypot(dx, dy)
    if d <= abs(r1 - r0):
        return None
    ux, uy = dx / d, dy / d
    vx, vy = -uy, ux  # left normal
    a = (r1 - r0) / d
    b = math.sqrt(max(0.0, 1.0 - a * a))
    nx = -a * ux + b * vx
    ny = -a * uy + b * vy
    t0 = (p0[0] + r0 * nx, p0[1] + r0 * ny)
    t1 = (p1[0] + r1 * nx, p1[1] + r1 * ny)
    return t0, t1


def _reflect(pt, a, b):
    """Reflect pt across the line a→b."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return pt
    t = ((pt[0] - a[0]) * dx + (pt[1] - a[1]) * dy) / ll
    fx, fy = a[0] + t * dx, a[1] + t * dy
    return (2 * fx - pt[0], 2 * fy - pt[1])


def _add_cap(p, r, t1, t2, coords, quad_segs):
    """CW cap arc from t1 to t2 around p, points on the global angle grid
    (VariableBuffer.AddCap, incl. the spike-avoidance quality filters)."""
    from .orientation import orient_index

    if r == 0:
        coords.append((p[0], p[1]))
        return
    coords.append(t1)
    ang_start = _angle(p, t1) % (2 * math.pi)
    ang_end = _angle(p, t2) % (2 * math.pi)
    if ang_start < ang_end:
        ang_start += 2 * math.pi
    seg_ang = math.pi / 2 / quad_segs
    idx_start = int(ang_start / seg_ang)
    idx_end = int(ang_end / seg_ang)
    cap_seg_len = r * 2 * math.sin(math.pi / 4 / quad_segs)
    min_seg_len = cap_seg_len / _MIN_CAP_SEG_LEN_FACTOR
    for i in range(idx_start, idx_end - 1, -1):
        cap_pt = _project_polar(p, r, i * seg_ang)
        ok = True
        if i == idx_start and orient_index(
            p[0], p[1], t1[0], t1[1], cap_pt[0], cap_pt[1]
        ) != -1:
            ok = False
        elif i == idx_end and orient_index(
            p[0], p[1], t2[0], t2[1], cap_pt[0], cap_pt[1]
        ) != 1:
            ok = False
        if math.hypot(cap_pt[0] - t1[0], cap_pt[1] - t1[1]) < min_seg_len:
            ok = False
        elif math.hypot(cap_pt[0] - t2[0], cap_pt[1] - t2[1]) < min_seg_len:
            ok = False
        if ok:
            coords.append(cap_pt)
    coords.append(t2)


def _circle_ring(center, radius, quad_segs) -> np.ndarray | None:
    if radius <= 0:
        return None
    n = 4 * quad_segs
    ang_inc = math.pi / 2 / quad_segs
    pts = [_project_polar(center, radius, i * ang_inc) for i in range(n)]
    pts.append(pts[0])
    return np.array(pts)


def _segment_ring(p0, p1, d0, d1, quad_segs) -> np.ndarray | None:
    if d0 <= 0 and d1 <= 0:
        return None
    if d0 > d1:
        p0, p1, d0, d1 = p1, p0, d1, d0
    tangent = _outer_tangent(p0, d0, p1, d1)
    if tangent is None:
        center, dist = (p1, d1) if d1 > d0 else (p0, d0)
        return _circle_ring(center, dist, quad_segs)
    t0, t1 = tangent
    r0 = _reflect(t0, p0, p1)
    r1 = _reflect(t1, p0, p1)
    if d0 == 0:
        r0 = (p0[0], p0[1])
    coords: list[tuple] = []
    _add_cap(p1, d1, t1, r1, coords, quad_segs)
    _add_cap(p0, d0, r0, t0, coords, quad_segs)
    if coords[0] != coords[-1]:
        coords.append(coords[0])
    # dedupe consecutive duplicates
    out = [coords[0]]
    for c in coords[1:]:
        if c != out[-1]:
            out.append(c)
    if len(out) < 4:
        return None
    return np.array(out)


def variable_buffer(g: Geom, start_dist: float, end_dist: float,
                    quad_segs: int = 8) -> Geom:
    """Buffer of linework with the distance interpolated by arc length from
    start_dist to end_dist (VariableBuffer.Buffer(line, start, end))."""
    from .offset import extract_positive_region

    curves: list[np.ndarray] = []
    for leaf in g.flatten():
        if leaf.gtype != LINESTRING or leaf.coords is None or len(leaf.coords) < 2:
            continue
        c = leaf.coords
        seg_len = np.hypot(np.diff(c[:, 0]), np.diff(c[:, 1]))
        total = float(seg_len.sum())
        cum = np.concatenate([[0.0], np.cumsum(seg_len)])
        if total == 0.0:
            dists = np.full(len(c), max(start_dist, end_dist))
        else:
            dists = start_dist + (end_dist - start_dist) * cum / total
        for i in range(len(c) - 1):
            ring = _segment_ring(
                (float(c[i, 0]), float(c[i, 1])),
                (float(c[i + 1, 0]), float(c[i + 1, 1])),
                float(dists[i]), float(dists[i + 1]), quad_segs,
            )
            if ring is not None:
                # rings are generated CW; winding extraction wants CCW (+1)
                curves.append(ring[::-1].copy())
    if not curves:
        return Geom(POLYGON)
    d_scale = max(abs(start_dist), abs(end_dist), 1e-12)
    res = extract_positive_region(curves, sliver_area=0.0, check=True)
    if res is None:
        from .snapround import _snap_round_chains

        scale = 2.0 ** round(math.log2(1e6 / d_scale))
        snapped = _snap_round_chains(curves, scale)
        curves = [x for x in snapped if x is not None and len(x) >= 3]
        res = extract_positive_region(curves, sliver_area=0.0)
    return res
