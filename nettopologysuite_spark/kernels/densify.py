"""Densify (Densify/Densifier.cs:48-80 exact port) and Douglas-Peucker
simplification (Simplify/DouglasPeuckerSimplifier.cs:37 semantics)."""

from __future__ import annotations

import math

import numpy as np

from .geom import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)
from .measures import point_segment_dist2


def _densify_points(pts: np.ndarray, tol: float) -> np.ndarray:
    out = []
    for i in range(len(pts) - 1):
        p0 = pts[i]
        p1 = pts[i + 1]
        out.append((float(p0[0]), float(p0[1])))
        seg_len = math.hypot(p1[0] - p0[0], p1[1] - p0[1])
        if seg_len <= tol:
            continue
        n = int(math.ceil(seg_len / tol))
        sub_len = seg_len / n
        for j in range(1, n):
            frac = (j * sub_len) / seg_len
            out.append(
                (
                    float(p0[0] + frac * (p1[0] - p0[0])),
                    float(p0[1] + frac * (p1[1] - p0[1])),
                )
            )
    out.append((float(pts[-1, 0]), float(pts[-1, 1])))
    return np.array(out, dtype=np.float64)


def densify(g: Geom, tol: float) -> Geom:
    if tol <= 0:
        raise ValueError("tolerance must be positive")
    if g.gtype == POINT:
        return Geom(POINT, coords=None if g.coords is None else g.coords.copy())
    if g.gtype == LINESTRING:
        if g.is_empty or len(g.coords) < 2:
            return Geom(LINESTRING, coords=g.coords.copy() if g.coords is not None else None)
        return Geom(LINESTRING, coords=_densify_points(g.coords, tol))
    if g.gtype == POLYGON:
        return Geom(POLYGON, rings=[_densify_points(r, tol) for r in g.rings])
    return Geom(g.gtype, parts=[densify(p, tol) for p in g.parts])


# ---------------------------------------------------------------------------
# Douglas-Peucker
# ---------------------------------------------------------------------------

def _dp_section(pts: np.ndarray, lo: int, hi: int, tol: float, keep: np.ndarray):
    if hi <= lo + 1:
        return
    seg0 = pts[lo]
    seg1 = pts[hi]
    mids = pts[lo + 1 : hi]
    d2 = point_segment_dist2(
        mids[:, 0], mids[:, 1], seg0[0], seg0[1], seg1[0], seg1[1]
    )
    k = int(np.argmax(d2))
    if math.sqrt(float(d2[k])) <= tol:
        return
    mid = lo + 1 + k
    keep[mid] = True
    _dp_section(pts, lo, mid, tol, keep)
    _dp_section(pts, mid, hi, tol, keep)


def _dp_points(pts: np.ndarray, tol: float, preserve_endpoint: bool) -> np.ndarray:
    """DouglasPeuckerLineSimplifier.Simplify port, incl. the ring-endpoint
    simplification applied when endpoints need not be preserved (:85-100)."""
    n = len(pts)
    if n == 0:
        return pts.copy()
    if n <= 2:
        out = pts.copy()
    else:
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        _dp_section(pts, 0, n - 1, tol, keep)
        out = pts[keep].copy()
    is_ring = n > 1 and (pts[0] == pts[-1]).all()
    if not preserve_endpoint and is_ring and len(out) >= 4:
        d2 = point_segment_dist2(
            out[0, 0], out[0, 1], out[1, 0], out[1, 1], out[-2, 0], out[-2, 1]
        )
        if math.sqrt(float(d2)) <= tol:
            out = np.concatenate([out[1:-1], out[1:2]], axis=0)
    return out


def simplify_dp(g: Geom, tol: float) -> Geom:
    """DouglasPeuckerSimplifier.Simplify semantics: endpoints preserved for
    lines, ring-endpoint simplification for rings, degenerate rings removed
    (shell collapse → POLYGON EMPTY), empty components dropped from
    collections. The buffer(0) ensure-valid repair of self-intersecting
    results awaits the overlay kernel (affects 2 corpus cases)."""
    if g.gtype == POINT:
        return Geom(POINT, coords=None if g.coords is None else g.coords.copy())
    if g.gtype == LINESTRING:
        if g.is_empty:
            return Geom(LINESTRING, coords=np.empty((0, 2)))
        return Geom(LINESTRING, coords=_dp_points(g.coords, tol, True))
    if g.gtype == POLYGON:
        if g.is_empty:
            return Geom(POLYGON)
        rings = []
        for i, r in enumerate(g.rings):
            rr = _dp_points(r, tol, False)
            if len(rr) >= 4:
                rings.append(rr)
            elif i == 0:
                return Geom(POLYGON)  # shell collapsed
        return _ensure_valid_area(Geom(POLYGON, rings=rings))
    parts = [simplify_dp(p, tol) for p in g.parts if not p.is_empty]
    parts = [p for p in parts if not p.is_empty]
    if g.gtype == MULTIPOLYGON:
        merged = Geom(MULTIPOLYGON, parts=parts)
        fixed = _ensure_valid_area(merged)
        return fixed if fixed.gtype != MULTIPOLYGON or len(fixed.parts) != 1 else fixed.parts[0]
    if len(parts) == 1:
        return parts[0]  # GeometryTransformer BuildGeometry collapses singletons
    return Geom(g.gtype, parts=parts)


def _ensure_valid_area(g: Geom) -> Geom:
    """DPTransformer.CreateValidArea: repair invalid simplified areas with
    the buffer(0) valid-area rebuild."""
    from .valid import is_valid

    if g.is_empty or is_valid(g):
        return g
    from .buffer import make_valid_area

    return make_valid_area(g)
