"""Fixed-precision (snap-rounding) overlay — OverlayNG-with-PrecisionModel
semantics (``Operation/OverlayNG/OverlayNG.cs`` fixed-PM mode,
``Noding/Snapround/SnapRoundingNoder.cs`` behavior realized as:
round inputs → valid-area rebuild (collapses drop out, their linework kept)
→ exact overlay → round result to the grid → valid-area rebuild again →
re-attach collapse lines for the intersection op (collapsed pieces appear
as lines only where the result dimension allows).
"""

from __future__ import annotations

import numpy as np

from .buffer import make_valid_area
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
from .measures import _ring_signed_area2
from .overlay import build_geometry, overlay
from .union_op import dissolve_lines


def make_precise(g: Geom, scale: float) -> Geom:
    def fix(a: np.ndarray) -> np.ndarray:
        return np.floor(a * scale + 0.5) / scale

    if g.gtype in (POINT, LINESTRING):
        c = None if g.coords is None else fix(g.coords)
        out = Geom(g.gtype, coords=c)
        return out
    if g.gtype == POLYGON:
        return Geom(POLYGON, rings=[fix(r) for r in g.rings])
    return Geom(g.gtype, parts=[make_precise(p, scale) for p in g.parts])


def _dedup_ring(r: np.ndarray) -> np.ndarray:
    if len(r) < 2:
        return r
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]).any(axis=1)
    return r[keep]


def _split_area_and_collapses(g: Geom) -> tuple[Geom, list[Geom]]:
    """Valid area of a rounded polygonal geometry + collapsed linework:
    the pieces of the (deduped) ring paths lying OUTSIDE the valid area —
    spikes and fully-collapsed rings survive as 1-dim point sets."""
    ring_lines: list[Geom] = []
    any_poly = False
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            any_poly = True
            for r in leaf.rings:
                rr = _dedup_ring(r)
                if len(rr) >= 2:
                    ring_lines.append(Geom(LINESTRING, coords=rr))
    if not any_poly:
        return g, []
    va = make_valid_area(g)
    lines_gc = Geom(GEOMETRYCOLLECTION, parts=ring_lines)
    if va.is_empty:
        diff = dissolve_lines(lines_gc)
    else:
        diff = overlay(lines_gc, va, "difference")
    collapses = [l for l in diff.flatten() if l.gtype == LINESTRING]
    return va, collapses


class _Shim:
    def __init__(self, chains):
        self.chains = [(c, "line") for c in chains]
        self.points = []


def _on_poly(pt, ln) -> bool:
    from .overlay import _on_polyline

    return _on_polyline(float(pt[0]), float(pt[1]), ln)


def _round_pt(p, scale):
    return (
        float(np.floor(p[0] * scale + 0.5) / scale),
        float(np.floor(p[1] * scale + 0.5) / scale),
    )


def _snap_round_chains(all_chains: list[np.ndarray], scale: float) -> list[np.ndarray]:
    """Full snap-rounding (SnapRoundingNoder/HotPixel semantics): hot pixels
    are the rounded positions of every vertex and every pairwise/self
    intersection; every segment passing through a pixel's square gains a
    vertex at the pixel center. Two passes reach the fixed point for the
    corpus inputs."""
    from .overlay import _node_chains

    chains = all_chains
    half = 0.5 / scale
    for _pass in range(2):
        live = [c for c in chains if c is not None and len(c) >= 2]
        raw, node_points = _node_chains([(0, _Shim(live))])
        pixels = {_round_pt(p, scale) for p in node_points}
        for c in live:
            for v in c:
                pixels.add(_round_pt((float(v[0]), float(v[1])), scale))
        pix = sorted(pixels)
        # vectorized candidate filter: only pixels whose square overlaps the
        # segment's envelope reach the exact clip test
        parr = np.asarray(pix, dtype=np.float64) if pix else np.empty((0, 2))
        px_order = np.argsort(parr[:, 0], kind="stable") if len(parr) else np.empty(0, dtype=np.int64)
        px_sorted_x = parr[px_order, 0] if len(parr) else np.empty(0)
        out = []
        for c in chains:
            if c is None or len(c) < 2:
                out.append(None)
                continue
            verts: list[tuple[float, float]] = []
            for i in range(len(c) - 1):
                p1 = (float(c[i, 0]), float(c[i, 1]))
                p2 = (float(c[i + 1, 0]), float(c[i + 1, 1]))
                if len(parr):
                    lo = np.searchsorted(px_sorted_x, min(p1[0], p2[0]) - half, side="left")
                    hi = np.searchsorted(px_sorted_x, max(p1[0], p2[0]) + half, side="right")
                    cand = px_order[lo:hi]
                    ys = parr[cand, 1]
                    cand = cand[(ys >= min(p1[1], p2[1]) - half) & (ys <= max(p1[1], p2[1]) + half)]
                else:
                    cand = []
                hits = []
                for ci2 in cand:
                    cx, cy = pix[int(ci2)]
                    t = _clip_param(p1, p2, cx, cy, half)
                    if t is not None:
                        hits.append((t, (cx, cy)))
                hits.sort()
                if not verts:
                    verts.append(_round_pt(p1, scale))
                for _t, p in hits:
                    if verts[-1] != p:
                        verts.append(p)
                p2r = _round_pt(p2, scale)
                if verts[-1] != p2r:
                    verts.append(p2r)
            arr = _dedup_ring(np.array(verts, dtype=np.float64)) if verts else np.empty((0, 2))
            out.append(arr if len(arr) >= 2 else None)
        chains = out
    return chains


def _clip_param(p1, p2, cx, cy, half):
    """Mid-parameter of the segment's intersection with the pixel square,
    or None. The square is closed on left/bottom and OPEN on right/top
    (HotPixel.cs convention) — a segment merely touching the right/top
    boundary does not snap."""
    dx = p2[0] - p1[0]
    dy = p2[1] - p1[1]
    t0, t1 = 0.0, 1.0
    for d, lo, hi, o in ((dx, cx - half, cx + half, p1[0]), (dy, cy - half, cy + half, p1[1])):
        if d == 0.0:
            if o < lo or o > hi:
                return None
        else:
            ta = (lo - o) / d
            tb = (hi - o) / d
            if ta > tb:
                ta, tb = tb, ta
            t0 = max(t0, ta)
            t1 = min(t1, tb)
            if t0 > t1:
                return None
    # open right/top: reject touch-only contact along x = cx+half / y = cy+half
    xa = p1[0] + t0 * dx
    xb = p1[0] + t1 * dx
    ya = p1[1] + t0 * dy
    yb = p1[1] + t1 * dy
    if xa == cx + half and xb == cx + half:
        return None
    if ya == cy + half and yb == cy + half:
        return None
    return (t0 + t1) * 0.5


def _snap_rebuild(g: Geom, snapped: list, idx: int) -> tuple[Geom, int]:
    """Reassemble one side from its snap-rounded chains (consumed from
    ``snapped`` starting at ``idx``)."""
    parts: list[Geom] = []
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            rings = []
            for _r in leaf.rings:
                c = snapped[idx]
                idx += 1
                if c is not None and len(c) >= 3:
                    if (c[0] != c[-1]).any():
                        c = np.concatenate([c, c[:1]], axis=0)
                    rings.append(c)
                elif c is not None:
                    parts.append(Geom(LINESTRING, coords=c))  # collapsed ring
            if rings:
                parts.append(Geom(POLYGON, rings=rings))
        elif leaf.gtype == LINESTRING and len(leaf.coords) >= 2:
            c = snapped[idx]
            idx += 1
            if c is not None:
                parts.append(Geom(LINESTRING, coords=c))
    poly_parts = [p for p in parts if p.gtype == POLYGON]
    other = [p for p in parts if p.gtype != POLYGON]
    area, coll = (
        _split_area_and_collapses(Geom(GEOMETRYCOLLECTION, parts=poly_parts))
        if poly_parts
        else (Geom(POLYGON), [])
    )
    combined = [p for p in area.flatten() if p.gtype == POLYGON] + coll + other
    return Geom(GEOMETRYCOLLECTION, parts=combined), idx


def overlay_snaprounded(ga: Geom, gb: Geom, op: str, scale: float) -> Geom:
    op = op.lower()
    # puntal × lineal: only the puntal side rounds (OverlayNG leaves the
    # non-interacting lineal geometry unrounded — corpus 'PL disjoint' case)
    da, db = ga.dimension(), gb.dimension()
    if {da, db} == {0, 1}:
        ar = make_precise(ga, scale) if da == 0 else ga
        br = make_precise(gb, scale) if db == 0 else gb
        res = make_precise(overlay(ar, br, op), scale)
        # absorb points onto rounded lines
        lines = [l for l in res.flatten() if l.gtype == LINESTRING]
        pts = [
            p for p in res.flatten()
            if p.gtype == POINT and not any(
                _on_poly(p.coords[0], l.coords) for l in lines
            )
        ]
        others = [l for l in res.flatten() if l.gtype not in (POINT,)]
        if op == "intersection":
            edim = min(da, db)
        elif op == "difference":
            edim = da
        else:
            edim = max(da, db)
        return build_geometry(others + pts, edim)

    # snap-round ALL chains (rings + lines) of both sides over shared pixels
    def chain_count(g):
        n = 0
        for leaf in g.flatten():
            if leaf.gtype == POLYGON:
                n += len(leaf.rings)
            elif leaf.gtype == LINESTRING and len(leaf.coords) >= 2:
                n += 1
        return n

    all_chains: list[np.ndarray] = []
    for g in (ga, gb):
        for leaf in g.flatten():
            if leaf.gtype == POLYGON:
                all_chains.extend(leaf.rings)
            elif leaf.gtype == LINESTRING and len(leaf.coords) >= 2:
                all_chains.append(leaf.coords)
    snapped = _snap_round_chains(all_chains, scale)
    a_in, idx = _snap_rebuild(ga, snapped, 0)
    b_in, _ = _snap_rebuild(gb, snapped, idx)
    # rounded isolated points ride along
    for src, tgt in ((ga, a_in), (gb, b_in)):
        for leaf in src.flatten():
            if leaf.gtype == POINT and not leaf.is_empty:
                tgt.parts.append(make_precise(leaf, scale))

    res = overlay(a_in, b_in, op)
    res_r = make_precise(res, scale)

    # re-validate the rounded result: polygons may have collapsed/self-touch
    polys: list[Geom] = []
    lines: list[Geom] = []
    points: list[Geom] = []
    collapse_lines: list[Geom] = []
    for leaf in res_r.flatten():
        if leaf.gtype == POLYGON:
            va, coll = _split_area_and_collapses(leaf)
            polys.extend(p for p in va.flatten() if p.gtype == POLYGON)
            collapse_lines.extend(coll)
        elif leaf.gtype == LINESTRING:
            rr = _dedup_ring(leaf.coords)
            if len(rr) >= 2:
                lines.append(Geom(LINESTRING, coords=rr))
            elif len(rr) == 1:
                points.append(Geom(POINT, coords=rr))
        elif leaf.gtype == POINT and not leaf.is_empty:
            points.append(leaf)

    if op == "intersection":
        # result slivers that rounded to zero area surface as lines
        lines.extend(collapse_lines)
    # drop line/point pieces covered by result areas, dissolve duplicates
    if lines:
        merged = dissolve_lines(Geom(GEOMETRYCOLLECTION, parts=lines))
        kept_lines = []
        from .pip import EXTERIOR, PreparedPolygon

        preps = [PreparedPolygon(p) for p in polys]
        for l in merged.flatten():
            if l.gtype != LINESTRING:
                continue
            mx = (l.coords[0] + l.coords[1]) * 0.5
            covered = any(
                int(pp.locate(np.array([mx[0]]), np.array([mx[1]]))[0]) != EXTERIOR
                for pp in preps
            )
            if not covered:
                kept_lines.append(l)
        lines = kept_lines

    dims = {"intersection": min, "union": max, "difference": None, "symdifference": max}
    da = max(ga.dimension(), 0)
    db = max(gb.dimension(), 0)
    if op == "difference":
        empty_dim = da
    else:
        empty_dim = dims[op](da, db)
    return build_geometry(polys + lines + points, empty_dim)
