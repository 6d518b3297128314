"""Overlay input clipping (OverlayNG's large-input optimization).

For INTERSECTION and DIFFERENCE the result region is bounded (the
intersection of the input envelopes / the A envelope), so input rings can
be clipped to a rectangle before noding — an intersection of a 100k-vertex
geometry with a tiny one then nodes only the local linework instead of the
whole input. Mirrors the reference pipeline:

- clip envelope: the result envelope expanded to include BOTH endpoints of
  every input segment whose envelope intersects it, so no segment that can
  participate in result noding is perturbed by clipping
  (``Operation/OverlayNG/RobustClipEnvelopeComputer.cs:17-105``), plus a
  safety buffer (``OverlayUtility.cs:102-115``);
- ring clipping: Sutherland-Hodgman against the four box edges with the
  reference's closing rule (``Operation/OverlayNG/RingClipper.cs:69-186``).
  The output may contain coincident linework along the box sides; the
  exact-rational noder downstream handles coincident edges (as the
  reference notes its snap-rounding noder does).

Clipping applies only to fully polygonal inputs (the reference limits
RingClipper to rings; lines use LineLimiter, not mirrored here) and only
when it can actually drop vertices.
"""

from __future__ import annotations

import numpy as np

from .geom import MULTIPOLYGON, POLYGON, Geom

_SAFE_ENV_BUFFER_FACTOR = 0.1


def _env_intersection(ea, eb):
    minx = max(ea[0], eb[0]); miny = max(ea[1], eb[1])
    maxx = min(ea[2], eb[2]); maxy = min(ea[3], eb[3])
    if minx > maxx or miny > maxy:
        return None
    return (minx, miny, maxx, maxy)


def _rings_of(g: Geom):
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            yield from leaf.rings


def _is_polygonal(g: Geom) -> bool:
    # flatten() yields only POINT/LINESTRING/POLYGON leaves
    leaves = g.flatten()
    return bool(leaves) and all(l.gtype == POLYGON for l in leaves)


def robust_clip_envelope(ga: Geom, gb: Geom, target) -> tuple:
    """Expand target to include both endpoints of every segment whose
    envelope intersects it (RobustClipEnvelopeComputer semantics)."""
    minx, miny, maxx, maxy = target
    for g in (ga, gb):
        for r in _rings_of(g):
            if len(r) < 2:
                continue
            x1, y1 = r[:-1, 0], r[:-1, 1]
            x2, y2 = r[1:, 0], r[1:, 1]
            hit = ~(
                (np.maximum(x1, x2) < minx) | (np.minimum(x1, x2) > maxx)
                | (np.maximum(y1, y2) < miny) | (np.minimum(y1, y2) > maxy)
            )
            if hit.any():
                xs = np.concatenate([x1[hit], x2[hit]])
                ys = np.concatenate([y1[hit], y2[hit]])
                minx = min(minx, xs.min()); maxx = max(maxx, xs.max())
                miny = min(miny, ys.min()); maxy = max(maxy, ys.max())
    pad = _SAFE_ENV_BUFFER_FACTOR * max(maxx - minx, maxy - miny, 1e-9)
    return (minx - pad, miny - pad, maxx + pad, maxy + pad)


def clipping_envelope(ga: Geom, gb: Geom, op: str):
    """Clip env for the op, or None when no clipping applies
    (OverlayUtility.ClippingEnvelope / ResultEnvelope)."""
    if op == "intersection":
        target = _env_intersection(ga.envelope(), gb.envelope())
    elif op == "difference":
        target = tuple(ga.envelope())
    else:
        return None
    if target is None:
        return None
    return robust_clip_envelope(ga, gb, target)


def _clip_edge(cur: np.ndarray, ei: int, env) -> np.ndarray:
    """One Sutherland-Hodgman pass against box edge ``ei`` — vectorized:
    inside mask + crossing detection per segment, intersections computed
    for all crossings at once, output assembled by stable slot order."""
    minx, miny, maxx, maxy = env
    x, y = cur[:, 0], cur[:, 1]
    if ei == 0:
        ins = y > miny
    elif ei == 1:
        ins = x < maxx
    elif ei == 2:
        ins = y < maxy
    else:
        ins = x > minx
    prev = np.roll(ins, 1)
    crossing = ins != prev  # segment (i-1, i) crosses the edge line
    n = len(cur)
    iidx = np.flatnonzero(crossing)
    a = cur[(iidx - 1) % n]
    b = cur[iidx]
    if ei in (0, 2):
        yl = miny if ei == 0 else maxy
        with np.errstate(divide="ignore", invalid="ignore"):
            ix = a[:, 0] + (yl - a[:, 1]) * (b[:, 0] - a[:, 0]) / (b[:, 1] - a[:, 1])
        ipts = np.column_stack([ix, np.full(len(iidx), yl)])
    else:
        xl = maxx if ei == 1 else minx
        with np.errstate(divide="ignore", invalid="ignore"):
            iy = a[:, 1] + (xl - a[:, 0]) * (b[:, 1] - a[:, 1]) / (b[:, 0] - a[:, 0])
        ipts = np.column_stack([np.full(len(iidx), xl), iy])
    pidx = np.flatnonzero(ins)
    # slot 2i = intersection entering/leaving before point i; 2i+1 = point i
    slots = np.concatenate([2 * iidx, 2 * pidx + 1])
    coords = np.concatenate([ipts, cur[pidx]], axis=0)
    order = np.argsort(slots, kind="stable")
    return coords[order]


def clip_ring(pts: np.ndarray, env) -> np.ndarray:
    """Sutherland-Hodgman ring clip to the box (RingClipper.Clip)."""
    cur = np.asarray(pts, dtype=np.float64)
    for ei in range(4):
        if len(cur) == 0:
            return np.empty((0, 2))
        cur = _clip_edge(cur, ei, env)
    # close the ring (RingClipper closeRing on the final edge)
    if len(cur) and (cur[0] != cur[-1]).any():
        cur = np.concatenate([cur, cur[:1]], axis=0)
    return cur


def clip_polygonal(g: Geom, env) -> Geom:
    """Clip every ring of a polygonal geometry to env; empty rings drop."""
    parts: list[Geom] = []
    for leaf in g.flatten():
        if leaf.gtype != POLYGON:
            continue
        rings = []
        for i, r in enumerate(leaf.rings):
            cr = clip_ring(r, env)
            if len(cr) >= 4:
                rings.append(cr)
            elif i == 0:
                rings = []
                break  # shell gone → whole polygon is outside the clip box
        if rings:
            parts.append(Geom(POLYGON, rings=rings))
    if not parts:
        return Geom(POLYGON)
    if len(parts) == 1:
        return parts[0]
    return Geom(MULTIPOLYGON, parts=parts)


def _env_covers(outer, inner) -> bool:
    return (outer[0] <= inner[0] and outer[1] <= inner[1]
            and outer[2] >= inner[2] and outer[3] >= inner[3])


def _n_vertices(g: Geom) -> int:
    return sum(len(r) for r in _rings_of(g))


def maybe_clip_inputs(ga: Geom, gb: Geom, op: str,
                      min_vertices: int = 16) -> tuple[Geom, Geom]:
    """Clip whichever inputs benefit; identity when clipping cannot help.

    The cheap size check runs BEFORE the O(n) robust-envelope scan so the
    common small-geometry case (every per-pair corpus/UDF overlay) pays
    nearly nothing."""
    na, nb = _n_vertices(ga), _n_vertices(gb)
    if max(na, nb) <= min_vertices:
        return ga, gb
    if not (_is_polygonal(ga) and _is_polygonal(gb)):
        return ga, gb
    env = clipping_envelope(ga, gb, op)
    if env is None:
        return ga, gb
    out = []
    for g, n in ((ga, na), (gb, nb)):
        if n > min_vertices and not _env_covers(env, g.envelope()):
            out.append(clip_polygonal(g, env))
        else:
            out.append(g)
    return out[0], out[1]


def _n_poly_vertices(g: Geom) -> int:
    n = 0
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            for r in leaf.rings:
                n += len(r)
    return n


def subdivide(g: Geom, max_vertices: int = 128) -> list[Geom]:
    """PostGIS ``ST_Subdivide`` analog: recursively halve a polygonal
    geometry along its envelope's longer axis (Sutherland–Hodgman clip to
    each half, ``clip_ring``) until every piece carries at most
    ``max_vertices`` vertices.

    The use case is the same as PostGIS's: pre-split oversized polygons so
    a distributed join's per-pair refine work is bounded — a
    100k-vertex coastline polygon becomes many small pieces that each
    land in few tiles and prepare cheaply (pairs with
    ``kernels/adaptive.py``'s multi-level cover, which bounds the COVER
    size the same way this bounds the VERTEX count).

    Area is conserved exactly up to float rounding (pieces partition the
    polygon; shared cut edges are traversed once in each piece).
    ``max_vertices`` must be ≥ 8 (a clipped quadrant of a ring needs
    headroom, mirroring PostGIS's ≥ 5 rule).
    """
    if max_vertices < 8:
        raise ValueError("max_vertices must be >= 8")
    out: list[Geom] = []
    stack: list[tuple[Geom, int]] = [(g, 0)]
    while stack:
        p, depth = stack.pop()
        if p.is_empty:
            continue
        if _n_poly_vertices(p) <= max_vertices or depth >= 32:
            out.extend(leaf for leaf in p.flatten() if leaf.gtype == POLYGON)
            continue
        minx, miny, maxx, maxy = p.envelope()
        if maxx - minx >= maxy - miny:
            midx = (minx + maxx) / 2.0
            halves = ((minx, miny, midx, maxy), (midx, miny, maxx, maxy))
        else:
            midy = (miny + maxy) / 2.0
            halves = ((minx, miny, maxx, midy), (minx, midy, maxx, maxy))
        for env in halves:
            stack.append((clip_polygonal(p, np.asarray(env)), depth + 1))
    return out
