"""Adaptive multi-resolution polygon cover — the S2 ``RegionCoverer`` /
H3 ``polyfill``-with-compaction analog for this engine's quadtree grid.

A single-level envelope cover (``PolygonPack.cover_rows``) has two costs
that grow with scale: a large polygon explodes into O(area / cell_area)
cover rows, and EVERY candidate pair pays the exact Python refine even when
the point is deep inside the polygon. The adaptive cover fixes both with
the classic quadtree descent (same recursion as the reference's
``Index/Quadtree`` subdivision, applied to coverage instead of indexing):

* start at level 0 (one cell = the whole extent) and subdivide;
* a cell no boundary segment touches is wholly INSIDE (emit, marked
  ``interior`` — candidates here are accepted with NO refine) or wholly
  OUTSIDE (dropped) — decided by one point-in-polygon test of its center;
* a cell the boundary crosses descends, until the finest level (emit as a
  boundary cell — candidates refine exactly) or the ``max_cells`` budget
  stops the frontier early (emit coarse boundary cells; still correct,
  just more refine work — exactly S2's ``max_cells`` trade).

The emitted cells are DISJOINT across levels (a cell is emitted only if no
ancestor was), so a point matches a given polygon through AT MOST ONE cover
row — pair uniqueness needs no dedup. Cover size is O(perimeter · 2^l +
interior compaction) instead of O(area · 4^l): at level 16 a country-sized
polygon keeps a bounded cover where the envelope cover would emit millions
of rows.

Segment pruning during descent mirrors MonotoneChain envelope pruning: each
node carries only the boundary segments that intersect ITS rect (closed,
Liang–Barsky), so a child tests its parent's survivors, not the whole ring
— O(local boundary) per node.

All geometry tests are closed-rect and conservative: ``interior`` is only
claimed when the closed cell rect is provably inside (no boundary segment
intersects it and its center is covered), so points on cell edges are safe
regardless of which half-open cell the floor assignment puts them in.
"""

from __future__ import annotations

import numpy as np

from .cells import Grid
from .geom import Geom, POLYGON
from .pip import PreparedConvex, PreparedPolygon


def boundary_segments(g: Geom) -> np.ndarray:
    """All boundary segments of a polygonal geometry as (n, 4) rows
    (x1, y1, x2, y2), from every ring (shells AND holes) of every part."""
    segs: list[np.ndarray] = []
    for leaf in g.flatten():
        if leaf.gtype == POLYGON:
            for r in leaf.rings:
                if len(r) >= 2:
                    segs.append(np.concatenate([r[:-1], r[1:]], axis=1))
    if not segs:
        return np.empty((0, 4), dtype=np.float64)
    return np.concatenate(segs, axis=0).astype(np.float64, copy=False)


def segs_intersect_rect(segs: np.ndarray, xmin: float, ymin: float,
                        xmax: float, ymax: float) -> np.ndarray:
    """Vectorized segment × closed axis-aligned rect intersection test
    (Liang–Barsky parameter clipping). Includes segments fully inside the
    rect and touching contacts (closed semantics)."""
    if len(segs) == 0:
        return np.zeros(0, dtype=bool)
    x1, y1 = segs[:, 0], segs[:, 1]
    dx = segs[:, 2] - x1
    dy = segs[:, 3] - y1
    t0 = np.zeros(len(segs))
    t1 = np.ones(len(segs))
    ok = np.ones(len(segs), dtype=bool)
    for p, q in ((-dx, x1 - xmin), (dx, xmax - x1),
                 (-dy, y1 - ymin), (dy, ymax - y1)):
        para = p == 0.0
        ok &= ~(para & (q < 0.0))
        safe = np.where(para, 1.0, p)
        t = q / safe
        t0 = np.where(~para & (p < 0.0), np.maximum(t0, t), t0)
        t1 = np.where(~para & (p > 0.0), np.minimum(t1, t), t1)
    return ok & (t0 <= t1)


def adaptive_cover(g: Geom, grid: Grid, max_cells: int = 1024,
                   prep: PreparedPolygon | PreparedConvex | None = None,
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quadtree cover of ``g`` on ``grid`` → (levels, cells, interior).

    ``cells[i]`` is the row-major id AT ``levels[i]`` (iy * 2^l + ix — ids
    collide across levels, so join keys must pair (level, cell)).
    ``interior[i]`` is True when the closed cell rect lies wholly inside
    the polygon (no exact refine needed for candidates in it).

    ``max_cells`` bounds the emitted cover (S2 RegionCoverer's knob): when
    the running cell count would exceed it, the remaining frontier is
    emitted as boundary cells at its current level — a coarser but still
    correct (over-approximating) cover.
    """
    if g.is_empty:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), np.empty(0, dtype=bool)
    segs = boundary_segments(g)
    if prep is None:
        prep = PreparedPolygon(g)
    max_level = grid.level
    w, h = grid.maxx - grid.minx, grid.maxy - grid.miny

    out_lv: list[int] = []
    out_cell: list[int] = []
    out_int: list[bool] = []

    def emit(level: int, ix: int, iy: int, interior: bool) -> None:
        out_lv.append(level)
        out_cell.append(iy * (1 << level) + ix)
        out_int.append(interior)

    # frontier: (level, ix, iy, seg index array into ``segs``)
    stack: list[tuple[int, int, int, np.ndarray]] = [
        (0, 0, 0, np.arange(len(segs), dtype=np.int64))
    ]
    budget_hit = False
    while stack:
        level, ix, iy, sidx = stack.pop()
        nside = 1 << level
        cw, ch = w / nside, h / nside
        if len(sidx) == 0:
            cx = grid.minx + (ix + 0.5) * cw
            cy = grid.miny + (iy + 0.5) * ch
            if bool(prep.covers_points(np.array([cx]), np.array([cy]))[0]):
                emit(level, ix, iy, True)
            continue
        if level == max_level or budget_hit:
            emit(level, ix, iy, False)
            continue
        if len(out_lv) + len(stack) + 4 > max_cells:
            budget_hit = True
            emit(level, ix, iy, False)
            continue
        sub = segs[sidx]
        for ci in (0, 1):
            for cj in (0, 1):
                cix, ciy = ix * 2 + ci, iy * 2 + cj
                ccw, cch = cw / 2.0, ch / 2.0
                bxmin = grid.minx + cix * ccw
                bymin = grid.miny + ciy * cch
                hit = segs_intersect_rect(sub, bxmin, bymin,
                                          bxmin + ccw, bymin + cch)
                stack.append((level + 1, cix, ciy, sidx[hit]))
    return (np.asarray(out_lv, dtype=np.int64),
            np.asarray(out_cell, dtype=np.int64),
            np.asarray(out_int, dtype=bool))
