"""Vectorized batch-intersects kernel vs the exact DE-9IM relate engine:
randomized mixed-type property plus exact touch/containment cases (the
candidate-refine kernel of the spatial joins must agree with the
corpus-verified relate kernel everywhere)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.batchgeom import (  # noqa: E402
    GeomBatch,
    PreparedRight,
    batch_intersects,
)
from nettopologysuite_spark.kernels.geom import (  # noqa: E402
    GEOMETRYCOLLECTION,
    linestring,
    multi,
    point,
    polygon,
    wkb_dumps,
)
from nettopologysuite_spark.kernels.predicates import evaluate_predicate  # noqa: E402


def _rand_geom(rng, kind):
    cx, cy = rng.uniform(0, 20, 2)
    if kind == 0:
        return point(cx, cy)
    if kind == 1:
        pts = np.column_stack([cx + rng.uniform(-3, 3, 4), cy + rng.uniform(-3, 3, 4)])
        return linestring(pts)
    if kind == 2:
        w, h = rng.uniform(0.5, 3, 2)
        return polygon([(cx - w, cy - h), (cx + w, cy - h), (cx + w, cy + h),
                        (cx - w, cy + h), (cx - w, cy - h)])
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    r = rng.uniform(1, 3)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return polygon(np.vstack([ring, ring[:1]]))


def _poly_with_hole(rng):
    cx, cy = rng.uniform(0, 20, 2)
    w, h = rng.uniform(2, 4, 2)
    shell = [(cx - w, cy - h), (cx + w, cy - h), (cx + w, cy + h),
             (cx - w, cy + h), (cx - w, cy - h)]
    hw, hh = w * 0.4, h * 0.4
    hole = [(cx - hw, cy - hh), (cx - hw, cy + hh), (cx + hw, cy + hh),
            (cx + hw, cy - hh), (cx - hw, cy - hh)]
    return polygon(shell, [hole])


def test_batch_intersects_matches_relate_kernel():
    rng = np.random.default_rng(11)
    total = 0
    for trial in range(40):
        lefts = [_rand_geom(rng, rng.integers(0, 4)) for _ in range(30)]
        if trial % 3 == 0:
            lefts += [_poly_with_hole(rng) for _ in range(4)]
        right = _rand_geom(rng, rng.integers(0, 4)) if trial % 4 else _poly_with_hole(rng)
        gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
        got = batch_intersects(gb, np.arange(len(lefts), dtype=np.int64), right)
        for i, g in enumerate(lefts):
            assert bool(got[i]) == evaluate_predicate("intersects", g, right), (
                trial, i, g.type_name, right.type_name)
            total += 1
    assert total > 1000


def test_batch_intersects_touch_cases():
    a = polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    cases = [
        (polygon([(2, 0), (4, 0), (4, 2), (2, 2), (2, 0)]), True),   # shared edge
        (polygon([(2, 2), (3, 3), (2, 4), (1, 3), (2, 2)]), True),   # corner touch
        (polygon([(3, 3), (4, 3), (4, 4), (3, 4), (3, 3)]), False),  # disjoint
        (point(2, 1), True), (point(2.5, 1), False), (point(1, 1), True),
        (linestring([(2, -1), (2, 3)]), True),                       # collinear edge
        (linestring([(-1, -1), (3, 3)]), True),
        (linestring([(5, 5), (6, 6)]), False),
        (polygon([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]), True),
    ]
    gb = GeomBatch.from_wkb([wkb_dumps(g) for g, _ in cases])
    got = batch_intersects(gb, np.arange(len(cases), dtype=np.int64), a)
    for (g, exp), gv in zip(cases, got):
        assert bool(gv) == exp, (g.type_name, exp)


def test_point_leaf_with_sibling_segments_hits_right_line_part():
    """Regression: a POINT leaf inside a left collection that ALSO has
    segment-bearing leaves must still probe the right's line parts (pass 3
    only covers segment-bearing leaves)."""
    left = multi(GEOMETRYCOLLECTION, [
        point(5, 5),
        linestring([(50, 50), (60, 60)]),
    ])
    right = multi(GEOMETRYCOLLECTION, [
        polygon([(100, 100), (110, 100), (110, 110), (100, 110), (100, 100)]),
        linestring([(0, 5), (10, 5)]),
    ])
    gb = GeomBatch.from_wkb([wkb_dumps(left)])
    got = batch_intersects(gb, np.array([0]), right)
    assert bool(got[0]) == evaluate_predicate("intersects", left, right) is True


def test_overlapping_multipolygon_parity_per_leaf():
    """Regression: even-odd parity must be evaluated per polygon LEAF —
    global parity over an (invalid but encountered) overlapping
    multipolygon cancels in the overlap region."""
    from nettopologysuite_spark.kernels.geom import MULTIPOLYGON

    left = multi(MULTIPOLYGON, [
        polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]),
        polygon([(2, 2), (12, 2), (12, 12), (2, 12), (2, 2)]),
    ])
    right = polygon([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)])  # in the overlap
    gb = GeomBatch.from_wkb([wkb_dumps(left)])
    got = batch_intersects(gb, np.array([0]), right)
    assert bool(got[0]) == evaluate_predicate("intersects", left, right) is True


def test_batch_intersects_mixed_right_collection():
    """Right = GC(polygon + line + point): point-only lefts must still hit
    line parts (the pass-1 on-segment branch for segment-free lefts)."""
    right = multi(GEOMETRYCOLLECTION, [
        polygon([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]),
        linestring([(5, 5), (8, 5)]),
        point(10, 10),
    ])
    pr = PreparedRight(right)
    lefts = [
        point(6, 5),        # on the line part only
        point(1, 1),        # inside polygon part
        point(10, 10),      # equals point part
        point(6, 6),        # near nothing
        linestring([(6, 4), (6, 6)]),  # crosses the line part
    ]
    gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
    got = batch_intersects(gb, np.arange(len(lefts), dtype=np.int64), pr)
    assert list(got) == [True, True, True, False, True]
