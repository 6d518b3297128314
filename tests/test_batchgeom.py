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


# ---------------------------------------------------------------------------
# vectorized covers / contains
# ---------------------------------------------------------------------------

from nettopologysuite_spark.kernels.batchgeom import (  # noqa: E402
    batch_covers_right,
    batch_covers_rights,
)
from nettopologysuite_spark.kernels.predicates import (  # noqa: E402
    contains as p_contains,
)
from nettopologysuite_spark.kernels.predicates import covers as p_covers  # noqa: E402


def test_batch_covers_rights_matches_scalar_kernel():
    """covers/contains(one polygonal left, batch of rights) must agree with
    the scalar fast kernels on random mixed batches (points, lines, rects,
    octagons, holed polygons) against rect / octagon / holed lefts."""
    rng = np.random.default_rng(23)
    total = 0
    for trial in range(30):
        rights = [_rand_geom(rng, rng.integers(0, 4)) for _ in range(40)]
        if trial % 3 == 0:
            rights += [_poly_with_hole(rng) for _ in range(4)]
        left = _poly_with_hole(rng) if trial % 4 == 0 else _rand_geom(rng, 2 + trial % 2)
        blobs = [wkb_dumps(g) for g in rights]
        gb = GeomBatch.from_wkb(blobs)
        idx = np.arange(len(rights), dtype=np.int64)
        geom_of = lambda k: rights[k]  # noqa: E731
        got_cov = batch_covers_rights(gb, idx, left)
        got_con = batch_covers_rights(gb, idx, left, contains=True, geom_of=geom_of)
        for i, g in enumerate(rights):
            assert bool(got_cov[i]) == p_covers(left, g), (trial, i, g.type_name)
            assert bool(got_con[i]) == p_contains(left, g), (trial, i, g.type_name)
            total += 2
    assert total > 2000


def test_batch_covers_right_matches_scalar_kernel():
    """covers/contains(batch of lefts, one polygonal right): the pack-join
    orientation."""
    rng = np.random.default_rng(31)
    total = 0
    for trial in range(30):
        lefts = [_rand_geom(rng, rng.integers(0, 4)) for _ in range(40)]
        if trial % 3 == 0:
            lefts += [_poly_with_hole(rng) for _ in range(4)]
        # right polygonal (the batch path's precondition), varied sizes so
        # both big-covers-small and never-covers shapes occur
        right = _rand_geom(rng, 2 + trial % 2)
        gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
        idx = np.arange(len(lefts), dtype=np.int64)
        got_cov = batch_covers_right(gb, idx, right)
        got_con = batch_covers_right(gb, idx, right, contains=True)
        for i, g in enumerate(lefts):
            assert bool(got_cov[i]) == p_covers(g, right), (trial, i, g.type_name)
            assert bool(got_con[i]) == p_contains(g, right), (trial, i, g.type_name)
            total += 2
    assert total > 2000


def test_batch_covers_exact_edge_cases():
    a = polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    cases = [
        # (right, covers, contains)
        (polygon([(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)]), True, True),
        (polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]), True, True),
        (polygon([(5, 5), (15, 5), (15, 15), (5, 15), (5, 5)]), False, False),
        (point(5, 5), True, True),
        (point(0, 5), True, False),        # on boundary: covered, not contained
        (point(11, 5), False, False),
        (linestring([(0, 0), (10, 10)]), True, True),
        (linestring([(0, 0), (0, 10)]), True, False),   # along boundary
        (linestring([(-1, 5), (11, 5)]), False, False),
        (polygon([(-1, -1), (11, -1), (11, 11), (-1, 11), (-1, -1)]), False, False),
    ]
    gb = GeomBatch.from_wkb([wkb_dumps(g) for g, _, _ in cases])
    idx = np.arange(len(cases), dtype=np.int64)
    geoms = [g for g, _, _ in cases]
    cov = batch_covers_rights(gb, idx, a)
    con = batch_covers_rights(gb, idx, a, contains=True, geom_of=lambda k: geoms[k])
    for (g, ec, en), gc, gn in zip(cases, cov, con):
        assert bool(gc) == ec == p_covers(a, g), g.type_name
        assert bool(gn) == en == p_contains(a, g), g.type_name
    # flipped orientation: which of these geometries cover/contain a small rect
    b = polygon([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)])
    cov2 = batch_covers_right(gb, idx, b)
    con2 = batch_covers_right(gb, idx, b, contains=True)
    for g, gc, gn in zip(geoms, cov2, con2):
        assert bool(gc) == p_covers(g, b), g.type_name
        assert bool(gn) == p_contains(g, b), g.type_name


def test_batch_covers_hole_boundary_residue():
    """contains where every vertex/midpoint of b sits ON a's boundary —
    the interior-point residue path must decide via geom_of."""
    a = polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    b = polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])  # identical
    gb = GeomBatch.from_wkb([wkb_dumps(b)])
    got = batch_covers_rights(gb, np.array([0]), a, contains=True,
                              geom_of=lambda k: b)
    assert bool(got[0]) == p_contains(a, b) is True


def test_batch_within_distance_matches_facet_distance():
    """batch_within_distance vs the scalar facet-distance kernel on random
    mixed batches at several thresholds (ties resolved identically: both
    evaluate the same squared forms)."""
    from nettopologysuite_spark.kernels.batchgeom import batch_within_distance
    from nettopologysuite_spark.kernels.facetdist import facet_distance

    rng = np.random.default_rng(41)
    total = 0
    for trial in range(25):
        lefts = [_rand_geom(rng, rng.integers(0, 4)) for _ in range(30)]
        if trial % 3 == 0:
            lefts += [_poly_with_hole(rng) for _ in range(3)]
        right = _rand_geom(rng, rng.integers(0, 4)) if trial % 4 else _poly_with_hole(rng)
        gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
        idx = np.arange(len(lefts), dtype=np.int64)
        for d in (0.5, 2.0, 6.0):
            got = batch_within_distance(gb, idx, right, d)
            for i, g in enumerate(lefts):
                exp = facet_distance(g, right) <= d
                assert bool(got[i]) == exp, (trial, i, d, g.type_name)
                total += 1
    assert total > 2000


def test_batch_distance2_matches_facet_distance():
    """batch_distance2 vs the scalar facet-distance kernel (values agree to
    float tolerance; zeros exactly on intersecting pairs)."""
    from nettopologysuite_spark.kernels.batchgeom import batch_distance2
    from nettopologysuite_spark.kernels.facetdist import facet_distance

    rng = np.random.default_rng(53)
    total = 0
    for trial in range(25):
        lefts = [_rand_geom(rng, rng.integers(0, 4)) for _ in range(30)]
        right = _rand_geom(rng, rng.integers(0, 4)) if trial % 4 else _poly_with_hole(rng)
        gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
        got = batch_distance2(gb, np.arange(len(lefts), dtype=np.int64), right)
        for i, g in enumerate(lefts):
            exp = facet_distance(g, right)
            if exp == 0.0:
                assert got[i] == 0.0, (trial, i)
            else:
                assert abs(np.sqrt(got[i]) - exp) < 1e-9 * max(1.0, exp), (trial, i)
            total += 1
    assert total > 700


# ---------------------------------------------------------------------------
# vectorized interior/interior (DE-9IM II) + the composed IM predicates
# ---------------------------------------------------------------------------

from nettopologysuite_spark.kernels.batchgeom import (  # noqa: E402
    batch_interiors_intersect,
)


def _snapped_rect(rng):
    """Integer-corner rect (extents 1-3 × 1-2): edge/corner contact —
    touches — is common between pairs, mirroring the join workload."""
    x1, y1 = rng.integers(0, 20, 2).astype(float)
    return polygon([(x1, y1), (x1 + 1 + rng.integers(0, 3), y1),
                    (x1 + 1 + rng.integers(0, 3), y1 + 1 + rng.integers(0, 2)),
                    (x1, y1 + 1 + rng.integers(0, 2)), (x1, y1)])


def _rand_poly(rng, trial):
    k = (trial + rng.integers(0, 4)) % 4
    if k == 0:
        return _poly_with_hole(rng)
    if k == 1:
        return _snapped_rect(rng)
    return _rand_geom(rng, 2 + k % 2)


def test_batch_interiors_intersect_matches_relate_kernel():
    """II(areal, areal) ⇔ intersects ∧ ¬touches (the relate kernel's own
    definition of touches) over random holed / snapped / octagon pairs."""
    rng = np.random.default_rng(61)
    total = hits = 0
    for trial in range(40):
        lefts = [_rand_poly(rng, trial) for _ in range(30)]
        right = _rand_poly(rng, trial)
        gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
        got = batch_interiors_intersect(
            gb, np.arange(len(lefts), dtype=np.int64), right,
            geom_of=lambda k: lefts[k],
        )
        for i, g in enumerate(lefts):
            exp = (evaluate_predicate("intersects", g, right)
                   and not evaluate_predicate("touches", g, right))
            assert bool(got[i]) == exp, (trial, i, g.wkt(), right.wkt())
            total += 1
            hits += bool(exp)
    assert total > 1000 and hits > 50


def test_batched_im_compositions_match_scalar_predicates():
    """touches = intersects ∧ ¬II; overlaps = II ∧ ¬covers either way;
    equalstopo = covers both ways — the compositions pair_refine_udf /
    _batched_pair_eval run for pure-polygonal pairs, vs the scalar
    relate kernel."""
    rng = np.random.default_rng(67)
    counts = {"touches": 0, "overlaps": 0, "equalstopo": 0}
    for trial in range(30):
        lefts = [_rand_poly(rng, trial) for _ in range(25)]
        if trial % 5 == 0:
            lefts += [lefts[0]]  # planted topological equal
        right = lefts[0] if trial % 5 == 0 else _rand_poly(rng, trial)
        if trial % 5 == 2:
            # planted touch pairs: snapped right + edge/corner neighbours
            x1, y1 = float(rng.integers(0, 20)), float(rng.integers(0, 20))
            w, h = 1 + int(rng.integers(0, 3)), 1 + int(rng.integers(0, 2))
            right = polygon([(x1, y1), (x1 + w, y1), (x1 + w, y1 + h),
                             (x1, y1 + h), (x1, y1)])
            lefts += [
                polygon([(x1 + w, y1), (x1 + w + 2, y1), (x1 + w + 2, y1 + 1),
                         (x1 + w, y1 + 1), (x1 + w, y1)]),          # edge
                polygon([(x1 + w, y1 + h), (x1 + w + 1, y1 + h),
                         (x1 + w + 1, y1 + h + 1), (x1 + w, y1 + h + 1),
                         (x1 + w, y1 + h)]),                         # corner
            ]
        gb = GeomBatch.from_wkb([wkb_dumps(g) for g in lefts])
        idx = np.arange(len(lefts), dtype=np.int64)
        geom_of = lambda k: lefts[k]  # noqa: E731
        inter = batch_intersects(gb, idx, right)
        ii = batch_interiors_intersect(gb, idx, right, geom_of=geom_of)
        cov_lr = batch_covers_right(gb, idx, right)      # left covers right
        cov_rl = batch_covers_rights(gb, idx, right)     # right covers left
        got = {
            "touches": inter & ~ii,
            "overlaps": ii & ~cov_lr & ~cov_rl,
            "equalstopo": cov_lr & cov_rl,
        }
        for pred, vec in got.items():
            for i, g in enumerate(lefts):
                exp = evaluate_predicate(pred, g, right)
                assert bool(vec[i]) == exp, (pred, trial, i, g.wkt(), right.wkt())
                counts[pred] += bool(exp)
    assert all(v > 5 for v in counts.values()), counts


def test_batch_interiors_intersect_edge_cases():
    a = polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    cases = [
        (polygon([(4, 0), (8, 0), (8, 4), (4, 4), (4, 0)]), False),   # edge touch
        (polygon([(4, 4), (8, 4), (8, 8), (4, 8), (4, 4)]), False),   # corner touch
        (polygon([(2, 2), (6, 2), (6, 6), (2, 6), (2, 2)]), True),    # overlap
        (polygon([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)]), True),    # inside
        (polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]), True),    # equal
        (polygon([(9, 9), (10, 9), (10, 10), (9, 10), (9, 9)]), False),  # disjoint
        # hole-filling pair: b exactly fills a hole of a-with-hole below
    ]
    geoms = [g for g, _ in cases]
    gb = GeomBatch.from_wkb([wkb_dumps(g) for g in geoms])
    got = batch_interiors_intersect(
        gb, np.arange(len(geoms), dtype=np.int64), a,
        geom_of=lambda k: geoms[k])
    assert list(got) == [e for _, e in cases]
    # hole-filling: donut vs its exact hole — boundaries coincide, interiors
    # disjoint (touches), the residue pass must NOT claim II
    donut = polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                    [[(3, 3), (3, 7), (7, 7), (7, 3), (3, 3)]])
    plug = polygon([(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)])
    gb2 = GeomBatch.from_wkb([wkb_dumps(plug)])
    got2 = batch_interiors_intersect(gb2, np.array([0]), donut,
                                     geom_of=lambda k: plug)
    assert not bool(got2[0])
    assert evaluate_predicate("touches", plug, donut)
