"""Overlay input clipping: results must be IDENTICAL with and without the
clip optimization (the whole point of the robust clip envelope), and
clip_ring must behave as the reference RingClipper on basic shapes."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import nettopologysuite_spark.kernels.clip as clipmod  # noqa: E402
from nettopologysuite_spark.kernels.clip import clip_ring  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402
from nettopologysuite_spark.kernels.overlay import (  # noqa: E402
    DIFFERENCE,
    INTERSECTION,
    overlay,
)
from nettopologysuite_spark.kernels.shapes import sine_star  # noqa: E402


def _overlay_unclipped(a, b, op):
    orig = clipmod.maybe_clip_inputs
    clipmod.maybe_clip_inputs = lambda x, y, o, min_vertices=16: (x, y)
    try:
        return overlay(a, b, op)
    finally:
        clipmod.maybe_clip_inputs = orig


def test_clipped_overlay_equals_unclipped():
    rng = np.random.default_rng(3)
    a = sine_star(100, 100, 200, 300, 6, 0.3)
    for t in range(30):
        cx, cy = rng.uniform(0, 200, 2)
        b = sine_star(cx, cy, 12, 14, 6, 0.3)
        for op in (INTERSECTION, DIFFERENCE):
            got = overlay(a, b, op)
            exp = _overlay_unclipped(a, b, op)
            assert equals_normalized(got, exp), (t, op, cx, cy)


def test_clip_ring_basics():
    env = (0.0, 0.0, 10.0, 10.0)
    # square fully inside → unchanged
    sq = np.array([(2, 2), (8, 2), (8, 8), (2, 8), (2, 2)], dtype=float)
    out = clip_ring(sq, env)
    assert np.array_equal(out, sq)
    # square fully outside (left of box) → empty
    far = sq - np.array([100.0, 0.0])
    assert len(clip_ring(far, env)) == 0
    # square straddling the right edge → clipped at x=10
    straddle = np.array([(8, 2), (14, 2), (14, 8), (8, 8), (8, 2)], dtype=float)
    out = clip_ring(straddle, env)
    assert len(out) >= 5 and out[:, 0].max() == 10.0 and out[:, 0].min() == 8.0
    # huge ring CONTAINING the box → clips to the box itself
    huge = np.array([(-50, -50), (60, -50), (60, 60), (-50, 60), (-50, -50)],
                    dtype=float)
    out = clip_ring(huge, env)
    assert out[:, 0].min() == 0.0 and out[:, 0].max() == 10.0
    assert out[:, 1].min() == 0.0 and out[:, 1].max() == 10.0


def test_clipped_overlay_adversarial_cases():
    """Shared linework, hole-crossing and far-multipart cases — the shapes
    most likely to expose a clip-envelope bug — must stay identical to the
    unclipped pipeline."""
    from nettopologysuite_spark.kernels.geom import MULTIPOLYGON, multi, polygon
    from nettopologysuite_spark.kernels.shapes import circle

    rng = np.random.default_rng(17)
    a = sine_star(50, 50, 80, 200, 6, 0.3)
    averts = a.rings[0]
    cases = []
    for t in range(4):  # B snapped to A's own vertices (shared linework)
        i = int(rng.integers(0, len(averts) - 4))
        quad = np.array([averts[i], averts[i + 1], averts[i + 2],
                         averts[i + 2] + [5, 5], averts[i]])
        cases.append((a, polygon(quad)))
    mp = multi(MULTIPOLYGON, [circle(20, 20, 30, 60), circle(500, 500, 30, 60)])
    for t in range(3):  # far multipart A: clipping drops whole parts
        cx, cy = rng.uniform(0, 60, 2)
        cases.append((mp, circle(cx, cy, 14, 24)))
    shell = circle(50, 50, 80, 120).rings[0]
    hole = circle(50, 50, 30, 60).rings[0][::-1]
    ah = polygon(shell, [hole])
    for t in range(3):  # A with hole; B inside / across the hole boundary
        cx, cy = rng.uniform(25, 75, 2)
        cases.append((ah, circle(cx, cy, 12, 20)))
    for ga, gb in cases:
        for op in (INTERSECTION, DIFFERENCE):
            got = overlay(ga, gb, op)
            exp = _overlay_unclipped(ga, gb, op)
            assert equals_normalized(got, exp)


def test_difference_with_far_b_unaffected():
    """B entirely outside A's envelope: difference(A, B) == A."""
    a = sine_star(10, 10, 10, 64, 6, 0.3)
    b = sine_star(1000, 1000, 10, 64, 6, 0.3)
    got = overlay(a, b, DIFFERENCE)
    assert equals_normalized(got, _overlay_unclipped(a, b, DIFFERENCE))


def test_subdivide_invariants():
    """ST_Subdivide analog: piece vertex bound, area conservation, piece
    containment in the original envelope, non-polygonal parts dropped."""
    import numpy as np

    from nettopologysuite_spark.engine.derive import nation_octagon_geom
    from nettopologysuite_spark.kernels.clip import _n_poly_vertices, subdivide
    from nettopologysuite_spark.kernels.densify import densify
    from nettopologysuite_spark.kernels.measures import area

    for nk in (0, 1, 7):
        g = densify(nation_octagon_geom(nk), 0.1)
        total = area(g)
        pieces = subdivide(g, 32)
        assert len(pieces) > 4
        env = np.asarray(g.envelope())
        for p in pieces:
            assert _n_poly_vertices(p) <= 32
            pe = np.asarray(p.envelope())
            assert pe[0] >= env[0] - 1e-9 and pe[2] <= env[2] + 1e-9
            assert pe[1] >= env[1] - 1e-9 and pe[3] <= env[3] + 1e-9
        assert abs(sum(area(p) for p in pieces) - total) < 1e-9
    # already-small polygon: returned unchanged (one piece)
    g = nation_octagon_geom(0)
    ps = subdivide(g, 32)
    assert len(ps) == 1 and abs(area(ps[0]) - area(g)) == 0.0
    # guard
    import pytest

    with pytest.raises(ValueError):
        subdivide(g, 4)


def test_subdivide_polygon_with_hole():
    from nettopologysuite_spark.kernels.clip import subdivide
    from nettopologysuite_spark.kernels.densify import densify
    from nettopologysuite_spark.kernels.geom import wkt_loads
    from nettopologysuite_spark.kernels.measures import area

    g = densify(wkt_loads(
        "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0),"
        " (10 10, 30 10, 30 30, 10 30, 10 10))"), 0.5)
    total = area(g)
    pieces = subdivide(g, 24)
    assert len(pieces) > 8
    assert abs(sum(area(p) for p in pieces) - total) < 1e-8
