"""Construction kernels vs the reference's NUnit fixtures
(MinimumBoundingCircleTest.cs, MaximumInscribedCircleTest.cs,
LargestEmptyCircleTest.cs), plus affine / linear-referencing / Fréchet."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.construct import (  # noqa: E402
    discrete_frechet,
    largest_empty_circle,
    maximum_inscribed_circle,
    minimum_bounding_circle,
)
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402


@pytest.mark.parametrize("wkt,cx,cy,r", [
    ("POINT (10 10)", 10, 10, 0),
    ("MULTIPOINT ((10 10), (20 20))", 15, 15, 7.0710678118654755),
    ("MULTIPOINT ((10 10), (20 20), (30 30))", 20, 20, 14.142135623730951),
    ("MULTIPOINT ((10 10), (20 20), (10 20))", 15, 15, 7.0710678118654755),
    ("POLYGON ((100 100, 200 100, 150 90, 100 100))", 150, 100, 50),
    ("MULTIPOINT ((10 10), (20 20), (10 20), (15 19))", 15, 15, 7.0710678118654755),
    ("POLYGON ((26426 65078, 26531 65242, 26096 65427, 26075 65136, 26426 65078))",
     26284.84180271327, 65267.114509082545, 247.4360455914027),
])
def test_minimum_bounding_circle(wkt, cx, cy, r):
    got = minimum_bounding_circle(wkt_loads(wkt))
    assert got is not None
    assert got[0] == pytest.approx(cx, abs=1e-6)
    assert got[1] == pytest.approx(cy, abs=1e-6)
    assert got[2] == pytest.approx(r, abs=1e-6)


@pytest.mark.parametrize("wkt,tol,cx,cy,r", [
    ("POLYGON ((100 200, 200 200, 200 100, 100 100, 100 200))", 0.001, 150, 150, 50),
    ("POLYGON ((150 250, 50 150, 150 50, 250 150, 150 250))", 0.001, 150, 150, 70.71),
    ("POLYGON ((100 0, 200 200, 300 200, 300 100, 100 0))", 0.01, 238.19, 138.19, 61.80),
    ("POLYGON ((100 0, 200 200, 300 200, 300 100, 100 0), (200 150, 200 100, 260 100, 200 150))",
     0.01, 257.47, 157.47, 42.52),
    ("MULTIPOLYGON (((150 200, 100 150, 150 100, 250 150, 150 200)), "
     "((400 250, 300 150, 400 50, 560 150, 400 250)))", 0.01, 411.38, 149.99, 78.75),
])
def test_maximum_inscribed_circle(wkt, tol, cx, cy, r):
    x, y, rad = maximum_inscribed_circle(wkt_loads(wkt), tol)
    # the reference's CheckCircle asserts center within 2*tol-ish and radius
    assert x == pytest.approx(cx, abs=max(2 * tol, 0.02))
    assert y == pytest.approx(cy, abs=max(2 * tol, 0.02))
    assert rad == pytest.approx(r, abs=max(2 * tol, 0.02))


def test_maximum_inscribed_circle_degenerate_no_hang():
    for wkt in [
        "POLYGON ((100 100, 200 200, 100 100, 100 100))",
        "POLYGON((1 2, 1 2, 1 2, 1 2, 3 2, 1 2))",
    ]:
        maximum_inscribed_circle(wkt_loads(wkt), 0.01)  # must terminate


@pytest.mark.parametrize("wkt,tol,cx,cy,r", [
    ("MULTIPOINT ((100 100), (100 200), (200 200), (200 100))", 0.01, 150, 150, 70.71),
    ("MULTIPOINT ((100 100), (300 100), (150 50))", 0.01, 216.66, 99.99, 83.33),
    ("MULTIPOINT ((100 100), (300 100), (200 250))", 0.01, 200.00, 141.66, 108.33),
    ("MULTILINESTRING ((50 100, 150 50), (250 50, 350 100), (350 150, 250 200), "
     "(50 150, 150 200))", 0.01, 200, 125, 90.13),
])
def test_largest_empty_circle(wkt, tol, cx, cy, r):
    from nettopologysuite_spark.kernels.hull import convex_hull

    obstacles = wkt_loads(wkt)
    boundary = convex_hull(obstacles)
    x, y, rad = largest_empty_circle(obstacles, boundary, tol)
    assert x == pytest.approx(cx, abs=0.05)
    assert y == pytest.approx(cy, abs=0.05)
    assert rad == pytest.approx(r, abs=0.05)


def test_affine_transformations():
    from nettopologysuite_spark.kernels.affine import AffineTransformation as AT

    g = wkt_loads("POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))")
    t = AT.translation(10, 5).transform(g)
    assert t.rings[0][0].tolist() == [10, 5]
    r = AT.rotation(math.pi / 2).transform(wkt_loads("POINT (1 0)"))
    assert np.allclose(r.coords[0], [0, 1])
    s = AT.scale_about(2, 3, 1, 1).transform(wkt_loads("POINT (2 2)"))
    assert np.allclose(s.coords[0], [3, 4])
    # compose: B first, then A
    ab = AT.translation(1, 0).compose_with(AT.scale_about(2, 2))
    assert np.allclose(ab.transform(wkt_loads("POINT (1 1)")).coords[0], [3, 2])
    # reflection about y=x swaps coordinates
    refl = AT.reflection(0, 0, 1, 1).transform(wkt_loads("POINT (3 1)"))
    assert np.allclose(refl.coords[0], [1, 3])


def test_linear_referencing_roundtrip():
    from nettopologysuite_spark.kernels.linearref import (
        extract_line,
        extract_point,
        index_of,
        locate_points,
        total_length,
    )

    g = wkt_loads("LINESTRING (0 0, 10 0, 10 10)")
    assert total_length(g) == 20
    assert extract_point(g, 5) == (5, 0)
    assert extract_point(g, 15) == (10, 5)
    assert extract_point(g, -5) == (10, 5)  # negative = from end
    assert extract_point(g, 999) == (10, 10)  # clamped
    sub = extract_line(g, 5, 15)
    assert sub.coords.tolist() == [[5, 0], [10, 0], [10, 5]]
    assert index_of(g, 10, 5) == 15
    assert index_of(g, 7, 3) == pytest.approx(7)  # projects onto y=0 leg
    pts = locate_points(g, np.array([0.0, 5.0, 15.0, -5.0, 25.0]))
    assert np.allclose(pts, [[0, 0], [5, 0], [10, 5], [10, 5], [10, 10]])


def test_discrete_frechet():
    a = wkt_loads("LINESTRING (0 0, 10 0)")
    b = wkt_loads("LINESTRING (0 3, 10 3)")
    assert discrete_frechet(a, b) == pytest.approx(3.0)
    # DISCRETE Fréchet: the middle vertex (5 4) must couple with a vertex of
    # a, so the distance is hypot(5, 4), not the continuous-Fréchet 4.0
    c = wkt_loads("LINESTRING (0 0, 5 4, 10 0)")
    assert discrete_frechet(a, c) == pytest.approx(math.hypot(5, 4))
    # symmetric
    assert discrete_frechet(c, a) == discrete_frechet(a, c)
