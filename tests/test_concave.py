"""Concave hull vs the reference's ConcaveHullTest.cs fixtures."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.concave import (  # noqa: E402
    concave_hull_by_length,
    concave_hull_by_length_ratio,
)
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402


@pytest.mark.parametrize("wkt,length,expected", [
    ("MULTIPOINT EMPTY", 70, "POLYGON EMPTY"),
    ("MULTIPOINT ((10 10), (10 10))", 70, "POINT (10 10)"),
    ("LINESTRING (10 10, 20 20, 30 30)", 70, "LINESTRING (10 10, 30 30)"),
    ("MULTIPOINT ((10 10), (90 10), (30 70))", 70,
     "POLYGON ((10 10, 30 70, 90 10, 10 10))"),
    ("MULTIPOINT ((10 10), (90 10), (30 70), (70 70), (50 60))", 70,
     "POLYGON ((30 70, 70 70, 90 10, 50 60, 10 10, 30 70))"),
    ("MULTIPOINT ((10 10), (90 10), (70 70), (50 60), (50 90), (40 70), (30 30))", 0,
     "POLYGON ((10 10, 40 70, 50 90, 70 70, 90 10, 50 60, 30 30, 10 10))"),
])
def test_concave_hull_by_length(wkt, length, expected):
    got = concave_hull_by_length(wkt_loads(wkt), length)
    assert equals_normalized(got, wkt_loads(expected))


def test_concave_hull_ratio_one_is_convex():
    from nettopologysuite_spark.kernels.hull import convex_hull
    from nettopologysuite_spark.kernels.measures import area
    from nettopologysuite_spark.kernels.overlay import overlay

    g = wkt_loads(
        "MULTIPOINT ((10 10), (90 10), (70 70), (50 60), (50 90), (40 70), (30 30))"
    )
    got = concave_hull_by_length_ratio(g, 1.0)
    # same region as the convex hull (the concave trace keeps collinear
    # boundary vertices that ConvexHull drops — compare by symdifference)
    assert area(overlay(got, convex_hull(g), "symdifference")) == 0.0


def test_concave_hull_contains_all_points():
    import numpy as np

    from nettopologysuite_spark.kernels.pip import EXTERIOR, PreparedPolygon

    rng = np.random.default_rng(11)
    pts = rng.integers(0, 100, size=(60, 2)).astype(float)
    wkt = "MULTIPOINT (" + ", ".join(f"({x:.0f} {y:.0f})" for x, y in pts) + ")"
    hull = concave_hull_by_length(wkt_loads(wkt), 30)
    prep = PreparedPolygon(hull)
    loc = prep.locate(pts[:, 0], pts[:, 1])
    assert (loc != EXTERIOR).all()
