"""PolygonHullSimplifier vs the reference's PolygonHullSimplifierTest."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402
from nettopologysuite_spark.kernels.polygon_hull import polygon_hull  # noqa: E402


@pytest.mark.parametrize("wkt,outer,frac,expected", [
    ("POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40, 50 50, 60 70, 30 90))",
     True, 0,
     "POLYGON ((30 90, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))"),
    ("POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40, 50 50, 60 70, 30 90))",
     True, 0.8,
     "POLYGON ((30 90, 60 70, 80 80, 90 30, 70 10, 40 10, 10 40, 30 90))"),
    ("POLYGON ((10 90, 40 60, 20 40, 40 20, 70 50, 40 30, 30 40, 60 70, 50 90, 90 90, 90 10, 10 10, 10 90))",
     True, 0.5,
     "POLYGON ((10 90, 50 90, 90 90, 90 10, 10 10, 10 90))"),
    ("POLYGON ((10 90, 40 60, 20 40, 40 20, 70 50, 40 30, 30 40, 60 70, 50 90, 90 90, 90 10, 10 10, 10 90))",
     True, 0.6,
     "POLYGON ((10 90, 40 60, 60 70, 50 90, 90 90, 90 10, 10 10, 10 90))"),
    ("POLYGON ((10 10, 10 90, 90 90, 90 50, 90 10, 50 10, 10 10))", True, 0.4,
     "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))"),
    ("POLYGON ((11 14, 2 31, 18 29, 25 17, 38 16, 29 5, 19 11, 11 0, 0 10, 11 14))",
     False, 0.5,
     "POLYGON ((19 11, 29 5, 18 29, 2 31, 19 11))"),
    ("POLYGON ((50 100, 30 70, 0 50, 30 30, 50 0, 70 30, 100 50, 70 70, 50 100), "
     "(50 75, 40 50, 10 50, 36 35, 50 5, 65 35, 90 50, 60 60, 50 75))", True, 0.1,
     "POLYGON ((50 100, 100 50, 50 0, 0 50, 50 100), (36 35, 50 5, 60 60, 36 35))"),
])
def test_polygon_hull_by_vertex_fraction(wkt, outer, frac, expected):
    got = polygon_hull(wkt_loads(wkt), outer, vertex_frac=frac)
    assert equals_normalized(got, wkt_loads(expected))


def test_outer_hull_contains_input():
    from nettopologysuite_spark.kernels.relate import relate_predicate

    g = wkt_loads(
        "POLYGON ((30 90, 10 40, 40 10, 70 10, 90 30, 80 80, 70 40, 30 40, 50 50, 60 70, 30 90))"
    )
    hull = polygon_hull(g, True, vertex_frac=0)
    assert relate_predicate(hull, g, "covers")
    inner = polygon_hull(g, False, vertex_frac=0.5)
    assert relate_predicate(g, inner, "covers")
