"""MinimumDiameter / MinimumAreaRectangle vs reference NUnit fixtures."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.caliper import (  # noqa: E402
    minimum_area_rectangle,
    minimum_diameter,
)
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402


@pytest.mark.parametrize("wkt,c0,c1", [
    ("POINT (0 240)", (0, 240), (0, 240)),
    ("LINESTRING (0 240, 220 240)", (0, 240), (0, 240)),
    ("POLYGON ((0 240, 220 240, 220 0, 0 0, 0 240))", (220, 240), (0, 240)),
    ("POLYGON ((0 240, 160 140, 220 0, 0 0, 0 240))",
     (185.86206896551724, 79.65517241379311), (0, 0)),
    ("LINESTRING ( 39 119, 162 197, 135 70, 95 35, 33 66, 111 82, 97 131, "
     "48 160, -4 182, 57 195, 94 202, 90 174, 75 134, 47 114, 0 100, 59 81, "
     "123 60, 136 43, 163 75, 145 114, 93 136, 92 159, 105 175 )",
     (64.46262341325811, 196.41184767277855), (95, 35)),
])
def test_minimum_diameter(wkt, c0, c1):
    _w, wp, bp = minimum_diameter(wkt_loads(wkt))
    ends = {tuple(round(v, 9) for v in wp), tuple(round(v, 9) for v in bp)}
    expect = {tuple(round(float(v), 9) for v in c0), tuple(round(float(v), 9) for v in c1)}
    assert ends == expect


@pytest.mark.parametrize("wkt,expected", [
    ("LINESTRING (1 1, 1 1)", "POINT (1 1)"),
    ("LINESTRING (1 1, 3 1, 5 1, 7 1)", "LINESTRING (1 1, 7 1)"),
    ("LINESTRING (1 1, 1 4, 1 7, 1 9)", "LINESTRING (1 1, 1 9)"),
    ("POLYGON ((0 240, 220 240, 220 0, 0 0, 0 240))",
     "POLYGON ((0 0, 220 0, 220 240, 0 240, 0 0))"),
])
def test_minimum_area_rectangle(wkt, expected):
    got = minimum_area_rectangle(wkt_loads(wkt))
    assert equals_normalized(got, wkt_loads(expected))


def test_minimum_area_rectangle_rotated():
    from nettopologysuite_spark.kernels.measures import area

    # 45°-rotated square of diagonal 2: min rect is the square itself (area 2)
    g = wkt_loads("POLYGON ((0 1, 1 0, 2 1, 1 2, 0 1))")
    rect = minimum_area_rectangle(g)
    assert area(rect) == pytest.approx(2.0)
