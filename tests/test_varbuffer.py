"""VariableBuffer vs reference VariableBufferTest fixtures (expected coords
are printed at 2 decimals, so comparison is by symdifference area +
boundary Hausdorff at matching tolerance)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.boundary import boundary  # noqa: E402
from nettopologysuite_spark.kernels.buffer import oriented_hausdorff  # noqa: E402
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.measures import area  # noqa: E402
from nettopologysuite_spark.kernels.overlay import overlay  # noqa: E402
from nettopologysuite_spark.kernels.varbuffer import variable_buffer  # noqa: E402


def _check(wkt, d0, d1, exp_wkt):
    got = variable_buffer(wkt_loads(wkt), d0, d1)
    exp = wkt_loads(exp_wkt)
    if exp.is_empty:
        assert got.is_empty
        return
    sd = area(overlay(got, exp, "symdifference"))
    assert sd <= 1e-3 * area(exp)
    assert oriented_hausdorff(boundary(got), boundary(exp), 0.25) < 0.01


def test_zero_width():
    _check("LINESTRING( 0 0, 6 6, 10 10)", 0, 0, "POLYGON EMPTY")


def test_zero_length():
    _check("LINESTRING( 10 10, 10 10 )", 0, 0, "POLYGON EMPTY")


def test_segment_inverse_dist():
    _check(
        "LINESTRING (100 100, 200 100)", 10, 1,
        "POLYGON ((100 90, 98.05 90.19, 96.17 90.76, 94.44 91.69, 92.93 92.93, "
        "91.69 94.44, 90.76 96.17, 90.19 98.05, 90 100, 90.19 101.95, 90.76 103.83, "
        "91.69 105.56, 92.93 107.07, 94.44 108.31, 96.17 109.24, 98.05 109.81, "
        "100 110, 100.9 109.96, 200.09 101, 200.2 100.98, 200.38 100.92, "
        "200.56 100.83, 200.71 100.71, 200.83 100.56, 200.92 100.38, 200.98 100.2, "
        "201 100, 200.98 99.8, 200.92 99.62, 200.83 99.44, 200.71 99.29, "
        "200.56 99.17, 200.38 99.08, 200.2 99.02, 200.09 99, 100.9 90.04, 100 90))",
    )


def test_segment_same_dist():
    _check(
        "LINESTRING (100 100, 200 100)", 10, 10,
        "POLYGON ((201.95 109.81, 203.83 109.24, 205.56 108.31, 207.07 107.07, "
        "208.31 105.56, 209.24 103.83, 209.81 101.95, 210 100, 209.81 98.05, "
        "209.24 96.17, 208.31 94.44, 207.07 92.93, 205.56 91.69, 203.83 90.76, "
        "201.95 90.19, 200 90, 100 90, 98.05 90.19, 96.17 90.76, 94.44 91.69, "
        "92.93 92.93, 91.69 94.44, 90.76 96.17, 90.19 98.05, 90 100, "
        "90.19 101.95, 90.76 103.83, 91.69 105.56, 92.93 107.07, 94.44 108.31, "
        "96.17 109.24, 98.05 109.81, 100 110, 200 110, 201.95 109.81))",
    )


def test_taper_covers_interpolated_discs():
    """Every point of the line must be covered at its interpolated radius."""
    import numpy as np

    from nettopologysuite_spark.kernels.pip import EXTERIOR, PreparedPolygon

    g = wkt_loads("LINESTRING (0 0, 50 0, 100 30)")
    got = variable_buffer(g, 2, 12)
    leaf = [l for l in got.flatten() if l.gtype == 3][0]
    prep = PreparedPolygon(leaf)
    # sample interpolated circles slightly inside the radius
    from nettopologysuite_spark.kernels.linearref import locate_points, total_length

    tot = total_length(g)
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        p = locate_points(g, np.array([frac * tot]))[0]
        r = (2 + 10 * frac) * 0.95
        for ang in np.linspace(0, 2 * np.pi, 12, endpoint=False):
            q = (p[0] + r * np.cos(ang), p[1] + r * np.sin(ang))
            assert int(prep.locate(np.array([q[0]]), np.array([q[1]]))[0]) != EXTERIOR
