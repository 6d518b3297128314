"""VW simplifier gated against the reference NUnit fixtures
(test/NetTopologySuite.Tests.NUnit/Simplify/VWSimplifierTest.cs). The two
spike cases carry exact expected outputs; the rest are the reference's own
validity-style checks (GeometryOperationValidator: result parses, is valid,
and preserves the input's geometry type)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402
from nettopologysuite_spark.kernels.simplify_tp import simplify_vw  # noqa: E402
from nettopologysuite_spark.kernels.valid import is_valid  # noqa: E402


def test_vw_spike_in_shell():
    got = simplify_vw(wkt_loads(
        "POLYGON ((1721355.3 693015.146, 1721318.687 693046.251, "
        "1721306.747 693063.038, 1721367.025 692978.29, 1721355.3 693015.146))"
    ), 10.0)
    exp = wkt_loads(
        "POLYGON ((1721355.3 693015.146, 1721318.687 693046.251, "
        "1721367.025 692978.29, 1721355.3 693015.146))"
    )
    assert equals_normalized(got, exp)


def test_vw_spike_in_hole():
    got = simplify_vw(wkt_loads(
        "POLYGON ((1721270 693090, 1721400 693090, 1721400 692960, "
        "1721270 692960, 1721270 693090), "
        "(1721355.3 693015.146, 1721318.687 693046.251, "
        "1721306.747 693063.038, 1721367.025 692978.29, 1721355.3 693015.146))"
    ), 10.0)
    exp = wkt_loads(
        "POLYGON ((1721270 693090, 1721400 693090, 1721400 692960, "
        "1721270 692960, 1721270 693090), "
        "(1721355.3 693015.146, 1721318.687 693046.251, "
        "1721367.025 692978.29, 1721355.3 693015.146))"
    )
    assert equals_normalized(got, exp)


@pytest.mark.parametrize("wkt,tol", [
    ("POLYGON ((20 220, 40 220, 60 220, 80 220, 100 220, 120 220, 140 220, "
     "140 180, 100 180, 60 180, 20 180, 20 220))", 10.0),
    ("POLYGON ((40 240, 160 241, 280 240, 280 160, 160 240, 40 140, 40 240))", 10.0),
    ("POLYGON ((120 120, 121 121, 122 122, 220 120, 180 199, 160 200, "
     "140 199, 120 120))", 10.0),
    ("POLYGON ((0 0, 50 0, 53 0, 55 0, 100 0, 70 1,  60 1, 50 1, 40 1, 0 0))", 10.0),
    ("POLYGON ((0 5, 5 5, 5 0, 0 0, 0 1, 0 5))", 10.0),
    ("LINESTRING (0 5, 1 5, 2 5, 5 5)", 10.0),
    ("MULTILINESTRING( (0 0, 50 0, 70 0, 80 0, 100 0), (0 0, 50 1, 60 1, 100 0) )",
     10.0),
    ("MULTILINESTRING( EMPTY, (0 0, 50 0, 70 0, 80 0, 100 0), "
     "(0 0, 50 1, 60 1, 100 0) )", 10.0),
    ("MULTIPOLYGON (EMPTY, ((-36 91.5, 4.5 91.5, 4.5 57.5, -36 57.5, -36 91.5)), "
     "((25.5 57.5, 61.5 57.5, 61.5 23.5, 25.5 23.5, 25.5 57.5)))", 10.0),
])
def test_vw_result_valid(wkt, tol):
    g = wkt_loads(wkt)
    out = simplify_vw(g, tol)
    if not out.is_empty:
        assert is_valid(out)
        assert out.dimension() == g.dimension()
