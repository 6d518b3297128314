"""Coverage union / validation kernels and new ST_ function smoke."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.coverage import (  # noqa: E402
    coverage_union,
    validate_coverage,
)
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.measures import area  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402
from nettopologysuite_spark.kernels.overlay import overlay  # noqa: E402


def _grid_squares(n: int, size: float = 10.0):
    out = []
    for i in range(n):
        for j in range(n):
            x0, y0 = i * size, j * size
            out.append(wkt_loads(
                f"POLYGON (({x0} {y0}, {x0 + size} {y0}, {x0 + size} {y0 + size}, "
                f"{x0} {y0 + size}, {x0} {y0}))"
            ))
    return out


def test_coverage_union_grid():
    polys = _grid_squares(3)
    u = coverage_union(polys)
    expect = wkt_loads("POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0))")
    assert area(u) == 900
    # boundary-chain union equals the overlay union (normalized compare
    # would fail on extra collinear vertices; compare by symdifference area)
    assert area(overlay(u, expect, "symdifference")) == 0.0


def test_coverage_union_with_hole():
    # 3×3 grid minus the center square: union has a hole
    polys = _grid_squares(3)
    del polys[4]  # center (i=1, j=1)
    u = coverage_union(polys)
    assert area(u) == 800
    leaf = [l for l in u.flatten()][0]
    assert len(leaf.rings) == 2  # shell + hole


def test_validate_coverage():
    polys = _grid_squares(2)
    assert validate_coverage(polys) == []
    # overlapping polygon breaks the coverage
    polys.append(wkt_loads("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"))
    bad = validate_coverage(polys)
    assert len(bad) >= 2 and 4 in bad


def test_new_st_functions_registered(spark):
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_MinimumBoundingCircle(ST_GeomFromText('MULTIPOINT ((10 10), (20 20))')) AS c, "
        "ST_FrechetDistance(ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
        "                   ST_GeomFromText('LINESTRING (0 3, 10 3)')) AS f, "
        "ST_AsText(ST_LineInterpolatePoint(ST_GeomFromText('LINESTRING (0 0, 10 0)'), 0.25)) AS p, "
        "ST_AsText(ST_LineMerge(ST_GeomFromText('MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))'))) AS m, "
        "ST_AsText(ST_Affine(ST_GeomFromText('POINT (1 2)'), 1D, 0D, 10D, 0D, 1D, 20D)) AS a"
    ).collect()[0]
    assert abs(row["c"]["radius"] - 7.0710678118654755) < 1e-9
    assert row["f"] == 3.0
    assert row["p"] == "POINT (2.5 0)"
    assert row["m"] == "LINESTRING (0 0, 5 0, 10 0)"
    assert row["a"] == "POINT (11 22)"


def test_find_gaps():
    from nettopologysuite_spark.kernels.coverage import find_gaps

    cov = wkt_loads(
        "MULTIPOLYGON (((1 5, 1 9, 5 9, 5 6, 3 5, 1 5)), "
        "((5 9, 9 9, 9 5, 7 5, 5 6, 5 9)), "
        "((1 1, 1 5, 3 5, 7 5, 9 5, 9 1, 1 1)))"
    )
    got = find_gaps(list(cov.parts), 1)
    assert equals_normalized(got, wkt_loads("LINESTRING (3 5, 7 5, 5 6, 3 5)"))
    # wide voids are NOT gaps
    assert find_gaps(list(cov.parts), 0.1).is_empty
