"""GeometryFixer fixtures mirrored from the reference
test/NetTopologySuite.Tests.NUnit/Geometries/Utility/GeometryFixerTest.cs
(LinearRing- and Z/M-specific cases excluded: the WKB object model has
neither), plus the GeometryFixerFuzzer idiom as a property test."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.fixer import fix  # noqa: E402
from nettopologysuite_spark.kernels.geom import wkt_loads  # noqa: E402
from nettopologysuite_spark.kernels.normalize import equals_normalized  # noqa: E402
from nettopologysuite_spark.kernels.valid import is_valid  # noqa: E402

CASES = [
    # --- points (GeometryFixerTest.cs:12-85)
    ("POINT (0 0)", "POINT (0 0)", {}),
    ("POINT (0 NaN)", "POINT EMPTY", {}),
    ("POINT EMPTY", "POINT EMPTY", {}),
    ("MULTIPOINT ((0 NaN))", "MULTIPOINT EMPTY", {}),
    ("MULTIPOINT ((0 0), (1 1))", "MULTIPOINT ((0 0), (1 1))", {}),
    ("MULTIPOINT ((0 0), EMPTY)", "MULTIPOINT ((0 0))", {}),
    ("MULTIPOINT ((0 0), EMPTY)", "POINT (0 0)", {"keep_multi": False}),
    ("MULTIPOINT (EMPTY, EMPTY)", "MULTIPOINT EMPTY", {}),
    # --- linestrings (:88-131)
    ("LINESTRING EMPTY", "LINESTRING EMPTY", {}),
    ("LINESTRING (0 0, 1 NaN, 0 0)", "LINESTRING EMPTY", {}),
    ("LINESTRING (0 0, 0 0, 0 0)", "LINESTRING EMPTY", {}),
    ("LINESTRING (0 0, 0 0, 0 0)", "POINT (0 0)", {"keep_collapsed": True}),
    ("LINESTRING (0 0, 0 0, 0 0, 0 0, 0 0, 1 1)", "LINESTRING (0 0, 1 1)", {}),
    ("LINESTRING (0 0, 9 9, 9 5, 0 5)", "LINESTRING (0 0, 9 9, 9 5, 0 5)", {}),
    # --- multilinestrings (:199-245)
    ("MULTILINESTRING ((10 90, 90 10, 90 90), (90 50, 10 50))",
     "MULTILINESTRING ((10 90, 90 10, 90 90), (90 50, 10 50))", {}),
    ("MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
     "LINESTRING (10 10, 90 90)", {"keep_multi": False}),
    ("MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
     "MULTILINESTRING ((10 10, 90 90))", {}),
    ("MULTILINESTRING ((10 10, 90 90), (10 10, 10 10, 10 10))",
     "GEOMETRYCOLLECTION (POINT (10 10), LINESTRING (10 10, 90 90))",
     {"keep_collapsed": True}),
    ("MULTILINESTRING ((10 10, 90 90), EMPTY)",
     "MULTILINESTRING ((10 10, 90 90))", {}),
    ("MULTILINESTRING (EMPTY, EMPTY)", "MULTILINESTRING EMPTY", {}),
    # --- polygons (:250-345)
    ("POLYGON EMPTY", "POLYGON EMPTY", {}),
    ("POLYGON ((10 90, 90 10, 90 90, 10 10, 10 90))",
     "MULTIPOLYGON (((10 90, 50 50, 10 10, 10 90)), ((50 50, 90 90, 90 10, 50 50)))", {}),
    ("POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), (80 70, 30 70, 30 20, 30 70, 80 70), (70 80, 70 30, 20 30, 70 30, 70 80))",
     "POLYGON ((90 90, 90 10, 10 10, 10 90, 90 90))", {}),
    ("POLYGON ((10 90, 50 90, 50 30, 70 30, 70 50, 30 50, 30 70, 90 70, 90 10, 10 10, 10 90))",
     "POLYGON ((10 90, 50 90, 50 70, 90 70, 90 10, 10 10, 10 90), (50 50, 50 30, 70 30, 70 50, 50 50))", {}),
    ("POLYGON ((0 0, 0 5, 6 5, 6 0, 0 0), (3 1, 4 1, 4 2, 3 2, 3 1), (3 2, 1 4, 5 4, 4 2, 4 3, 3 2, 2 3, 3 2))",
     "MULTIPOLYGON (((0 0, 0 5, 6 5, 6 0, 0 0), (1 4, 2 3, 3 2, 3 1, 4 1, 4 2, 5 4, 1 4)), ((3 2, 4 3, 4 2, 3 2)))", {}),
    ("POLYGON ((10 90, 90 NaN, 90 10, 10 10, 10 90))",
     "POLYGON ((10 10, 10 90, 90 10, 10 10))", {}),
    ("POLYGON ((10 90, 90 10, 90 10, 90 10, 90 10, 90 10, 10 10, 10 90))",
     "POLYGON ((10 10, 10 90, 90 10, 10 10))", {}),
    ("POLYGON ((10 10, 10 90, 90 90, 10 90, 10 10), (20 80, 60 80, 60 40, 20 40, 20 80))",
     "POLYGON EMPTY", {}),
    ("POLYGON ((10 10, 10 NaN, 90 NaN, 10 NaN, 10 10))", "POLYGON EMPTY", {}),
    ("POLYGON ((10 10, 10 NaN, 90 NaN, 10 NaN, 10 10))", "POINT (10 10)",
     {"keep_collapsed": True}),
    ("POLYGON ((10 10, 10 90, 90 90, 10 90, 10 10), (20 80, 60 80, 60 40, 20 40, 20 80))",
     "LINESTRING (10 10, 10 90, 90 90, 10 90, 10 10)", {"keep_collapsed": True}),
    ("POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), (80 80, 20 80, 20 20, 20 80, 80 80))",
     "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))", {}),
    ("POLYGON ((10 90, 90 90, 90 10, 10 10, 10 90), (80 80, 20 80, 20 20, 20 80, 80 80))",
     "POLYGON ((10 10, 10 90, 90 90, 90 10, 10 10))", {"keep_collapsed": True}),
    ("POLYGON ((50 90, 80 90, 80 10, 50 10, 50 90), (70 80, 90 80, 90 20, 70 20, 70 80), (40 80, 40 50, 0 50, 0 80, 40 80), (30 40, 10 40, 10 60, 30 60, 30 40), (60 70, 80 70, 80 30, 60 30, 60 70))",
     "MULTIPOLYGON (((10 40, 10 50, 0 50, 0 80, 40 80, 40 50, 30 50, 30 40, 10 40)), ((70 80, 70 70, 60 70, 60 30, 70 30, 70 20, 80 20, 80 10, 50 10, 50 90, 80 90, 80 80, 70 80)))", {}),
    # --- multipolygons (:355-407)
    ("MULTIPOLYGON EMPTY", "MULTIPOLYGON EMPTY", {}),
    ("MULTIPOLYGON (EMPTY, EMPTY)", "MULTIPOLYGON EMPTY", {}),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), EMPTY)",
     "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)))", {}),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), EMPTY, ((50 40, 80 40, 80 10, 50 10, 50 40)))",
     "MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), ((50 40, 80 40, 80 10, 50 10, 50 40)))", {}),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), ((50 40, 50 40, 50 40, 50 40, 50 40)))",
     "POLYGON ((10 10, 10 40, 40 40, 40 10, 10 10))", {"keep_multi": False}),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), ((50 40, 50 40, 50 40, 50 40, 50 40)))",
     "MULTIPOLYGON (((10 10, 10 40, 40 40, 40 10, 10 10)))", {}),
    ("MULTIPOLYGON (((10 40, 40 40, 40 10, 10 10, 10 40)), ((50 40, 50 40, 50 40, 50 40, 50 40)))",
     "GEOMETRYCOLLECTION (POINT (50 40), POLYGON ((10 10, 10 40, 40 40, 40 10, 10 10)))",
     {"keep_collapsed": True}),
    # --- collections (:412-432)
    ("GEOMETRYCOLLECTION EMPTY", "GEOMETRYCOLLECTION EMPTY", {}),
    ("GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)",
     "GEOMETRYCOLLECTION (POINT EMPTY, LINESTRING EMPTY, POLYGON EMPTY)", {}),
    ("GEOMETRYCOLLECTION (LINESTRING (0 0, 0 0), POINT (1 1))",
     "GEOMETRYCOLLECTION (POINT (0 0), POINT (1 1))", {"keep_collapsed": True}),
]


@pytest.mark.parametrize("wkt,expected,kw", CASES)
def test_fixer_fixture(wkt, expected, kw):
    got = fix(wkt_loads(wkt), **kw)
    exp = wkt_loads(expected)
    assert equals_normalized(got, exp), (
        f"fix({wkt}, {kw}): got {got.type_name}, expected {expected}"
    )


def test_fixer_validity_issue_cases():
    """Validity-only checks from the reference (:468-479, jts#852)."""
    for wkt in [
        "POLYGON ((42.565844354657436 -72.61247966084643, 42.56484510561062 -72.61202938126273, 42.56384585656381 -72.61247966084643, 42.563637679679054 -72.61276108558623, 42.562055535354936 -72.61366164475362, 42.5631796905326 -72.61259223074235, 42.565844354657436 -72.61214195115866, 42.566510520688645 -72.61259223074235, 42.565844354657436 -72.61247966084643))",
        "POLYGON ((50.69544005538049 4.587126197745181, 50.699035986722194 4.592752502415541, 50.699395579856365 4.592049214331746, 50.699125885005735 4.590501980547397, 50.69867639358802 4.591064611014433, 50.69795720731968 4.591064611014433, 50.69759761418551 4.590501980547397, 50.69759761418551 4.589376719613325, 50.69831680045385 4.588251458679252, 50.69723802105134 4.586563567278144, 50.69579964851466 4.586563567278144, 50.69544005538049 4.587126197745181))",
    ]:
        assert is_valid(fix(wkt_loads(wkt)))


def test_st_makevalid_sql(spark):
    """ST_MakeValid in the SQL surface: bowtie → valid multipolygon with
    the exact expected area (two 1600-unit triangles)."""
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_IsValid(f) AS ok, ST_Area(f) AS a, ST_AsText(f) AS t FROM ("
        "  SELECT ST_MakeValid(ST_GeomFromText("
        "    'POLYGON ((10 90, 90 10, 90 90, 10 10, 10 90))')) AS f)"
    ).collect()[0]
    assert row["ok"] and row["a"] == 3200.0
    assert row["t"].startswith("MULTIPOLYGON")


def test_fixer_fuzz_random_polygons():
    """GeometryFixerFuzzer idiom: random invalid polygons (random-walk rings,
    self-crossing bowties, rings with NaN) must all fix to VALID geometries
    whose envelope never exceeds the finite-input envelope."""
    rng = np.random.default_rng(99)
    from nettopologysuite_spark.kernels.geom import polygon

    for trial in range(120):
        n = int(rng.integers(4, 14))
        pts = rng.uniform(0, 100, (n, 2))
        if trial % 5 == 0:
            pts[rng.integers(0, n), rng.integers(0, 2)] = np.nan
        ring = np.concatenate([pts, pts[:1]], axis=0)
        holes = []
        if trial % 3 == 0:
            h = rng.uniform(20, 80, (int(rng.integers(3, 7)), 2))
            holes.append(np.concatenate([h, h[:1]], axis=0))
        g = polygon(ring, holes)
        fixed = fix(g)
        assert is_valid(fixed), f"trial {trial} produced invalid fix"
        if not fixed.is_empty:
            fin = np.isfinite(pts).all(axis=1)
            allpts = [pts[fin]] + [h[:-1] for h in holes]
            ap = np.concatenate(allpts)
            env = fixed.envelope()
            assert env[0] >= ap[:, 0].min() - 1e-9
            assert env[2] <= ap[:, 0].max() + 1e-9
            assert env[1] >= ap[:, 1].min() - 1e-9
            assert env[3] <= ap[:, 1].max() + 1e-9
