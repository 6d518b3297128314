"""ST_* SQL function registry smoke tests (through spark.sql)."""

import sys
from pathlib import Path


sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_st_functions_sql(spark):
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    spark.sql(
        "SELECT ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))') AS g, "
        "ST_GeomFromText('POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))') AS h"
    ).createOrReplaceTempView("t")
    row = spark.sql(
        """
        SELECT ST_Area(g) AS area, ST_Length(g) AS len,
               ST_Intersects(g, h) AS inter, ST_Contains(g, h) AS cont,
               ST_Relate(g, h) AS im,
               ST_Area(ST_Intersection(g, h)) AS ia,
               ST_Area(ST_Union(g, h)) AS ua,
               ST_AsText(ST_Centroid(g)) AS cen,
               ST_IsValid(g) AS v, ST_IsSimple(g) AS s,
               ST_Distance(g, ST_GeomFromText('POINT (13 10)')) AS d,
               ST_Area(ST_Buffer(g, 2.0)) AS ba
        FROM t
        """
    ).collect()[0]
    assert row["area"] == 100.0
    assert row["len"] == 40.0
    assert row["inter"] is True and row["cont"] is False
    assert row["im"] == "212101212"
    assert row["ia"] == 25.0
    assert row["ua"] == 175.0
    assert row["cen"] == "POINT (5 5)"
    assert row["v"] is True and row["s"] is True
    assert row["d"] == 3.0
    # buffer area ≈ 100 + 4*(10*2) + π*4 (inscribed arcs slightly less)
    assert 190 < row["ba"] < 193


def test_st_utility_functions(spark):
    """Clearance / polygonize / point-on-surface / envelope / normalize /
    reverse / npoints surface."""
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    row = spark.sql(
        """
        SELECT ST_MinimumClearance(g) AS mc,
               ST_AsText(ST_MinimumClearanceLine(g)) AS mcl,
               ST_AsText(ST_PointOnSurface(g)) AS pos,
               ST_AsText(ST_Envelope(g)) AS env,
               ST_AsText(ST_Envelope(ST_GeomFromText('POINT (3 4)'))) AS envp,
               ST_NPoints(g) AS np,
               ST_AsText(ST_Normalize(ST_Reverse(g))) AS norm,
               ST_AsText(ST_Polygonize(ST_GeomFromText(
                 'MULTILINESTRING ((0 0, 4 0), (4 0, 4 4), (4 4, 0 4), (0 4, 0 0))'
               ))) AS pz
        FROM (SELECT ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))') AS g)
        """
    ).collect()[0]
    assert row["mc"] == 10.0
    assert row["mcl"] == "LINESTRING (0 0, 10 0)"
    assert row["pos"] == "POINT (5 5)"
    assert row["env"] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert row["envp"] == "POINT (3 4)"
    assert row["np"] == 5
    assert row["norm"] == "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
    assert row["pz"] == "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))"


def test_st_precision_and_construct_tails(spark):
    """ST_ReducePrecision / ST_EqualsExact / ST_DWithin /
    ST_LargestEmptyCircle / ST_CoverageUnion / ST_PolygonHull /
    ST_InteriorPoint."""
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    row = spark.sql(
        """
        SELECT
          ST_AsText(ST_ReducePrecision(
            ST_GeomFromText('POINT (1.26 4.74)'), 2.0)) AS rp,
          ST_EqualsExact(ST_GeomFromText('POINT (1 2)'),
                         ST_GeomFromText('POINT (1.05 2)'), 0.1) AS ee,
          ST_EqualsExact(ST_GeomFromText('POINT (1 2)'),
                         ST_GeomFromText('POINT (1.5 2)'), 0.1) AS ne,
          ST_DWithin(ST_GeomFromText('POINT (0 0)'),
                     ST_GeomFromText('POINT (3 4)'), 5.0) AS dw,
          ST_DWithin(ST_GeomFromText('POINT (0 0)'),
                     ST_GeomFromText('POINT (3 4)'), 4.9) AS dn,
          ST_LargestEmptyCircle(
            ST_GeomFromText('MULTIPOINT ((0 0), (10 0), (10 10), (0 10))'),
            ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'),
            0.01) AS lec,
          ST_Area(ST_CoverageUnion(array(
            ST_GeomFromText('POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))'),
            ST_GeomFromText('POLYGON ((5 0, 10 0, 10 10, 5 10, 5 0))')))) AS cu,
          ST_Area(ST_PolygonHull(
            ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'),
            true, 0.5)) AS ph,
          ST_AsText(ST_InteriorPoint(
            ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS ip
        """
    ).collect()[0]
    assert row["rp"] == "POINT (1.5 4.5)"
    assert row["ee"] is True and row["ne"] is False
    assert row["dw"] is True and row["dn"] is False
    # the largest empty circle among the four corner obstacles is centered
    # in the middle of the square, radius ~ half the diagonal
    assert abs(row["lec"]["cx"] - 5.0) < 0.1 and abs(row["lec"]["cy"] - 5.0) < 0.1
    assert abs(row["lec"]["radius"] - 50 ** 0.5) < 0.1
    assert row["cu"] == 100.0
    assert row["ph"] >= 100.0  # outer hull contains the input
    assert row["ip"] == "POINT (2 2)"


def test_st_gml_kml_sql(spark):
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    row = spark.sql(
        """
        SELECT
          ST_AsText(ST_GeomFromGML(ST_AsGML(
            ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))) AS gml_rt,
          ST_AsText(ST_GeomFromKML(ST_AsKML(
            ST_GeomFromText('MULTIPOINT ((1 1), (2 2))')))) AS kml_rt,
          ST_AsGML(ST_GeomFromText('POINT (3 4)')) AS gml_txt
        """
    ).collect()[0]
    assert row["gml_rt"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert row["kml_rt"] == "MULTIPOINT ((1 1), (2 2))"
    assert "gml:Point" in row["gml_txt"] and "3,4" in row["gml_txt"]


def test_st_z_surface(spark):
    """ST_Z / ST_HasZ / ST_Force2D over the Z-passthrough codec."""
    import numpy as np

    from nettopologysuite_spark.kernels.geom import Geom, POINT, wkb_dumps

    zpt = wkb_dumps(Geom(POINT, coords=np.array([[1.0, 2.0]]), zs=np.array([9.5])))
    flat = wkb_dumps(Geom(POINT, coords=np.array([[3.0, 4.0]])))
    df = spark.createDataFrame([(1, zpt), (2, flat)], "i long, g binary")
    df.createOrReplaceTempView("zt")
    rows = {r["i"]: (r["z"], r["hz"], r["fz"]) for r in spark.sql(
        "SELECT i, ST_Z(g) AS z, ST_HasZ(g) AS hz, "
        "ST_HasZ(ST_Force2D(g)) AS fz FROM zt"
    ).collect()}
    assert rows[1] == (9.5, True, False)
    assert rows[2] == (None, False, False)


def test_st_astext_precision(spark):
    """ST_AsTextPrecision(geom, digits): WKT with OrdinateFormat's
    maximum-fraction-digits semantics through SQL."""
    from nettopologysuite_spark.functions.st_funcs import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_AsTextPrecision(ST_GeomFromText("
        "'LINESTRING (1.123456789 2.5, 3.00001 4)'), 2) AS t2, "
        "ST_AsTextPrecision(ST_GeomFromText('POINT (1.125 2)'), 0) AS t0"
    ).first()
    assert row["t2"] == "LINESTRING (1.12 2.5, 3 4)"
    assert row["t0"] == "POINT (1 2)"
