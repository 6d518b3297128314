"""Quickstart: what switching from the reference library looks like.

Run:  python examples/quickstart.py
(Also executed by tests/test_examples.py so it can never rot.)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(spark=None):
    own_session = spark is None
    if own_session:
        from nettopologysuite_spark.engine.session import get_spark

        spark = get_spark(master="local[4]", shuffle_partitions=4)
        spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from nettopologysuite_spark.functions import register_all

    # 1. the SQL surface: the reference's operations as ST_* functions
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
         (2, "POINT (5 5)"),
         (3, "LINESTRING (0 0, 20 20)")],
        "id long, wkt string",
    )
    df.createOrReplaceTempView("shapes")
    out = spark.sql("""
        SELECT id,
               ST_Area(ST_GeomFromText(wkt))                    AS area,
               ST_AsText(ST_Centroid(ST_GeomFromText(wkt)))     AS centroid,
               ST_Intersects(ST_GeomFromText(wkt),
                             ST_GeomFromText('POINT (5 5)'))    AS hits_center,
               ST_AsText(ST_Buffer(ST_GeomFromText(wkt), 1.0))  AS buffered
        FROM shapes
    """).collect()
    assert {r["id"]: r["hits_center"] for r in out} == {1: True, 2: True, 3: True}
    assert abs(next(r["area"] for r in out if r["id"] == 1) - 100.0) < 1e-12

    # 2. a distributed spatial join: points × polygons at any scale
    from nettopologysuite_spark.engine.joins import pip_join_points
    from nettopologysuite_spark.engine.polygons import PolygonPack
    from nettopologysuite_spark.kernels.cells import Grid
    from nettopologysuite_spark.kernels.geom import polygon

    grid = Grid(0.0, 0.0, 100.0, 100.0, level=5)
    pack = PolygonPack.from_geoms(
        [("zone-a", polygon([(0, 0), (50, 0), (50, 50), (0, 50), (0, 0)])),
         ("zone-b", polygon([(50, 50), (100, 50), (100, 100), (50, 100),
                             (50, 50)]))]
    )
    pts = spark.range(1000).select(
        F.col("id").alias("pid"),
        (F.col("id") % 97).cast("double").alias("x"),
        ((F.col("id") * 7) % 89).cast("double").alias("y"),
    )
    tagged = pip_join_points(pts, pack, grid)
    counts = {r["poly_id"]: r["n"] for r in
              tagged.groupBy("poly_id").agg(F.count("*").alias("n")).collect()}
    assert counts and all(v > 0 for v in counts.values())

    print("quickstart OK:", counts)
    if own_session:
        spark.stop()
    return counts


if __name__ == "__main__":
    main()
