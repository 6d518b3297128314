"""Raster ↔ vector zonal statistics over the shared tiling layer.

Raster pixels are rows (cell-aligned, deterministic synthetic values in the
sandbox; Iceberg-backed tiles at scale); zonal stats = the same cell join as
the vector path (pixel center → cell → broadcast polygon cover → exact PIP
refine) followed by a plain groupBy — no new machinery, which is the point:
the tiling layer is shared between raster and vector (north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.cells import Grid
from .joins import pip_join_points
from .polygons import PolygonPack


def synthetic_raster(spark: SparkSession, n: int = 128, extent: float = 100.0) -> DataFrame:
    """n×n pixel grid over [0, extent)²; value = (ix*31 + iy*17) % 97.

    Pure integer/dyadic arithmetic → bit-identical in any engine.
    """
    w = extent / n
    return spark.range(n * n).select(
        (F.col("id") % n).alias("ix"),
        (F.col("id") / n).cast("long").alias("iy"),
        (((F.col("id") % n) + 0.5) * F.lit(w)).alias("x"),
        ((F.floor(F.col("id") / n) + 0.5) * F.lit(w)).alias("y"),
        (((F.col("id") % n) * 31 + F.floor(F.col("id") / n) * 17) % 97).alias("value"),
    )


def zonal_stats(
    pixels: DataFrame, pack: PolygonPack, grid: Grid
) -> DataFrame:
    """(poly_id, n_px, sum_v, mean_v) of pixels whose center is covered."""
    joined = pip_join_points(pixels, pack, grid, predicate="covers")
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("n_px"),
        F.sum("value").alias("sum_v"),
        (F.sum("value") / F.count("*")).alias("mean_v"),
    )
