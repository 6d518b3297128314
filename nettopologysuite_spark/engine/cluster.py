"""Density-based spatial clustering (DBSCAN) — the PostGIS
``ST_ClusterDBSCAN`` analog, distributed.

DBSCAN(eps, minPts): a point is CORE when ≥ ``min_pts`` points (itself
included) lie within ``eps``; core points within ``eps`` of each other
share a cluster (transitively); a non-core point within ``eps`` of a core
point is a BORDER member of that core's cluster (ties → the minimum
cluster label, which makes the assignment deterministic — PostGIS leaves
it arbitrary); everything else is noise (NULL cluster).

Distributed shape (every stage native Spark, zero Python):

1. eps-grid cells (``floor(x/eps)``, ``floor(y/eps)``) — any eps-neighbor
   pair is in the same or an adjacent cell.
2. Ordered candidate pairs from ONE equi-join: the left side explodes to
   its 3×3 neighbor cells (a 9-row native explode), the right side keeps
   its own cell — each ordered pair appears exactly once, the exact
   ``dist² ≤ eps²`` refine stays in whole-stage codegen.
3. Degrees / core flags: one groupBy count over the pairs.
4. Cluster labels: connected components over core–core edges via the
   alternating large-star/small-star dataflow (O(log n) rounds on any
   graph shape — a giant percolation cluster at high density cannot make
   the round count explode). Label = min core id in the component.
5. Border assignment: min neighbor-core label per non-core point — one
   join + groupBy min.

At 100 TB the candidate join shuffles on eps-cell ids (partition-pruned
when storage is curve-ordered); dense hot cells are the same skew problem
as the PIP join and take the same salting (``pip_join_points_sortmerge``)
if a workload needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _cc_star


def dbscan(points: DataFrame, eps: float, min_pts: int,
           id_col: str = "pid", x: str = "x", y: str = "y") -> DataFrame:
    """→ (id, cluster_id nullable, is_core) — one row per input point.

    ``eps`` should be a dyadic rational when oracle-exact floor-grid
    parity with an external SQL engine matters (the division then stays
    exact in IEEE doubles).
    """
    pts = points.select(
        F.col(id_col).alias("_id"), F.col(x).alias("_x"), F.col(y).alias("_y")
    ).withColumn(
        "_cx", F.floor(F.col("_x") / F.lit(eps)).cast("long")
    ).withColumn(
        "_cy", F.floor(F.col("_y") / F.lit(eps)).cast("long")
    )

    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    left = (
        pts.select("*", F.explode(offsets).alias("_o"))
        .select(
            F.col("_id").alias("a"), F.col("_x").alias("ax"),
            F.col("_y").alias("ay"),
            (F.col("_cx") + F.col("_o.dx")).alias("jx"),
            (F.col("_cy") + F.col("_o.dy")).alias("jy"),
        )
    )
    right = pts.select(
        F.col("_id").alias("b"), F.col("_x").alias("bx"),
        F.col("_y").alias("by"), F.col("_cx").alias("jx"),
        F.col("_cy").alias("jy"),
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    pairs = (
        left.join(right, ["jx", "jy"])
        .filter(dx * dx + dy * dy <= F.lit(eps * eps))
        .select("a", "b")
        .persist()
    )
    deg = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("_deg"))
    core = deg.filter(F.col("_deg") >= min_pts).select("a").persist()

    core_edges = (
        pairs.join(core, "a", "left_semi")
        .join(core.select(F.col("a").alias("b")), "b", "left_semi")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
    )
    cc = _cc_star(core_edges, precontract=2).select(
        F.col("node").alias("a"), F.col("label").alias("_cl")
    )
    # singleton cores (no core neighbor) label themselves
    core_labels = core.join(cc, "a", "left").select(
        "a", F.coalesce(F.col("_cl"), F.col("a")).alias("cluster_id")
    ).persist()

    border = (
        pairs.join(core_labels.select(F.col("a").alias("b"),
                                      F.col("cluster_id").alias("_bcl")), "b")
        .join(core, "a", "left_anti")
        .groupBy("a")
        .agg(F.min("_bcl").alias("cluster_id"))
    )
    assigned = (
        core_labels.withColumn("is_core", F.lit(True))
        .unionByName(border.withColumn("is_core", F.lit(False)))
    )
    out = (
        pts.select(F.col("_id").alias("a"))
        .join(assigned, "a", "left")
        .select(
            F.col("a").alias(id_col),
            F.col("cluster_id"),
            F.coalesce(F.col("is_core"), F.lit(False)).alias("is_core"),
        )
    )
    return out
