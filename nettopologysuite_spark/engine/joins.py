"""Distributed spatial joins: cell-partitioned candidate generation + exact
vectorized refinement.

Physical strategy (SURVEY.md §7, BASELINE.json north rule):

1. Tile assignment is a native projection (points) or an envelope-cover
   explode (extended geometries) — see ``tiling.py``.
2. Candidate pairs come from an equi-join on ``cell_id``. The polygon pack's
   (cell_id, poly_id) cover relation is tiny → ``broadcast()`` join, no
   shuffle of the big side. At 100 TB the big side is scanned once,
   partition-pruned by cell range when the storage is curve-ordered.
3. Exact refinement runs inside a scalar pandas UDF over Arrow batches:
   per-executor lazily-built prepared structures (PreparedConvex /
   PreparedPolygon) probe whole numpy arrays — the batched analog of
   ``PreparedPolygonIntersects.cs:38-60`` (PIP first, then segments).
4. Pair dedup: a point lies in exactly one cell, so point joins emit
   uniques by construction. Extended-geometry joins use the reference-cell
   rule (pair reported only in the cell containing the envelope-intersection
   corner) — ``dedup_ref_cell``.

Every step is DataFrame + Arrow; zero per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..kernels.cells import Grid
from .polygons import PolygonPack
from .tiling import with_cell_id


# ---------------------------------------------------------------------------
# point-in-polygon join (the hot path)
# ---------------------------------------------------------------------------

def pip_refine_udf(pack: PolygonPack, predicate: str = "covers"):
    """Boolean pandas UDF (x, y, poly_id) → predicate(poly, point).

    Rows are grouped by poly_id inside each Arrow batch; each polygon's
    prepared structure evaluates its whole group in one vectorized call.
    """
    if predicate not in ("covers", "contains", "intersects"):
        raise ValueError(f"unsupported point predicate {predicate!r}")

    @pandas_udf("boolean")
    def _refine(x: pd.Series, y: pd.Series, poly_id: pd.Series) -> pd.Series:
        prepared = pack.prepared()
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        pids = poly_id.to_numpy(object)
        out = np.zeros(len(xs), dtype=bool)
        codes, uniques = pd.factorize(pids)
        for j, pid in enumerate(uniques):
            prep = prepared[pid]
            sel = codes == j
            if predicate == "contains":
                out[sel] = prep.contains_points(xs[sel], ys[sel])
            else:  # covers / intersects coincide for point probes
                out[sel] = prep.covers_points(xs[sel], ys[sel])
        return pd.Series(out)

    return _refine


def cover_cells_df(spark: SparkSession, pack: PolygonPack, grid: Grid,
                   expand: float = 0.0) -> DataFrame:
    rows = pack.cover_rows(grid, expand=expand)
    return spark.createDataFrame(rows, "cell_id long, poly_id string")


def pip_join_points(
    points: DataFrame,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "covers",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """points(…, x, y) ⋈ pack → rows of points × matching poly_id."""
    spark = points.sparkSession
    pts = with_cell_id(points, grid, x, y)
    cover = cover_cells_df(spark, pack, grid)
    cand = pts.join(F.broadcast(cover), "cell_id")
    return cand.filter(pip_refine_udf(pack, predicate)(F.col(x), F.col(y), F.col("poly_id")))


def pip_join_points_sortmerge(
    points: DataFrame,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "covers",
    x: str = "x",
    y: str = "y",
    hot_cell_threshold: int = 50_000,
    id_col: str | None = None,
) -> DataFrame:
    """Shuffle-based variant of the PIP join with explicit hot-cell salting.

    For polygon packs too large to broadcast, both sides shuffle on cell_id.
    Skewed cells (urban-hotspot analog) would then hammer single reducers,
    so cells whose point count exceeds ``hot_cell_threshold`` are salted:
    points get salt = pmod(hash(id), k) with k = ceil(count/threshold), and
    the cover rows of hot cells replicate once per salt — output is
    IDENTICAL to the broadcast path (property-tested), each pair still
    produced exactly once. AQE skew-join remains on as backstop.
    """
    spark = points.sparkSession
    pts = with_cell_id(points, grid, x, y)
    # 1. per-cell counts → salt factors for hot cells (tiny aggregate)
    counts = pts.groupBy("cell_id").count()
    hot = {
        int(r["cell_id"]): int(-(-r["count"] // hot_cell_threshold))
        for r in counts.filter(F.col("count") > hot_cell_threshold).collect()
    }
    # 2. salted cover relation (hot cells replicated per salt)
    rows = []
    for cell, poly_id in pack.cover_rows(grid):
        for salt in range(hot.get(cell, 1)):
            rows.append((cell, salt, poly_id))
    cover = spark.createDataFrame(rows, "cell_id long, salt int, poly_id string")
    # 3. salted points
    salt_map = spark.createDataFrame(
        [(c, k) for c, k in hot.items()] or [(-1, 1)], "cell_id long, k int"
    )
    salt_src = F.xxhash64(F.col(id_col)) if id_col else F.xxhash64(F.col(x), F.col(y))
    pts_salted = (
        pts.join(F.broadcast(salt_map), "cell_id", "left")
        .withColumn("salt", F.when(F.col("k").isNull(), F.lit(0))
                    .otherwise(F.pmod(salt_src, F.col("k"))).cast("int"))
        .drop("k")
    )
    # 4. shuffle join on (cell_id, salt) — sort-merge, no broadcast
    cand = pts_salted.hint("merge").join(cover, ["cell_id", "salt"])
    out = cand.filter(
        pip_refine_udf(pack, predicate)(F.col(x), F.col(y), F.col("poly_id"))
    )
    return out.drop("salt")


# ---------------------------------------------------------------------------
# within-distance join (range-join analog)
# ---------------------------------------------------------------------------

def within_distance_join_points(
    points: DataFrame,
    centers: list[tuple[str, float, float, float]],  # (q_id, cx, cy, r)
    grid: Grid,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """All points within distance r of each query center.

    Candidates: cells covering each center's expanded envelope (driver-side,
    tiny) broadcast-joined on the point's cell. Refinement is a *native*
    squared-distance comparison — stays in whole-stage codegen, no Python.
    (IsWithinDistance semantics, Geometry.cs:468; distance join = envelope-
    expanded cell join per SURVEY.md §2.8.)
    """
    spark = points.sparkSession
    rows = []
    for q_id, cx, cy, r in centers:
        for c in grid.cover_envelope(cx - r, cy - r, cx + r, cy + r):
            rows.append((int(c), q_id, float(cx), float(cy), float(r)))
    cover = spark.createDataFrame(
        rows, "cell_id long, q_id string, cx double, cy double, r double"
    )
    pts = with_cell_id(points, grid, x, y)
    cand = pts.join(F.broadcast(cover), "cell_id")
    dx = F.col(x) - F.col("cx")
    dy = F.col(y) - F.col("cy")
    return cand.filter(dx * dx + dy * dy <= F.col("r") * F.col("r"))


# ---------------------------------------------------------------------------
# kNN join (top-k analog; STRtree.cs:556 branch-and-bound ↦ partial top-k)
# ---------------------------------------------------------------------------

def knn_join_points(
    points: DataFrame,
    queries: list[tuple[int, float, float]],  # (q_id, qx, qy)
    k: int,
    id_col: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """k nearest points per query, ties broken by (distance², id).

    Two-phase top-k: a mapInPandas pass keeps the per-partition best k per
    query (vectorized; exact tie handling at the k-th distance), then a
    window over the tiny survivor set ranks globally. The survivor set is
    ≤ partitions × |queries| × k rows — the shuffle is negligible at any
    scale, and the big side is scanned exactly once.
    """
    qarr = np.array([(q[1], q[2]) for q in queries], dtype=np.float64)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    nq = len(qids)
    schema = f"q_id long, {id_col} long, d2 double"

    def partial_topk(batches):
        best_d2 = [np.empty(0)] * nq
        best_id = [np.empty(0, dtype=np.int64)] * nq
        for pdf in batches:
            px = pdf[x].to_numpy(np.float64)
            py = pdf[y].to_numpy(np.float64)
            pid = pdf[id_col].to_numpy(np.int64)
            dx = px[:, None] - qarr[None, :, 0]
            dy = py[:, None] - qarr[None, :, 1]
            d2 = dx * dx + dy * dy  # (B, nq)
            for j in range(nq):
                cd = np.concatenate([best_d2[j], d2[:, j]])
                ci = np.concatenate([best_id[j], pid])
                if len(cd) > k:
                    # exact k-th with ties: keep strictly-smaller + all equal
                    kth = np.partition(cd, k - 1)[k - 1]
                    keep = cd <= kth
                    cd, ci = cd[keep], ci[keep]
                    if len(cd) > 4 * k + 16:  # bound tie blowup
                        order = np.lexsort((ci, cd))[: k]
                        cd, ci = cd[order], ci[order]
                best_d2[j], best_id[j] = cd, ci
        out = {
            "q_id": np.repeat(qids, [len(b) for b in best_d2]),
            id_col: np.concatenate(best_id) if nq else np.empty(0, dtype=np.int64),
            "d2": np.concatenate(best_d2) if nq else np.empty(0),
        }
        yield pd.DataFrame(out)

    survivors = points.select(id_col, x, y).mapInPandas(partial_topk, schema)
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col(id_col).asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", id_col, "d2")
    )


# ---------------------------------------------------------------------------
# generic WKB × polygon-pack join (extended geometries)
# ---------------------------------------------------------------------------

def spatial_join_wkb(
    geoms: DataFrame,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "intersects",
    wkb_col: str = "geom_wkb",
) -> DataFrame:
    """Join arbitrary-WKB rows against the pack with multi-cell replication
    and reference-cell dedup (each pair emitted exactly once)."""
    from ..kernels.envelope import envelopes_of_wkb
    from ..kernels.geom import wkb_loads
    from ..kernels.predicates import evaluate_predicate
    from .tiling import cover_cells_udf

    spark = geoms.sparkSession
    cover = cover_cells_df(spark, pack, grid)
    poly_envs = {
        e.poly_id: np.asarray(wkb_loads(e.wkb).envelope()) for e in pack.entries
    }

    @pandas_udf("boolean")
    def _refine(wkb: pd.Series, poly_id: pd.Series, cell_id: pd.Series) -> pd.Series:
        geoms_list = [wkb_loads(bytes(b)) if b is not None else None for b in wkb.to_list()]
        envs = envelopes_of_wkb(wkb.to_list())
        pgeoms = pack.geoms()
        cells = cell_id.to_numpy(np.int64)
        out = np.zeros(len(geoms_list), dtype=bool)
        for i, g in enumerate(geoms_list):
            if g is None:
                continue
            pid = poly_id.iloc[i]
            penv = poly_envs[pid]
            # reference-cell rule: the pair belongs to the cell containing the
            # lower-left corner of the envelope intersection
            rx = max(envs[i][0], penv[0])
            ry = max(envs[i][1], penv[1])
            ref_cell = int(grid.cell_ids(np.array([rx]), np.array([ry]))[0])
            if ref_cell != cells[i]:
                continue
            out[i] = evaluate_predicate(predicate, g, pgeoms[pid])
        return pd.Series(out)

    cand = (
        geoms.withColumn("cell_id", F.explode(cover_cells_udf(grid)(F.col(wkb_col))))
        .join(F.broadcast(cover), "cell_id")
    )
    return cand.filter(_refine(F.col(wkb_col), F.col("poly_id"), F.col("cell_id")))
