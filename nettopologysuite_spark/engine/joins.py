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
    # persist the tiled projection: the hot-cell sampling pass and the join
    # probe the SAME materialization — the big side is scanned from source
    # exactly once, instead of two full parquet scans
    pts = with_cell_id(points, grid, x, y).persist()
    # 1. salt factors from a SAMPLED sketch (fixed seed → deterministic),
    #    kept as a DataFrame — no exact count, no collect to the driver.
    #    Correctness never depends on the estimate: both sides derive salt
    #    counts from the SAME relation, so every pair still appears exactly
    #    once; the estimate only tunes skew spreading.
    frac = 0.05
    hot = (
        pts.sample(fraction=frac, seed=7)
        .groupBy("cell_id")
        .count()
        .select(
            "cell_id",
            F.ceil(F.col("count") / F.lit(frac) / F.lit(hot_cell_threshold))
            .cast("int").alias("k"),
        )
        .filter(F.col("k") > 1)
    )
    # 2. salted cover relation built as a DATAFRAME: replicate hot cells
    #    with a native sequence() explode, not a driver loop
    cover_base = spark.createDataFrame(
        list(pack.cover_rows(grid)), "cell_id long, poly_id string"
    )
    cover = (
        cover_base.join(F.broadcast(hot), "cell_id", "left")
        .withColumn("_k", F.coalesce(F.col("k"), F.lit(1)))
        .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_k") - 1)))
        .withColumn("salt", F.col("_salt").cast("int"))
        .drop("k", "_k", "_salt")
    )
    # 3. salted points (same hot relation → consistent salt domain)
    salt_src = F.xxhash64(F.col(id_col)) if id_col else F.xxhash64(F.col(x), F.col(y))
    pts_salted = (
        pts.join(F.broadcast(hot), "cell_id", "left")
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


def _adaptive_cover_rows(pack: PolygonPack, grid: Grid,
                         max_cells: int = 1024) -> list[tuple]:
    from ..kernels.adaptive import adaptive_cover
    from ..kernels.geom import wkb_loads

    prepared = pack.prepared()
    rows: list[tuple] = []
    for e in pack.entries:
        lv, cl, it = adaptive_cover(
            wkb_loads(e.wkb), grid, max_cells=max_cells,
            prep=prepared[e.poly_id],
        )
        rows.extend(
            (int(l), int(c), e.poly_id, bool(i)) for l, c, i in zip(lv, cl, it)
        )
    return rows


def adaptive_cover_df(spark: SparkSession, pack: PolygonPack, grid: Grid,
                      max_cells: int = 1024) -> DataFrame:
    """Multi-level (level, cell, poly_id, interior) cover relation — the S2
    RegionCoverer analog (see ``kernels.adaptive``). Driver-side like
    ``cover_cells_df``: the polygon pack is the small broadcast side."""
    return spark.createDataFrame(
        _adaptive_cover_rows(pack, grid, max_cells),
        "level int, cell long, poly_id string, interior boolean",
    )


def pip_join_points_adaptive(
    points: DataFrame,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "covers",
    x: str = "x",
    y: str = "y",
    max_cells: int = 1024,
) -> DataFrame:
    """PIP join through the adaptive multi-level cover: candidates falling
    in INTERIOR cover cells are accepted with zero Python — only boundary-
    cell candidates pay the exact refine UDF.

    Point side: the finest-level (ix, iy) is computed once (native floor
    projection), then shifted down to each level present in the cover —
    one native explode over ≤ #levels (level, cell) structs, broadcast
    hash join on (level, cell). Cover cells of one polygon are disjoint
    across levels (quadtree partition), so each (point, polygon) pair
    appears at most once — no dedup stage.

    At 100 TB this converts the refine cost from O(all candidates) to
    O(boundary-cell candidates) — for large polygons the overwhelming
    majority of matches are interior and never cross into Python — while
    bounding the cover size of arbitrarily large polygons to ``max_cells``
    rows (the envelope cover grows with polygon area).

    The interior fast path additionally requires the point to lie inside
    the grid extent (a native range condition): out-of-extent points clamp
    into edge cells during assignment, so only the exact refine may accept
    them.
    """
    spark = points.sparkSession
    rows = _adaptive_cover_rows(pack, grid, max_cells=max_cells)
    cover = spark.createDataFrame(
        rows, "level int, cell long, poly_id string, interior boolean"
    )
    levels = sorted({r[0] for r in rows})  # ≤ grid.level + 1 values
    if not levels:
        empty = points.limit(0).withColumn("poly_id", F.lit(None).cast("string"))
        return empty
    L, n = grid.level, grid.n
    ix = F.floor((F.col(x) - F.lit(grid.minx)) / F.lit(grid.cell_w)).cast("long")
    iy = F.floor((F.col(y) - F.lit(grid.miny)) / F.lit(grid.cell_h)).cast("long")
    ix = F.greatest(F.lit(0), F.least(F.lit(n - 1), ix))
    iy = F.greatest(F.lit(0), F.least(F.lit(n - 1), iy))
    pts = points.withColumn("_ix", ix).withColumn("_iy", iy)
    lvl_cells = F.array(*[
        F.struct(
            F.lit(lv).cast("int").alias("level"),
            (F.shiftright(F.col("_iy"), L - lv) * F.lit(1 << lv)
             + F.shiftright(F.col("_ix"), L - lv)).cast("long").alias("cell"),
        )
        for lv in levels
    ])
    pts_l = (
        pts.select("*", F.explode(lvl_cells).alias("_lc"))
        .withColumn("level", F.col("_lc.level"))
        .withColumn("cell", F.col("_lc.cell"))
        .drop("_lc")
    )
    cand = pts_l.join(F.broadcast(cover), ["level", "cell"])
    in_extent = (
        (F.col(x) >= F.lit(grid.minx)) & (F.col(x) < F.lit(grid.maxx))
        & (F.col(y) >= F.lit(grid.miny)) & (F.col(y) < F.lit(grid.maxy))
    )
    fast = F.col("interior") & in_extent
    accepted = cand.filter(fast)
    refined = cand.filter(~fast).filter(
        pip_refine_udf(pack, predicate)(F.col(x), F.col(y), F.col("poly_id"))
    )
    drop = ["level", "cell", "interior", "_ix", "_iy"]
    return accepted.drop(*drop).unionByName(refined.drop(*drop))


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


def knn_join_ring(
    points: DataFrame,
    queries: list[tuple[int, float, float]],  # (q_id, qx, qy)
    k: int,
    grid: Grid,
    id_col: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Cell-local kNN for a driver-side query LIST — a thin wrapper over
    the fully-native annulus engine (:func:`knn_join_table`), kept for API
    parity (SURVEY §7 P6; the distributed analog of STRtree.cs:556
    branch-and-bound).

    The original implementation generated each Chebyshev ring's cell ids in
    a driver-side Python loop (O(r²) cells per query per round plus a
    ``createDataFrame`` per round); the table path explodes the same annuli
    with native ``sequence()`` arithmetic, retires queries with a native
    margin test, and returns the identical (q_id, rank, id, d²) rows — so
    the list form now just lifts the queries into a DataFrame and
    delegates."""
    spark = points.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), float(a), float(b)) for q, a, b in queries],
        "q_id long, qx double, qy double",
    )
    return knn_join_table(points, qdf, k, grid, id_col=id_col, x=x, y=y)


def within_distance_join_table(
    points: DataFrame,
    queries: DataFrame,  # (q_id, cx, cy, r)
    grid: Grid,
    x: str = "x",
    y: str = "y",
    q_id: str = "q_id",
    cx: str = "cx",
    cy: str = "cy",
    radius: str = "r",
) -> DataFrame:
    """All points within distance r of each query center — BOTH sides
    DataFrames, zero driver-side query state.

    The query side explodes to the cells covering its expanded envelope
    with the same native ``sequence()`` arithmetic as the spatial joins
    (a grid cover is a rectangle of cell indices — pure Catalyst), the
    candidate join is a native equi-join on cell_id, and the refinement is
    a codegen squared-distance comparison. No Python anywhere.
    (IsWithinDistance semantics, Geometry.cs:468.)
    """
    from .tiling import explode_cover_native

    q = queries.select(
        F.col(q_id), F.col(cx), F.col(cy), F.col(radius),
        F.struct(
            (F.col(cx) - F.col(radius)).alias("minx"),
            (F.col(cy) - F.col(radius)).alias("miny"),
            (F.col(cx) + F.col(radius)).alias("maxx"),
            (F.col(cy) + F.col(radius)).alias("maxy"),
        ).alias("_env"),
    )
    qc = explode_cover_native(q, grid).drop("_env")
    pts = with_cell_id(points, grid, x, y)
    cand = pts.join(qc, "cell_id")
    dx = F.col(x) - F.col(cx)
    dy = F.col(y) - F.col(cy)
    return cand.filter(dx * dx + dy * dy <= F.col(radius) * F.col(radius))


def knn_join_table(
    points: DataFrame,
    queries: DataFrame,  # (q_id, qx, qy)
    k: int,
    grid: Grid,
    id_col: str = "pid",
    x: str = "x",
    y: str = "y",
    q_id: str = "q_id",
    qx: str = "qx",
    qy: str = "qy",
    r0: int = 2,
) -> DataFrame:
    """kNN join with the query side a DATAFRAME — no collect() of query
    rows, ever; the driver coordinates only round counters (scalars).

    Distributed ring expansion (the table form of ``knn_join_ring``; the
    analog of ``Index/Strtree/STRtree.cs:556`` branch-and-bound, per query):

    - Points tile once, repartition by cell_id and persist: every round's
      candidate join reuses that partitioning, so only the (shrinking)
      query side shuffles per round.
    - Round t explodes each still-active query to the Chebyshev ANNULUS
      of radii [r_lo, r_hi] around its cell — native ``sequence()``
      explodes + an abs filter, no literal arrays, no Python. Annulus
      radii grow geometrically (0; 1–2; 3–6; 7–14; …) so the number of
      rounds is O(log n) even for queries in empty regions.
    - Candidates fold into a running per-query top-k (window rank). A
      query retires when its k-th distance is ≤ its distance to the
      boundary of the examined cell square (every unexamined cell is
      provably farther) — evaluated NATIVELY per query row; the driver
      sees only the active-count scalar.
    - Survivor/active frames ``localCheckpoint`` each round: the plan
      lineage is TRUNCATED, not just cached, so per-round planning cost
      stays constant (a persisted-only loop re-plans a growing DAG). At
      production scale use a reliable checkpoint dir for fault tolerance.

    Work per query is proportional to LOCAL density; shuffles per round are
    proportional to the active query set, never the point table.
    """
    from pyspark.sql import Window

    n = grid.n
    pts = (
        with_cell_id(points, grid, x, y)
        .select(id_col, x, y, "cell_id")
        .repartition(F.col("cell_id"))
        .persist()
    )
    col_of = F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor(
        (F.col(qx) - F.lit(grid.minx)) / F.lit(grid.cell_w)).cast("long")))
    row_of = F.greatest(F.lit(0), F.least(F.lit(n - 1), F.floor(
        (F.col(qy) - F.lit(grid.miny)) / F.lit(grid.cell_h)).cast("long")))
    active = queries.select(
        F.col(q_id), F.col(qx), F.col(qy),
        col_of.alias("_qc"), row_of.alias("_qr"),
    ).localCheckpoint()
    w = Window.partitionBy(q_id).orderBy(F.col("d2").asc(), F.col(id_col).asc())
    survivors: DataFrame | None = None
    # first window spans radii [0, r0] at once: every round costs several
    # fixed-overhead jobs, and a query with ≥k local points retires in
    # round one when the window already clears its margin bound
    r_lo, r_hi = 0, max(0, r0)
    while r_lo <= n and not active.isEmpty():
        ring = (
            active
            .withColumn("_dx", F.explode(F.sequence(F.lit(-r_hi), F.lit(r_hi))))
            .withColumn("_dy", F.explode(F.sequence(F.lit(-r_hi), F.lit(r_hi))))
            .filter(F.greatest(F.abs(F.col("_dx")), F.abs(F.col("_dy"))) >= r_lo)
            .withColumn("_ix", F.col("_qc") + F.col("_dx"))
            .withColumn("_iy", F.col("_qr") + F.col("_dy"))
            .filter((F.col("_ix") >= 0) & (F.col("_ix") < n)
                    & (F.col("_iy") >= 0) & (F.col("_iy") < n))
            .select(q_id, qx, qy,
                    (F.col("_iy") * n + F.col("_ix")).cast("long").alias("cell_id"))
        )
        dx = F.col(x) - F.col(qx)
        dy = F.col(y) - F.col(qy)
        cand = pts.join(ring, "cell_id").select(
            q_id, F.col(id_col), (dx * dx + dy * dy).alias("d2")
        )
        merged = cand if survivors is None else survivors.unionByName(cand)
        # localCheckpoint truncates lineage each round (constant planning
        # cost); superseded rounds' checkpoint blocks are released by the
        # ContextCleaner once this rebinding drops the last reference —
        # survivor frames are per-query top-k rows, so the transient overlap
        # is k·|queries| rows, not point-table-sized
        survivors = (
            merged.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk")
            .localCheckpoint()
        )
        # native retire test: margin from query point to the boundary of the
        # examined (2·r_hi+1)² cell square; done iff k found AND dk ≤ margin²
        stats = survivors.groupBy(q_id).agg(
            F.count("*").alias("_cnt"), F.max("d2").alias("_dk")
        )
        x_lo = F.lit(grid.minx) + (F.col("_qc") - r_hi) * F.lit(grid.cell_w)
        x_hi = F.lit(grid.minx) + (F.col("_qc") + r_hi + 1) * F.lit(grid.cell_w)
        y_lo = F.lit(grid.miny) + (F.col("_qr") - r_hi) * F.lit(grid.cell_h)
        y_hi = F.lit(grid.miny) + (F.col("_qr") + r_hi + 1) * F.lit(grid.cell_h)
        margin = F.least(F.col(qx) - x_lo, x_hi - F.col(qx),
                         F.col(qy) - y_lo, y_hi - F.col(qy))
        covered_all = (
            ((F.col("_qc") - r_hi) < 0) & ((F.col("_qc") + r_hi) >= n)
            & ((F.col("_qr") - r_hi) < 0) & ((F.col("_qr") + r_hi) >= n)
        )
        done = (F.col("_cnt") >= k) & (
            covered_all | ((margin >= 0) & (F.col("_dk") <= margin * margin))
        )
        active = (
            active.join(stats, q_id, "left")
            .filter(~F.coalesce(done, F.lit(False)))
            .select(q_id, qx, qy, "_qc", "_qr")
            .localCheckpoint()
        )
        r_lo = r_hi + 1
        r_hi = min(max(2 * r_hi, 2), n)
    pts.unpersist()
    if survivors is None:  # empty query table → empty, correctly-typed result
        qt = dict(queries.dtypes)[q_id]
        it = dict(points.dtypes)[id_col]
        return points.sparkSession.createDataFrame(
            [], f"{q_id} {qt}, rank int, {id_col} {it}, d2 double"
        )
    out = (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "rank", id_col, "d2")
    )
    return out


# ---------------------------------------------------------------------------
# generic WKB × polygon-pack join (extended geometries)
# ---------------------------------------------------------------------------

def _ref_cell_col(grid: Grid, rx, ry):
    """Native (JVM) cell id of a reference corner — same arithmetic as
    ``tiling.cell_col`` but over arbitrary Column expressions."""
    n = grid.n
    ix = F.floor((rx - F.lit(grid.minx)) / F.lit(grid.cell_w)).cast("long")
    iy = F.floor((ry - F.lit(grid.miny)) / F.lit(grid.cell_h)).cast("long")
    ix = F.greatest(F.lit(0), F.least(F.lit(n - 1), ix))
    iy = F.greatest(F.lit(0), F.least(F.lit(n - 1), iy))
    return (iy * n + ix).cast("long")


def _batched_pair_eval(pack: PolygonPack, predicate: str):
    """Boolean pandas UDF (wkb, poly_id) → predicate(poly, geom) — the pack
    polygon is the CONTAINER argument, matching ``pip_refine_udf``'s
    "predicate(poly, point)" convention — batched: WKB parsed once per row,
    point-typed rows evaluated via the vectorized prepared-PIP kernel per
    poly group, extended rows via the vectorized batch-intersects /
    batch-covers / batch-II kernels (whole-array PIP/parity/segment
    passes). The DE-9IM predicates vectorize too: for point rows they are
    closed-form in the prepared locate (touches ⇔ on boundary; crosses /
    overlaps / equalsTopo ⇔ False by the dimension rules), for
    pure-polygonal rows they compose from the batched II and covers
    passes; only mixed-dimension extended rows fall back to the per-pair
    relate kernel.
    """
    from ..kernels.batchgeom import (
        GeomBatch,
        PreparedRight,
        batch_covers_right,
        batch_covers_rights,
        batch_interiors_intersect,
        batch_intersects,
        batch_line_im_probes,
    )
    from ..kernels.geom import POINT, wkb_loads
    from ..kernels.pip import BOUNDARY
    from ..kernels.predicates import _polygon_leaves, evaluate_predicate

    im_preds = ("touches", "overlaps", "equalstopo", "equals", "crosses")

    @pandas_udf("boolean")
    def _eval(wkb: pd.Series, poly_id: pd.Series) -> pd.Series:
        blobs = wkb.to_list()
        geoms_list = [wkb_loads(bytes(b)) if b is not None else None for b in blobs]
        out = np.zeros(len(geoms_list), dtype=bool)
        prepared = pack.prepared()
        pgeoms = None
        is_pt = np.array(
            [g is not None and g.gtype == POINT for g in geoms_list], dtype=bool
        )
        ext_gb = None  # lazily-built columnar batch over ALL rows
        codes, uniques = pd.factorize(poly_id.to_numpy(object))
        for j, pid in enumerate(uniques):
            sel = codes == j
            # vectorized fast path: point probes against the prepared polygon
            # (covers ≡ intersects for points; contains = interior-only)
            pt_sel = sel & is_pt
            if pt_sel.any():
                idx = np.flatnonzero(pt_sel)
                xs = np.array([geoms_list[i].coords[0, 0] for i in idx])
                ys = np.array([geoms_list[i].coords[0, 1] for i in idx])
                prep = prepared[pid]
                if predicate == "contains":
                    out[idx] = prep.contains_points(xs, ys)
                elif predicate == "touches":
                    # touches(areal, point) ⇔ point ON the boundary
                    out[idx] = prep.locate(xs, ys) == BOUNDARY
                elif predicate in im_preds:
                    pass  # crosses/overlaps/equalsTopo(areal, point) ≡ False
                else:
                    out[idx] = prep.covers_points(xs, ys)
            ext_sel = sel & ~is_pt
            if ext_sel.any():
                if pgeoms is None:
                    pgeoms = pack.geoms()
                pg = pgeoms[pid]
                idx = np.flatnonzero(ext_sel)
                if predicate == "intersects":
                    # vectorized extended path (already-parsed geoms, no
                    # second WKB decode)
                    if ext_gb is None:
                        ext_gb = GeomBatch(geoms_list)
                    out[idx] = batch_intersects(ext_gb, idx, PreparedRight(pg))
                elif predicate in ("covers", "contains") and _polygon_leaves(pg):
                    # vectorized covers/contains(pack polygon, row geometry):
                    # the polygon prepares once per group, the rows' vertices
                    # and segment midpoints locate through the whole-array
                    # prepared-PIP passes — no per-pair Python
                    if ext_gb is None:
                        ext_gb = GeomBatch(geoms_list)
                    out[idx] = batch_covers_rights(
                        ext_gb, idx, PreparedRight(pg),
                        contains=(predicate == "contains"),
                        geom_of=lambda k: geoms_list[k],
                    )
                elif predicate in im_preds:
                    # DE-9IM predicates, predicate(pg, row): batched II +
                    # covers composition for pure-polygonal rows (see
                    # pair_refine_udf), scalar relate for mixed rows
                    if ext_gb is None:
                        ext_gb = GeomBatch(geoms_list)
                    pr_pg = PreparedRight(pg)
                    purity = (
                        ext_gb.pure_poly[idx] if pr_pg.pure_poly
                        else np.zeros(len(idx), dtype=bool)
                    )
                    vi = idx[purity]
                    if len(vi) and predicate == "touches":
                        inter = batch_intersects(ext_gb, vi, pr_pg)
                        hit = vi[inter]
                        if len(hit):
                            ii = batch_interiors_intersect(
                                ext_gb, hit, pr_pg,
                                geom_of=lambda k: geoms_list[k],
                            )
                            out[hit] = ~ii
                    elif len(vi) and predicate in ("equalstopo", "equals"):
                        c_lr = batch_covers_rights(ext_gb, vi, pr_pg)
                        hit = vi[c_lr]
                        if len(hit):
                            out[hit] = batch_covers_right(ext_gb, hit, pg)
                    elif len(vi) and predicate == "overlaps":
                        ii = batch_interiors_intersect(
                            ext_gb, vi, pr_pg,
                            geom_of=lambda k: geoms_list[k],
                        )
                        hit = vi[ii]
                        if len(hit):
                            out[hit] = ~batch_covers_rights(
                                ext_gb, hit, pr_pg
                            ) & ~batch_covers_right(ext_gb, hit, pg)
                    # crosses(areal, areal) ≡ False — nothing to set
                    # pure-LINE rows: overlaps/equalsTopo constant False
                    # (dim rule); touches/crosses through the batched line
                    # probes, scalar only for probe-ambiguous rows
                    lmask = (
                        ext_gb.pure_line[idx] if pr_pg.pure_poly
                        else np.zeros(len(idx), dtype=bool)
                    )
                    vl = idx[lmask]
                    amb_rows = np.zeros(0, dtype=np.int64)
                    if len(vl) and predicate in ("touches", "crosses"):
                        ii_l, ei_l, amb_l = batch_line_im_probes(
                            ext_gb, vl, pr_pg
                        )
                        dec = ~amb_l
                        if predicate == "touches":
                            inter = batch_intersects(ext_gb, vl[dec], pr_pg)
                            out[vl[dec]] = inter & ~ii_l[dec]
                        else:
                            out[vl[dec]] = ii_l[dec] & ei_l[dec]
                        amb_rows = vl[amb_l]
                    for i in np.concatenate([idx[~purity & ~lmask], amb_rows]):
                        if geoms_list[i] is not None:
                            out[i] = evaluate_predicate(predicate, pg, geoms_list[i])
                else:
                    # general path: full relate kernel per surviving pair
                    for i in idx:
                        if geoms_list[i] is not None:
                            out[i] = evaluate_predicate(predicate, pg, geoms_list[i])
        return pd.Series(out)

    return _eval


def spatial_join_wkb(
    geoms: DataFrame,
    pack: PolygonPack,
    grid: Grid,
    predicate: str = "intersects",
    wkb_col: str = "geom_wkb",
) -> DataFrame:
    """Join arbitrary-WKB rows against the pack with multi-cell replication
    and reference-cell dedup (each pair emitted exactly once).

    The reference-cell test (pair belongs only to the cell containing the
    lower-left corner of the envelope intersection) runs as a NATIVE column
    predicate before any Python refine: the geometry envelope is computed
    once (vectorized pandas UDF), the cover explode is native ``sequence()``
    arithmetic (no per-row Python list), the polygon envelope rides on the
    broadcast cover relation, and the corner/cell arithmetic is pure
    Catalyst. A geometry replicated to k cells therefore reaches the Python
    refine exactly once, already matched to its reference cell.
    """
    from ..kernels.geom import wkb_loads
    from .tiling import envelope_struct_udf, explode_cover_native

    spark = geoms.sparkSession

    # broadcast cover relation carrying the polygon envelope mins
    rows = []
    env_by_pid = {
        e.poly_id: np.asarray(wkb_loads(e.wkb).envelope()) for e in pack.entries
    }
    for cell, poly_id in pack.cover_rows(grid):
        env = env_by_pid[poly_id]
        rows.append((cell, poly_id, float(env[0]), float(env[1])))
    cover = spark.createDataFrame(
        rows, "cell_id long, poly_id string, p_minx double, p_miny double"
    )

    tagged = geoms.withColumn("_env", envelope_struct_udf()(F.col(wkb_col)))
    cand = (
        explode_cover_native(tagged, grid)
        .withColumn("g_minx", F.col("_env.minx"))
        .withColumn("g_miny", F.col("_env.miny"))
        .drop("_env")
        .join(F.broadcast(cover), "cell_id")
    )
    # native reference-cell pre-filter (JVM, whole-stage codegen)
    ref = _ref_cell_col(
        grid,
        F.greatest(F.col("g_minx"), F.col("p_minx")),
        F.greatest(F.col("g_miny"), F.col("p_miny")),
    )
    cand = cand.filter(ref == F.col("cell_id")).drop("g_minx", "g_miny", "p_minx", "p_miny")
    return cand.filter(_batched_pair_eval(pack, predicate)(F.col(wkb_col), F.col("poly_id")))


# ---------------------------------------------------------------------------
# big × big spatial join: both sides DataFrames (no driver-held pack)
# ---------------------------------------------------------------------------

def pair_refine_udf(predicate: str = "intersects", exact_relate: bool = False):
    """Boolean pandas UDF (left_wkb, right_wkb) → predicate(left, right).

    Per Arrow batch both sides factorize to uniques (each geometry parsed /
    prepared / columnar-decoded ONCE), then the whole-array kernels
    evaluate per group:

    - ``intersects``              → ``batch_intersects`` grouped by right
      (``PreparedPolygonIntersects.cs:38-60`` batched)
    - ``covers`` / ``contains``   → ``batch_covers_rights`` grouped by the
      LEFT container (``AbstractPreparedPolygonContains.cs`` role split)
    - ``within`` / ``coveredby``  → same kernel grouped by the RIGHT
      container (the symmetric predicates)

    The boundary-sensitive DE-9IM predicates (``touches`` / ``crosses`` /
    ``overlaps`` / ``equalstopo``) vectorize too whenever BOTH sides of a
    pair are pure-polygonal — the join workload's shape — through the
    batched interior/interior kernel (``batch_interiors_intersect``) and
    the two batched covers orientations:

    - ``touches``    → intersects ∧ ¬II
    - ``overlaps``   → II ∧ ¬covers(l,r) ∧ ¬covers(r,l)
    - ``equalstopo`` → covers(l,r) ∧ covers(r,l)
    - ``crosses``    → constant False for areal × areal (dim rule)

    Pure-LINE rows against a polygonal side batch as well: overlaps /
    equalsTopo are constant False by the dimension rule, and touches /
    crosses decide through the batched interior/exterior line probes
    (``batch_line_im_probes``: vertex + proper-crossing + midpoint
    evidence with an explicit ambiguity escape). Only probe-ambiguous
    line rows (boundary-collinear / multi-contact segments),
    GeometryCollection-mixed rows, and ``exact_relate`` evaluate per pair
    through the full relate-matrix kernel — the (already envelope- and
    cell-filtered) survivor set of those is tiny.
    """
    from ..kernels.batchgeom import (
        GeomBatch,
        PreparedRight,
        batch_covers_right,
        batch_covers_rights,
        batch_interiors_intersect,
        batch_intersects,
        batch_line_im_probes,
    )
    from ..kernels.geom import wkb_loads
    from ..kernels.predicates import contains as p_contains
    from ..kernels.predicates import covers as p_covers
    from ..kernels.predicates import evaluate_predicate

    vector_fast = (not exact_relate) and predicate == "intersects"
    vector_cover = (not exact_relate) and predicate in ("covers", "contains")
    # within/coveredby are covers/contains with the roles swapped: the
    # RIGHT is the container — same vectorized kernel, grouped by right
    vector_within = (not exact_relate) and predicate in ("within", "coveredby")
    # DE-9IM predicates batch for pure-polygonal pairs (II + covers passes)
    vector_im = (not exact_relate) and predicate in (
        "touches", "overlaps", "equalstopo", "equals", "crosses"
    )
    if exact_relate:
        pair_eval = lambda a, b: evaluate_predicate(predicate, a, b)  # noqa: E731
    else:
        fast = {
            "covers": p_covers,
            "contains": p_contains,
            "coveredby": lambda a, b: p_covers(b, a),
            "within": lambda a, b: p_contains(b, a),
        }
        pair_eval = fast.get(predicate)
        if pair_eval is None:
            pair_eval = lambda a, b: evaluate_predicate(predicate, a, b)  # noqa: E731

    @pandas_udf("boolean")
    def _refine(lwkb: pd.Series, rwkb: pd.Series) -> pd.Series:
        n = len(lwkb)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        rcodes, runiq = pd.factorize(rwkb.to_numpy(object))
        if vector_fast:
            # factorize lefts too: a geometry in m candidate pairs of this
            # batch decodes into the columnar batch once, not m times
            # (batch_intersects accepts repeated indices)
            lcodes, luniq = pd.factorize(lwkb.to_numpy(object))
            gb_left = GeomBatch.from_wkb([bytes(b) for b in luniq])
            for j, blob in enumerate(runiq):
                sel = rcodes == j
                pr = PreparedRight(wkb_loads(bytes(blob)))
                out[sel] = batch_intersects(gb_left, lcodes[sel], pr)
        elif vector_cover:
            # covers/contains(left, right): group by LEFT — each left
            # prepares ONCE (the AbstractPreparedPolygonContains.cs:150-200
            # role split), rights decode into one columnar batch, and every
            # group evaluates through the whole-array vertex-coverage /
            # strict-crossing / midpoint passes. Non-polygonal lefts (which
            # cover only lower-dimensional rights) keep the scalar kernel.
            lcodes, luniq = pd.factorize(lwkb.to_numpy(object))
            gb_right = GeomBatch.from_wkb([bytes(b) for b in runiq])
            rgeom_cache: dict = {}

            def _rgeom(k: int):
                g = rgeom_cache.get(k)
                if g is None:
                    g = rgeom_cache[k] = wkb_loads(bytes(runiq[k]))
                return g

            for j, blob in enumerate(luniq):
                sel = lcodes == j
                pl = PreparedRight(wkb_loads(bytes(blob)))
                if pl.preps:
                    out[sel] = batch_covers_rights(
                        gb_right, rcodes[sel], pl,
                        contains=(predicate == "contains"), geom_of=_rgeom,
                    )
                else:
                    for i in np.flatnonzero(sel):
                        out[i] = pair_eval(pl.geom, _rgeom(int(rcodes[i])))
        elif vector_within:
            # within/coveredby(left, right) ≡ contains/covers(right, left):
            # group by the RIGHT container, batch the lefts
            lcodes, luniq = pd.factorize(lwkb.to_numpy(object))
            gb_left = GeomBatch.from_wkb([bytes(b) for b in luniq])
            lgeom_cache: dict = {}

            def _lgeom(k: int):
                g = lgeom_cache.get(k)
                if g is None:
                    g = lgeom_cache[k] = wkb_loads(bytes(luniq[k]))
                return g

            for j, blob in enumerate(runiq):
                sel = rcodes == j
                pr = PreparedRight(wkb_loads(bytes(blob)))
                if pr.preps:
                    out[sel] = batch_covers_rights(
                        gb_left, lcodes[sel], pr,
                        contains=(predicate == "within"), geom_of=_lgeom,
                    )
                else:
                    for i in np.flatnonzero(sel):
                        out[i] = pair_eval(_lgeom(int(lcodes[i])), pr.geom)
        elif vector_im:
            # touches / overlaps / equalstopo / crosses over pure-polygonal
            # pairs: batched II + covers passes, grouped by right; rows
            # with any non-areal part keep the scalar relate kernel
            lcodes, luniq = pd.factorize(lwkb.to_numpy(object))
            gb_left = GeomBatch.from_wkb([bytes(b) for b in luniq])
            lgeom_cache: dict = {}

            def _lgeom(k: int):
                g = lgeom_cache.get(k)
                if g is None:
                    g = lgeom_cache[k] = wkb_loads(bytes(luniq[k]))
                return g

            for j, blob in enumerate(runiq):
                sel = rcodes == j
                pr = PreparedRight(wkb_loads(bytes(blob)))
                vec = sel & gb_left.pure_poly[lcodes] if pr.pure_poly \
                    else np.zeros(n, dtype=bool)
                vidx_ = np.flatnonzero(vec)
                lsel = lcodes[vidx_]
                if len(vidx_):
                    if predicate == "crosses":
                        pass  # areal × areal never crosses (dim rule)
                    elif predicate == "touches":
                        inter = batch_intersects(gb_left, lsel, pr)
                        hit = np.flatnonzero(inter)
                        if len(hit):
                            ii = batch_interiors_intersect(
                                gb_left, lsel[hit], pr, geom_of=_lgeom,
                            )
                            out[vidx_[hit]] = ~ii
                    elif predicate in ("equalstopo", "equals"):
                        c_lr = batch_covers_right(gb_left, lsel, pr.geom)
                        hit = np.flatnonzero(c_lr)
                        if len(hit):
                            c_rl = batch_covers_rights(
                                gb_left, lsel[hit], pr, geom_of=_lgeom,
                            )
                            out[vidx_[hit]] = c_rl
                    else:  # overlaps
                        ii = batch_interiors_intersect(
                            gb_left, lsel, pr, geom_of=_lgeom,
                        )
                        hit = np.flatnonzero(ii)
                        if len(hit):
                            not_cov = ~batch_covers_right(
                                gb_left, lsel[hit], pr.geom,
                            ) & ~batch_covers_rights(
                                gb_left, lsel[hit], pr, geom_of=_lgeom,
                            )
                            out[vidx_[hit]] = not_cov
                # pure-LINE rows × polygonal right: the mixed-dimension
                # DE-9IM pair — overlaps/equalsTopo are constant False by
                # the dimension rule; touches = intersects ∧ ¬II and
                # crosses = II ∧ EI decide through the batched line probes
                # (kernels/batchgeom.py::batch_line_im_probes); only rows
                # the probe pass marks ambiguous (multi-contact /
                # boundary-collinear segments) reach the scalar kernel
                vl = sel & gb_left.pure_line[lcodes] if pr.pure_poly \
                    else np.zeros(n, dtype=bool)
                vlidx = np.flatnonzero(vl)
                escalate = np.zeros(0, dtype=np.int64)
                if len(vlidx):
                    llsel = lcodes[vlidx]
                    if predicate in ("overlaps", "equalstopo", "equals"):
                        pass  # dim(1) vs dim(2): constant False
                    else:
                        ii_l, ei_l, amb_l = batch_line_im_probes(
                            gb_left, llsel, pr
                        )
                        dec = ~amb_l
                        if predicate == "touches":
                            inter = batch_intersects(gb_left, llsel[dec], pr)
                            out[vlidx[dec]] = inter & ~ii_l[dec]
                        else:  # crosses
                            out[vlidx[dec]] = ii_l[dec] & ei_l[dec]
                        escalate = vlidx[amb_l]
                # scalar relate: mixed-dimension rows + ambiguous line rows
                rest = np.flatnonzero(sel & ~vec & ~vl)
                for i in np.concatenate([rest, escalate]):
                    out[i] = pair_eval(_lgeom(int(lcodes[i])), pr.geom)
        else:
            rgeoms = [wkb_loads(bytes(b)) for b in runiq]
            # factorize lefts too: a geometry in m candidate pairs of this
            # batch parses once, not m times
            lcodes, luniq = pd.factorize(lwkb.to_numpy(object))
            lgeoms = [wkb_loads(bytes(b)) for b in luniq]
            for i in range(n):
                out[i] = pair_eval(lgeoms[lcodes[i]], rgeoms[rcodes[i]])
        return pd.Series(out)

    return _refine


def choose_grid(
    left: DataFrame,
    right: DataFrame,
    extent: tuple[float, float, float, float],
    left_wkb: str = "l_wkb",
    right_wkb: str = "r_wkb",
    fraction: float = 0.01,
    max_level: int = 8,
) -> Grid:
    """Pick the cell grid for a big×big join from a SAMPLE of both sides'
    envelope spans.

    The grid level is the join's shuffle-amplification knob: each row
    explodes once per covered cell, so cells much smaller than the typical
    feature multiply the shuffle volume, while cells much larger pile
    unrelated features into the same bucket. The standard heuristic is
    cell size ≈ typical feature extent (measured 1.3–3× on the rect ×
    octagon workload vs a 2×-finer grid), estimated here as the sampled
    p75 max-span in one cheap aggregate job:

    - p75, not the mean: heavy-tailed extents (a few continent-sized
      features among millions of parcels) drag the mean toward a coarse
      grid that buckets most of the data together; the quantile tracks the
      bulk and lets the tail explode a little — the cheaper direction
      (property-tested with Zipfian extents).
    - each side's sample is topped up with ``limit(min_rows)`` rows so a
      small side (e.g. a 25-row dimension table) still contributes to the
      estimate — a pure fraction sample would draw zero rows from it and
      silently fit the grid to the big side alone.
    - point-dominated data (span ≈ 0) clamps to ``max_level`` — points
      never explode, so the finest grid only adds parallelism."""
    import math

    from .tiling import envelope_struct_udf

    env_udf = envelope_struct_udf()
    min_rows = 64
    spans = []
    for df, col in ((left, left_wkb), (right, right_wkb)):
        s = (
            df.sample(fraction=fraction, seed=7)
            .unionByName(df.limit(min_rows))
            .select(env_udf(F.col(col)).alias("_e"))
        )
        spans.append(
            s.select(
                F.greatest(
                    F.col("_e.maxx") - F.col("_e.minx"),
                    F.col("_e.maxy") - F.col("_e.miny"),
                ).alias("_span")
            )
        )
    row = (
        spans[0].unionByName(spans[1])
        # empty geometries yield NaN envelopes; NaN would poison the
        # aggregate AND slip past the <=0 guard below (NaN compares false),
        # crashing log2
        .filter(~F.isnan("_span"))
        .agg(F.percentile_approx("_span", F.lit(0.75), F.lit(10_000)))
        .first()
    )
    span = row[0] or 0.0
    minx, miny, maxx, maxy = extent
    width = max(maxx - minx, maxy - miny)
    if span <= 0 or width <= 0:
        level = max_level
    else:
        level = int(round(math.log2(width / span)))
        level = max(1, min(max_level, level))
    return Grid(minx, miny, maxx, maxy, level=level)


def spatial_join_bigbig(
    left: DataFrame,
    right: DataFrame,
    grid: Grid,
    predicate: str = "intersects",
    left_id: str = "l_id",
    right_id: str = "r_id",
    left_wkb: str = "l_wkb",
    right_wkb: str = "r_wkb",
    exact_relate: bool = False,
) -> DataFrame:
    """Distributed spatial join of TWO DataFrames of WKB geometries.

    This is the 100-TB join shape (no driver-held broadcastable side), and
    everything between the two scans and the final refine is native JVM:

    1. Each side computes its envelope with ONE vectorized pandas UDF
       (uniform WKB batches decode via a single buffer reinterpretation),
       then explodes to covering cells in pure Catalyst — two ``sequence()``
       ranges per row (a grid cover is a rectangle of cell indices). No
       Python list per row; the envelope rides along as four double columns.
    2. Candidates come from a NATIVE equi-join on ``cell_id`` — Catalyst
       picks broadcast vs shuffled hash vs sort-merge, and AQE handles
       skewed cells (hot-cell splitting) and coalesces post-shuffle
       partitions. The grid is the index; no executor-local tree build.
    3. Envelope overlap AND reference-cell dedup (pair reported only in the
       cell containing the lower-left corner of the envelope intersection —
       each pair surfaces exactly once across all cells) are whole-stage-
       codegen'd column predicates applied INSIDE the join stage, so the
       exploded rows never reach Python.
    4. Only surviving candidate pairs (true envelope hits) cross the Arrow
       boundary once, through the boolean ``pair_refine_udf`` — vectorized
       exact ``intersects`` (grouped by right geometry, whole-array
       PIP/parity/segment passes) or the per-pair DE-9IM relate fallback.

    Scale notes: shuffle volume is cover-explode amplified (rows × cells
    covered), proportional to geometry extent over cell size — the grid
    level is the knob. Output is property-tested equal to the broadcast-
    pack path.
    """
    from .tiling import envelope_struct_udf, explode_cover_native

    env_udf = envelope_struct_udf()

    def _side(df: DataFrame, id_col: str, wkb_col: str, tag: str) -> DataFrame:
        return explode_cover_native(
            df.select(F.col(id_col), F.col(wkb_col),
                      env_udf(F.col(wkb_col)).alias("_env")),
            grid,
        ).select(
            id_col, wkb_col,
            F.col("_env.minx").alias(f"{tag}minx"), F.col("_env.miny").alias(f"{tag}miny"),
            F.col("_env.maxx").alias(f"{tag}maxx"), F.col("_env.maxy").alias(f"{tag}maxy"),
            "cell_id",
        )

    lc = _side(left, left_id, left_wkb, "_l")
    rc = _side(right, right_id, right_wkb, "_r")
    # shuffle-hash hint: compile-time size stats are meaningless below a
    # Python UDF + explode (Catalyst was observed broadcasting the BIG
    # exploded side); AQE still converts to broadcast at runtime when one
    # side's true size is small, and splits skewed cells
    cand = (
        lc.join(rc.hint("shuffle_hash"), "cell_id")
        # envelope overlap (closed intervals, Envelope.cs Intersects)
        .filter(
            (F.col("_lminx") <= F.col("_rmaxx")) & (F.col("_lmaxx") >= F.col("_rminx"))
            & (F.col("_lminy") <= F.col("_rmaxy")) & (F.col("_lmaxy") >= F.col("_rminy"))
        )
        # reference-cell dedup — native corner/cell arithmetic
        .filter(
            _ref_cell_col(
                grid,
                F.greatest(F.col("_lminx"), F.col("_rminx")),
                F.greatest(F.col("_lminy"), F.col("_rminy")),
            ) == F.col("cell_id")
        )
    )
    refined = cand.filter(
        pair_refine_udf(predicate, exact_relate)(F.col(left_wkb), F.col(right_wkb))
    )
    return refined.select(left_id, right_id, "cell_id")


def within_distance_refine_udf(dist: float):
    """Boolean pandas UDF (left_wkb, right_wkb) → distance(left, right) ≤ d.

    Rights factorize to uniques (each prepared once), lefts decode into one
    columnar ``GeomBatch``; each right group evaluates through
    ``batch_within_distance`` — the batched analog of
    ``Operation/Distance/IndexedFacetDistance.cs`` (facet tree → whole-array
    vertex/facet passes, intersects short-circuit first). No per-pair
    Python."""
    from ..kernels.batchgeom import (
        GeomBatch,
        PreparedRight,
        batch_within_distance,
    )
    from ..kernels.geom import wkb_loads

    @pandas_udf("boolean")
    def _refine(lwkb: pd.Series, rwkb: pd.Series) -> pd.Series:
        n = len(lwkb)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        rcodes, runiq = pd.factorize(rwkb.to_numpy(object))
        lcodes, luniq = pd.factorize(lwkb.to_numpy(object))
        gb_left = GeomBatch.from_wkb([bytes(b) for b in luniq])
        for j, blob in enumerate(runiq):
            sel = rcodes == j
            pr = PreparedRight(wkb_loads(bytes(blob)))
            out[sel] = batch_within_distance(gb_left, lcodes[sel], pr, dist)
        return pd.Series(out)

    return _refine


def within_distance_join_geom(
    left: DataFrame,
    right: DataFrame,
    grid: Grid,
    dist: float,
    left_id: str = "l_id",
    right_id: str = "r_id",
    left_wkb: str = "l_wkb",
    right_wkb: str = "r_wkb",
) -> DataFrame:
    """Distributed within-distance join of TWO WKB DataFrames (the
    extended-geometry analog of the point within-distance join, on the
    big×big machinery).

    The LEFT side's envelope is expanded by ``dist`` before the native
    cover explode, so any right geometry within ``dist`` shares a cell with
    the expanded left. Between the scans and the refine everything is JVM:

    1. vectorized envelope UDF per side; left bounds widened by ``dist``
       in pure Catalyst before ``sequence()``-explode.
    2. native cell equi-join; the codegen prefilter is the exact ENVELOPE
       DISTANCE test (sum of squared per-axis gaps ≤ dist²) — strictly
       tighter than expanded-box overlap.
    3. reference-cell dedup over the expanded-envelope intersection corner
       (each pair refines exactly once).
    4. surviving candidates cross the Arrow boundary once into the
       vectorized facet-distance refine.
    """
    from .tiling import envelope_struct_udf, explode_cover_native

    env_udf = envelope_struct_udf()
    d = float(dist)

    def _side(df: DataFrame, id_col: str, wkb_col: str, tag: str,
              expand: float) -> DataFrame:
        base = df.select(F.col(id_col), F.col(wkb_col),
                         env_udf(F.col(wkb_col)).alias("_e0"))
        if expand:
            base = base.withColumn(
                "_env",
                F.struct(
                    (F.col("_e0.minx") - F.lit(expand)).alias("minx"),
                    (F.col("_e0.miny") - F.lit(expand)).alias("miny"),
                    (F.col("_e0.maxx") + F.lit(expand)).alias("maxx"),
                    (F.col("_e0.maxy") + F.lit(expand)).alias("maxy"),
                ),
            )
        else:
            base = base.withColumn("_env", F.col("_e0"))
        return explode_cover_native(base, grid).select(
            id_col, wkb_col,
            F.col("_e0.minx").alias(f"{tag}minx"), F.col("_e0.miny").alias(f"{tag}miny"),
            F.col("_e0.maxx").alias(f"{tag}maxx"), F.col("_e0.maxy").alias(f"{tag}maxy"),
            "cell_id",
        )

    lc = _side(left, left_id, left_wkb, "_l", d)
    rc = _side(right, right_id, right_wkb, "_r", 0.0)
    gapx = F.greatest(
        F.lit(0.0),
        F.greatest(F.col("_lminx") - F.col("_rmaxx"), F.col("_rminx") - F.col("_lmaxx")),
    )
    gapy = F.greatest(
        F.lit(0.0),
        F.greatest(F.col("_lminy") - F.col("_rmaxy"), F.col("_rminy") - F.col("_lmaxy")),
    )
    cand = (
        lc.join(rc.hint("shuffle_hash"), "cell_id")
        .filter(gapx * gapx + gapy * gapy <= F.lit(d * d))
        .filter(
            _ref_cell_col(
                grid,
                F.greatest(F.col("_lminx") - F.lit(d), F.col("_rminx")),
                F.greatest(F.col("_lminy") - F.lit(d), F.col("_rminy")),
            ) == F.col("cell_id")
        )
    )
    refined = cand.filter(
        within_distance_refine_udf(d)(F.col(left_wkb), F.col(right_wkb))
    )
    return refined.select(left_id, right_id, "cell_id")


def distance2_refine_udf():
    """Double pandas UDF (data_wkb, query_wkb) → squared facet distance.

    Queries factorize to uniques (each prepared once), data geometries
    decode into one columnar ``GeomBatch``; each query group evaluates
    through ``batch_distance2`` (intersects short-circuit to 0, else the
    exact vertex/facet sweep whose value tree matches the SQL oracles
    term for term)."""
    from ..kernels.batchgeom import GeomBatch, PreparedRight, batch_distance2
    from ..kernels.geom import wkb_loads

    @pandas_udf("double")
    def _dist2(dwkb: pd.Series, qwkb: pd.Series) -> pd.Series:
        n = len(dwkb)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            return pd.Series(out)
        qcodes, quniq = pd.factorize(qwkb.to_numpy(object))
        dcodes, duniq = pd.factorize(dwkb.to_numpy(object))
        gb = GeomBatch.from_wkb([bytes(b) for b in duniq])
        for j, blob in enumerate(quniq):
            sel = qcodes == j
            pq = PreparedRight(wkb_loads(bytes(blob)))
            out[sel] = batch_distance2(gb, dcodes[sel], pq)
        return pd.Series(out)

    return _dist2


def knn_join_geom(
    queries: DataFrame,
    data: DataFrame,
    grid: Grid,
    k: int,
    q_id: str = "q_id",
    q_wkb: str = "q_wkb",
    d_id: str = "d_id",
    d_wkb: str = "d_wkb",
    r0: float | None = None,
    max_rounds: int = 16,
) -> DataFrame:
    """k nearest DATA geometries per QUERY geometry by facet distance —
    the extended-geometry kNN join (WKB × WKB; the distributed analog of
    ``Operation/Distance/IndexedFacetDistance.cs`` under the STRtree
    branch-and-bound ``STRtree.cs:556`` retirement rule).

    Doubling-radius rounds on the big×big machinery: active queries
    explode to cells within radius R of their envelope, candidates come
    from the native cell equi-join with the codegen envelope-distance
    prefilter + reference-cell dedup, and the vectorized ``batch_distance2``
    refine scores each surviving pair. A query RETIRES once it holds k
    neighbors with k-th distance² ≤ R² — every unexamined geometry is
    provably farther (its envelope distance alone exceeds R). Remaining
    queries re-join at 2R. Driver coordination is one boolean ``isEmpty``
    scalar per round, O(log(domain/cell)) rounds; no geometry ever
    reaches the driver.
    """
    import math

    from pyspark.sql import Window
    from .tiling import envelope_struct_udf, explode_cover_native

    env_udf = envelope_struct_udf()
    cell = min(grid.cell_w, grid.cell_h)
    R = float(r0) if r0 else 2.0 * cell
    diag = math.hypot(grid.maxx - grid.minx, grid.maxy - grid.miny)
    active = queries.select(q_id, q_wkb)
    chunks: list[DataFrame] = []
    w = Window.partitionBy(q_id).orderBy(F.col("dist2").asc(), F.col(d_id).asc())

    # data side tiled ONCE (radius-independent); reused every round.
    # Cached ALREADY HASH-PARTITIONED on the join key: every round's cell
    # join then only shuffles the (tiny) query cover — the big exploded
    # relation was previously re-exchanged per round (guide §2.4: two
    # operations keyed the same way share one exchange).
    dc = explode_cover_native(
        data.select(F.col(d_id), F.col(d_wkb), env_udf(F.col(d_wkb)).alias("_env")),
        grid,
    ).select(
        d_id, d_wkb,
        F.col("_env.minx").alias("_dminx"), F.col("_env.miny").alias("_dminy"),
        F.col("_env.maxx").alias("_dmaxx"), F.col("_env.maxy").alias("_dmaxy"),
        "cell_id",
    ).repartition("cell_id").persist()

    for _ in range(max_rounds):
        last = R >= diag
        qc = explode_cover_native(
            active.select(
                F.col(q_id), F.col(q_wkb),
                env_udf(F.col(q_wkb)).alias("_e0"),
            ).withColumn(
                "_env",
                F.struct(
                    (F.col("_e0.minx") - F.lit(R)).alias("minx"),
                    (F.col("_e0.miny") - F.lit(R)).alias("miny"),
                    (F.col("_e0.maxx") + F.lit(R)).alias("maxx"),
                    (F.col("_e0.maxy") + F.lit(R)).alias("maxy"),
                ),
            ),
            grid,
        ).select(
            q_id, q_wkb,
            F.col("_e0.minx").alias("_qminx"), F.col("_e0.miny").alias("_qminy"),
            F.col("_e0.maxx").alias("_qmaxx"), F.col("_e0.maxy").alias("_qmaxy"),
            "cell_id",
        )
        gapx = F.greatest(
            F.lit(0.0),
            F.greatest(F.col("_qminx") - F.col("_dmaxx"),
                       F.col("_dminx") - F.col("_qmaxx")),
        )
        gapy = F.greatest(
            F.lit(0.0),
            F.greatest(F.col("_qminy") - F.col("_dmaxy"),
                       F.col("_dminy") - F.col("_qmaxy")),
        )
        cand = (
            # hash-build on the QUERY side (small per round; the data side
            # is the big exploded relation — building its hash relation ran
            # out of executor build memory at sf0.1)
            qc.hint("shuffle_hash").join(dc, "cell_id")
            .filter(gapx * gapx + gapy * gapy <= F.lit(R * R))
            .filter(
                _ref_cell_col(
                    grid,
                    F.greatest(F.col("_qminx") - F.lit(R), F.col("_dminx")),
                    F.greatest(F.col("_qminy") - F.lit(R), F.col("_dminy")),
                ) == F.col("cell_id")
            )
            .withColumn("dist2", distance2_refine_udf()(F.col(d_wkb), F.col(q_wkb)))
        )
        # materialize the round's candidate pipeline ONCE: retirement
        # stats, the done chunk, and the active-set update all read this
        # tiny checkpointed top-k table instead of re-running the join +
        # Python refine (which they each did — measured ~2× per round)
        ranked = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, "rank", d_id, "dist2")
            .localCheckpoint(eager=True)
        )
        stats = ranked.groupBy(q_id).agg(
            F.count("*").alias("_n"), F.max("dist2").alias("_dk")
        )
        done_ids = stats if last else stats.filter(
            (F.col("_n") == k) & (F.col("_dk") <= F.lit(R * R))
        )
        done = ranked.join(done_ids.select(q_id), q_id, "left_semi")
        chunks.append(done)
        active = active.join(done_ids.select(q_id), q_id, "left_anti")
        if last or active.isEmpty():
            break
        R *= 2.0
    dc.unpersist()
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c)
    return out
