"""1-D interval operators: interval join and as-of join.

The reference's only interval machinery is 1-D stabbing —
``Index/IntervalRTree/SortedPackedIntervalRTree.cs:1-146`` (static y-interval
tree inside the PIP locator) and ``Index/Bintree/Bintree.cs:1-202``. SURVEY
§2.8 maps those to the relational *interval join* / *as-of join* analogs;
this module provides the distributed dataflow forms:

- ``interval_join``: overlapping (closed-interval) pairs of two interval
  DataFrames via 1-D binning — the exact 1-D specialization of the spatial
  cell join: native ``sequence()`` cover explode, equi-join on bin id,
  reference-bin dedup (each pair emitted exactly once, no distinct needed),
  codegen overlap refine. Zero Python anywhere.
- ``asof_join``: for each query row (key, t), the latest event of the same
  key with ``event_time <= t`` — the classic union+window formulation: one
  shuffle on the key, a single ordered window pass with
  ``last(..., ignorenulls=True)``. Zero Python.

Scale notes: ``interval_join`` shuffle volume is amplified by intervals'
bin-cover width (bin width is the knob, exactly like the 2-D grid level);
AQE splits skewed bins. ``asof_join`` is one hash shuffle on the key; a
single hot key serializes inside its window sort — at scale, hot keys
range-partition by (key, time) with per-range boundary carry (the 1-D salt
analog), which this sandbox's 150-user fixture does not need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bin_col(lo: Column, minv: float, bin_w: float, nbins: int) -> Column:
    b = F.floor((lo - F.lit(minv)) / F.lit(bin_w)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(nbins - 1), b))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    minv: float,
    maxv: float,
    nbins: int = 64,
    l_lo: str = "l_lo",
    l_hi: str = "l_hi",
    r_lo: str = "r_lo",
    r_hi: str = "r_hi",
) -> DataFrame:
    """All (left, right) row pairs whose closed intervals overlap:
    ``l_lo <= r_hi AND l_hi >= r_lo``.

    Both sides explode to the bins their interval covers (a contiguous run
    of bin indices → one native ``sequence()`` per row), candidates come
    from the bin equi-join, and each overlapping pair survives only in its
    REFERENCE bin — the bin containing ``greatest(l_lo, r_lo)``, which lies
    in both covers whenever the intervals overlap — so every pair is
    emitted exactly once with no ``distinct`` shuffle. The 1-D form of the
    spatial reference-cell rule (``engine/joins.py``).

    Output: all columns of both inputs (names must not collide — including
    the four bound columns, which is why the defaults are side-prefixed)
    plus ``overlap`` = length of the intersection.
    """
    shared = {l_lo, l_hi} & {r_lo, r_hi}
    if shared:
        raise ValueError(f"bound columns collide across sides: {sorted(shared)}")
    bin_w = (maxv - minv) / nbins

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        b_lo = _bin_col(F.col(lo), minv, bin_w, nbins)
        b_hi = _bin_col(F.col(hi), minv, bin_w, nbins)
        return df.withColumn("_bin", F.explode(F.sequence(b_lo, b_hi)))

    lc = _explode(left, l_lo, l_hi)
    rc = _explode(right, r_lo, r_hi)
    ref = _bin_col(F.greatest(F.col(l_lo), F.col(r_lo)), minv, bin_w, nbins)
    return (
        lc.join(rc, "_bin")
        .filter((F.col(l_lo) <= F.col(r_hi)) & (F.col(l_hi) >= F.col(r_lo)))
        .filter(ref == F.col("_bin"))
        .withColumn(
            "overlap",
            F.least(F.col(l_hi), F.col(r_hi)) - F.greatest(F.col(l_lo), F.col(r_lo)),
        )
        .drop("_bin")
    )


def asof_join(
    events: DataFrame,
    queries: DataFrame,
    key: str = "user_id",
    ev_time: str = "ts",
    ev_id: str = "event_id",
    q_time: str = "q_ts",
    q_id: str = "q_id",
) -> DataFrame:
    """Latest event per query: for each query row, the event of the same
    ``key`` with the greatest ``ev_time <= q_time`` (ties on time broken by
    the greatest ``ev_id``).

    Union the two sides tagged with ``is_q`` (events sort BEFORE queries at
    equal times, making the match inclusive), then one window pass ordered
    by (time, is_q, id) carrying the running last event id/time with
    ``last(..., ignorenulls=True)``. Exactly one shuffle (hash on key); the
    window's running-last is computed streamingly by the sort-based window
    exec — no quadratic frame re-scan.

    Output: (q_id, key, ev_id, lag_us) — unmatched queries get -1/-1 so the
    result is null-free (stable hashing across engines). ``lag_us`` is the
    microsecond gap ``q_time - matched ev_time``.
    """
    def _micros(df: DataFrame, col: str) -> Column:
        """Microseconds-since-epoch of a timestamp column, timezone-free.

        Parquet NTZ timestamps go through ``timestampdiff`` from a naive
        epoch literal (no session-timezone reinterpretation — matches
        DuckDB's ``epoch_us`` bit-for-bit); instant timestamps use
        ``unix_micros`` directly."""
        if dict(df.dtypes)[col] == "timestamp_ntz":
            return F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
            )
        return F.unix_micros(F.col(col))

    ev = events.select(
        F.col(key).alias("_k"),
        _micros(events, ev_time).alias("_t"),
        F.lit(0).alias("_is_q"),
        F.col(ev_id).cast("long").alias("_eid"),
        F.lit(None).cast("long").alias("_qid"),
    )
    q = queries.select(
        F.col(key).alias("_k"),
        _micros(queries, q_time).alias("_t"),
        F.lit(1).alias("_is_q"),
        F.lit(None).cast("long").alias("_eid"),
        F.col(q_id).cast("long").alias("_qid"),
    )
    u = ev.unionByName(q)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_q", F.coalesce(F.col("_eid"), F.col("_qid")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "_k", "_t", "_is_q", "_qid",
        F.last("_eid", ignorenulls=True).over(w).alias("_m_eid"),
        F.last(F.when(F.col("_is_q") == 0, F.col("_t")), ignorenulls=True)
        .over(w).alias("_m_t"),
    )
    return matched.filter(F.col("_is_q") == 1).select(
        F.col("_qid").alias(q_id),
        F.col("_k").alias(key),
        F.coalesce(F.col("_m_eid"), F.lit(-1)).alias("evt_id"),
        F.coalesce(F.col("_t") - F.col("_m_t"), F.lit(-1)).alias("lag_us"),
    )
