"""Structured Streaming gates: batch-equivalence of the streamed tile
counts, watermark-bounded streaming dedup, and checkpoint resume reading
only the delta."""

import datetime as dt
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.kernels.cells import Grid  # noqa: E402
from nettopologysuite_spark.streaming import (  # noqa: E402
    run_available_now,
    stream_dedup_docs,
    stream_tile_counts,
)

GRID = Grid(0.0, 0.0, 100.0, 100.0, level=3)
PT_SCHEMA = "pid long, ts timestamp, x double, y double"
DOC_SCHEMA = "doc_id long, ts timestamp, text string"


def _write_points(spark, path, rows):
    spark.createDataFrame(rows, PT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_stream_tile_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    rows = [(i, _t(i % 5), float(i % 97), float((i * 7) % 89)) for i in range(300)]
    _write_points(spark, src, rows)

    got = run_available_now(
        stream_tile_counts(spark, src, PT_SCHEMA, GRID), ck
    )
    stream_counts = {(r.w_start, r.cell_id): r.n for r in got}

    batch = (
        spark.createDataFrame(rows, PT_SCHEMA)
        .withColumn("cell_id", F.expr(GRID.sql_cell_expr("x", "y")))
        .groupBy(F.window("ts", "1 minute"), "cell_id")
        .count()
        .collect()
    )
    batch_counts = {(r.window.start, r.cell_id): r["count"] for r in batch}
    assert stream_counts == batch_counts


def test_stream_resume_reads_only_delta(spark, tmp_path):
    from nettopologysuite_spark.streaming import run_to_parquet, stream_tile_assign

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    first = [(i, _t(1), 1.0, 1.0) for i in range(50)]
    _write_points(spark, src, first)
    run_to_parquet(stream_tile_assign(spark, src, PT_SCHEMA, GRID), out, ck)
    assert spark.read.parquet(out).count() == 50

    # grow the source; the resumed query (same checkpoint) replays from the
    # committed offsets and appends ONLY the delta — exactly-once, no
    # duplicates of the first batch
    second = [(1000 + i, _t(2), 2.0, 2.0) for i in range(20)]
    _write_points(spark, src, second)
    run_to_parquet(stream_tile_assign(spark, src, PT_SCHEMA, GRID), out, ck)
    final = spark.read.parquet(out)
    assert final.count() == 70
    assert final.filter(F.col("pid") >= 1000).count() == 20
    # cell assignment identical to the batch projection
    assert final.filter(
        F.col("cell_id") != F.expr(GRID.sql_cell_expr("x", "y"))
    ).count() == 0


def test_stream_dedup_suppresses_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    rows = [
        (1, _t(0), "alpha"), (2, _t(0, 30), "beta"),
        (3, _t(1), "alpha"),  # dup of 1 inside the watermark horizon
        (4, _t(1, 30), "gamma"), (5, _t(2), "beta"),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    got = run_available_now(
        stream_dedup_docs(spark, src, DOC_SCHEMA), ck, output_mode="append"
    )
    # one survivor per distinct text; first occurrence wins
    texts = sorted(r.text for r in got)
    assert texts == ["alpha", "beta", "gamma"]
    keep = {r.text: r.doc_id for r in got}
    assert keep["alpha"] == 1 and keep["beta"] == 2 and keep["gamma"] == 4


def test_stream_cell_envelopes_stateful(spark, tmp_path):
    """applyInPandasWithState running envelope: state persists across
    micro-batches (via the checkpoint) and the final emission per cell
    equals the batch envelope aggregate over ALL rows seen."""
    from nettopologysuite_spark.streaming import (
        run_updates_to_parquet,
        stream_cell_envelopes,
    )

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    first = [(i, _t(0), float(i % 40), float(i % 30)) for i in range(100)]
    _write_points(spark, src, first)
    run_updates_to_parquet(
        stream_cell_envelopes(spark, src, PT_SCHEMA, GRID), out, ck
    )

    second = [(200 + i, _t(1), float(50 + i % 7), float(i % 9)) for i in range(40)]
    _write_points(spark, src, second)
    run_updates_to_parquet(
        stream_cell_envelopes(spark, src, PT_SCHEMA, GRID), out, ck
    )
    # keep the LAST emission per cell (update mode re-emits per batch)
    final = {}
    for r in sorted(spark.read.parquet(out).collect(), key=lambda r: r.batch):
        final[r.cell_id] = (r.n, r.minx, r.miny, r.maxx, r.maxy)

    batch = (
        spark.createDataFrame(first + second, PT_SCHEMA)
        .withColumn("cell_id", F.expr(GRID.sql_cell_expr("x", "y")))
        .groupBy("cell_id")
        .agg(F.count("*").alias("n"), F.min("x").alias("minx"),
             F.min("y").alias("miny"), F.max("x").alias("maxx"),
             F.max("y").alias("maxy"))
        .collect()
    )
    expect = {r.cell_id: (r.n, r.minx, r.miny, r.maxx, r.maxy) for r in batch}
    # cells touched in the second run must reflect cumulative state; cells
    # only touched in run 1 were emitted then with their full totals
    for cell, vals in expect.items():
        assert final[cell] == vals, (cell, final[cell], vals)


def test_stream_late_rows_beyond_watermark_dropped(spark, tmp_path):
    """Late-data semantics: the checkpoint persists the watermark across
    runs, so a row arriving in a later run with event time older than the
    carried watermark is DROPPED from the windowed aggregate."""
    from nettopologysuite_spark.streaming import run_updates_to_parquet

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    # run 1: rows at minute 10 advance the watermark to ~minute 8
    _write_points(spark, src, [(i, _t(10), 1.0, 1.0) for i in range(10)])
    run_updates_to_parquet(stream_tile_counts(spark, src, PT_SCHEMA, GRID), out, ck)
    b1 = spark.read.parquet(out).agg(F.max("batch")).first()[0]

    # run 2 (resumed from the checkpoint, watermark carried): one late row
    # at minute 3 (< watermark) and one fresh row at minute 11 — only the
    # fresh row's window may appear among run 2's emissions
    _write_points(spark, src, [(100, _t(3), 1.0, 1.0), (101, _t(11), 1.0, 1.0)])
    run_updates_to_parquet(stream_tile_counts(spark, src, PT_SCHEMA, GRID), out, ck)
    run2 = spark.read.parquet(out).filter(F.col("batch") > b1).collect()
    starts = {r.w_start.minute for r in run2}
    assert 3 not in starts  # late row dropped
    assert any(r.w_start.minute == 11 and r.n == 1 for r in run2)


def test_stream_plans_are_jvm_side(spark, tmp_path):
    """The stateless tile-assign and windowed-count streams EXECUTE with
    Python-free physical plans — same codegen projection as the batch
    paths (the stateful envelope operator is Arrow-batched by design).
    Asserted on the last micro-batch's executed plan: the analyzed plan
    never contains the Python-exec markers, so checking it is vacuous."""
    import uuid

    from nettopologysuite_spark.streaming import stream_tile_assign

    src = str(tmp_path / "src")
    _write_points(spark, src, [(0, _t(0), 1.0, 1.0)])
    for i, df in enumerate((
        stream_tile_assign(spark, src, PT_SCHEMA, GRID),
        stream_tile_counts(spark, src, PT_SCHEMA, GRID),
    )):
        q = (
            df.writeStream.format("memory")
            .queryName("plan_probe_" + uuid.uuid4().hex[:8])
            .outputMode("append" if i == 0 else "update")
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            # a False return means timeout: the query would still be
            # running and its "last micro-batch" plan incomplete
            assert q.awaitTermination(120), "stream did not finish in 120 s"
            plan = q._jsq.explainInternal(False)  # last micro-batch physical plan
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
            # positive control: the executed plan really is inspectable and
            # contains the native projection
            assert "Project" in plan or "Aggregate" in plan
        finally:
            q.stop()


def test_stream_stream_tile_join_matches_batch(spark, tmp_path):
    """Two point streams joined on cell + event-time band: the streamed
    result set equals the equivalent batch join, pair-for-pair."""
    from nettopologysuite_spark.streaming import stream_stream_tile_join

    lsrc = str(tmp_path / "l")
    rsrc = str(tmp_path / "r")
    ck = str(tmp_path / "ck")
    lrows = [(i, _t(i % 6, (i * 13) % 60), float(i % 97), float((i * 7) % 89))
             for i in range(150)]
    rrows = [(1000 + i, _t(i % 6, (i * 29) % 60), float((i * 3) % 97),
              float((i * 11) % 89)) for i in range(150)]
    _write_points(spark, lsrc, lrows)
    _write_points(spark, rsrc, rrows)

    got = run_available_now(
        stream_stream_tile_join(spark, lsrc, rsrc, PT_SCHEMA, GRID),
        ck, output_mode="append",
    )
    stream_pairs = {(r.l_pid, r.r_pid) for r in got}

    cell = F.expr(GRID.sql_cell_expr("x", "y"))
    lb = (spark.createDataFrame(lrows, PT_SCHEMA).withColumn("cell_id", cell)
          .select(F.col("pid").alias("l_pid"), F.col("ts").alias("l_ts"),
                  F.col("cell_id").alias("l_cell")))
    rb = (spark.createDataFrame(rrows, PT_SCHEMA).withColumn("cell_id", cell)
          .select(F.col("pid").alias("r_pid"), F.col("ts").alias("r_ts"),
                  F.col("cell_id").alias("r_cell")))
    batch = lb.join(rb, (F.col("l_cell") == F.col("r_cell"))
                    & (F.col("r_ts") >= F.expr("l_ts - INTERVAL 1 minute"))
                    & (F.col("r_ts") <= F.expr("l_ts + INTERVAL 1 minute")))
    batch_pairs = {(r.l_pid, r.r_pid) for r in batch.collect()}
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0


def test_stream_stream_join_state_is_bounded(spark, tmp_path):
    """The watermark + time-band join condition evicts buffered rows: after
    draining two file batches 30 minutes apart (one micro-batch each via
    maxFilesPerTrigger), the join's state store holds fewer rows than the
    total ingested — unbounded buffering would hold them all."""
    import uuid

    from nettopologysuite_spark.streaming import stream_stream_tile_join

    lsrc = str(tmp_path / "l")
    rsrc = str(tmp_path / "r")
    ck = str(tmp_path / "ck")
    early_l = [(i, _t(0, i % 60), float(i % 97), float((i * 7) % 89))
               for i in range(100)]
    early_r = [(500 + i, _t(0, (i * 3) % 60), float((i * 3) % 97),
                float((i * 11) % 89)) for i in range(100)]
    late_l = [(200 + i, _t(30, i % 60), float(i % 97), float((i * 7) % 89))
              for i in range(20)]
    late_r = [(700 + i, _t(30, i % 60), float((i * 3) % 97),
               float((i * 11) % 89)) for i in range(20)]
    # two files per side, written as separate appends → separate batches
    _write_points(spark, lsrc, early_l)
    _write_points(spark, rsrc, early_r)
    _write_points(spark, lsrc, late_l)
    _write_points(spark, rsrc, late_r)

    df = stream_stream_tile_join(spark, lsrc, rsrc, PT_SCHEMA, GRID,
                                 max_files_per_trigger=1)
    name = "ssj_" + uuid.uuid4().hex[:8]
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(180), "drain timed out"
        progresses = [p for p in q.recentProgress if p and p.get("stateOperators")]
        assert progresses, "no state operator progress recorded"
        last_state = progresses[-1]["stateOperators"][0]
        total_ingested = 240
        assert last_state["numRowsTotal"] < total_ingested, last_state
        # the early horizon (minute 0) is fully evicted once the watermark
        # reaches minute ~28: only the late batch can remain buffered
        assert last_state["numRowsTotal"] <= 40, last_state
    finally:
        q.stop()
        spark.catalog.dropTempView(name)


def test_stream_pip_join_matches_batch(spark, tmp_path):
    """Stream-static enrichment join (point stream × broadcast polygon
    pack): streamed rows equal the batch PIP join row-for-row; resumed
    drains enrich only the delta."""
    import __spark_entry__ as E
    from nettopologysuite_spark.engine.joins import pip_join_points
    from nettopologysuite_spark.streaming import stream_pip_join

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    pack = E._octagon_pack(E._nation_keys(spark, "/root/testdata/sf0.001"))
    grid = E.GRID
    out = str(tmp_path / "out")
    rows = [(i, _t(i % 5), float(i % 97), float((i * 7) % 89)) for i in range(400)]
    _write_points(spark, src, rows)
    from nettopologysuite_spark.streaming import run_to_parquet

    run_to_parquet(stream_pip_join(spark, src, PT_SCHEMA, pack, grid), out, ck)
    got = spark.read.parquet(out)
    stream_pairs = {(r.pid, r.poly_id) for r in got.collect()}
    batch = pip_join_points(
        spark.createDataFrame(rows, PT_SCHEMA), pack, grid
    )
    batch_pairs = {(r.pid, r.poly_id) for r in batch.collect()}
    assert stream_pairs == batch_pairs and len(stream_pairs) > 0

    # delta-only resume (file sink + checkpoint = exactly-once)
    more = [(1000 + i, _t(6), 10.0, 10.0) for i in range(20)]
    _write_points(spark, src, more)
    run_to_parquet(stream_pip_join(spark, src, PT_SCHEMA, pack, grid), out, ck)
    final = spark.read.parquet(out)
    new_pids = {r.pid for r in final.filter(F.col("pid") >= 1000).collect()}
    # (10, 10) is nation 0's octagon center → every delta row enriches
    assert new_pids == {1000 + i for i in range(20)}
    assert final.count() == len(stream_pairs) + 20


def test_stream_near_dedup_suppresses_near_duplicates(spark, tmp_path):
    """Single-band MinHash bucket dedup: identical bigram sets collapse
    (regardless of word multiplicity/order-preserving repetition), distinct
    content passes; first occurrence wins."""
    from nettopologysuite_spark.streaming import stream_near_dedup

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    rows = [
        (1, _t(0), "the quick brown fox jumps"),
        (2, _t(0, 30), "a completely different document body"),
        # identical bigram SET (signature is set-based, multiplicity-blind:
        # an exact content repeat lands in the same bucket)
        (3, _t(1), "the quick brown fox jumps"),
        (4, _t(1, 30), "yet another novel text entirely"),
        (5, _t(2), "a completely different document body"),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    got = run_available_now(
        stream_near_dedup(spark, src, DOC_SCHEMA), ck, output_mode="append"
    )
    keep = {r.text: r.doc_id for r in got}
    assert sorted(keep) == [
        "a completely different document body",
        "the quick brown fox jumps",
        "yet another novel text entirely",
    ]
    assert keep["the quick brown fox jumps"] == 1
    assert keep["a completely different document body"] == 2


def test_stream_near_dedup_matches_batch_buckets(spark, tmp_path):
    """Batch-equivalence: the streaming survivors are exactly the batch
    first-per-bucket selection with the SAME signature expressions."""
    from pyspark.sql import functions as F

    from nettopologysuite_spark.streaming import stream_near_dedup

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    import random

    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(60):
        base = [vocab[rng.randrange(len(vocab))] for _ in range(6)]
        rows.append((i, _t(i // 10, i % 10), " ".join(base)))
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    got = {r.doc_id for r in run_available_now(
        stream_near_dedup(spark, src, DOC_SCHEMA), ck, output_mode="append")}

    # batch twin
    P = (1 << 31) - 1
    df = (
        spark.read.parquet(src)
        .withColumn("_ws", F.split(F.trim(F.col("text")), r"\s+"))
        .withColumn("_grams", F.zip_with(
            F.slice(F.col("_ws"), 1, F.size("_ws") - 1),
            F.slice(F.col("_ws"), 2, F.size("_ws") - 1),
            lambda a, b: F.concat_ws(" ", a, b)))
        .withColumn("_h1", F.transform(F.col("_grams"), lambda g: F.pmod(F.xxhash64(g), F.lit(P))))
        .withColumn("_h2", F.transform(F.col("_grams"), lambda g: F.pmod(F.xxhash64(F.lit(1), g), F.lit(P))))
    )
    sig_cols = [F.array_min(F.zip_with(F.col("_h1"), F.col("_h2"),
                lambda a, b: F.pmod(a + F.lit(i) * b, F.lit(P)))) for i in range(16)]
    df = df.withColumn("_bucket", F.xxhash64(*sig_cols))
    from pyspark.sql import Window

    w = Window.partitionBy("_bucket").orderBy("ts", "doc_id")
    want = {r.doc_id for r in df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1").collect()}
    assert got == want
