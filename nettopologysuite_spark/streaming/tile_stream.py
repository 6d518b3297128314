"""Structured Streaming forms of the tiling + dedup operators.

The reference is batch/in-memory (SURVEY §2.8: streaming entirely absent),
but a training-data pipeline ingests continuously; these are the streaming
re-expressions of the engine's two cheapest-to-state operators, built on
the SAME kernels/expressions as the batch paths so batch and stream agree:

- ``stream_tile_counts``: event-time windowed per-cell counts over a file
  stream of point rows. Tile assignment is the identical codegen projection
  as the batch ``tiling.cell_col``; the window + watermark bound state (late
  rows beyond the watermark are dropped — the documented trade; at 100 TB
  the analog is a Kafka source with the same plan).
- ``stream_dedup_docs``: streaming exact dedup — ``dropDuplicates`` on the
  content hash with a watermark so the dedup state ages out instead of
  growing forever (the streaming form of ``engine/dedup.exact_dedup``;
  within the watermark horizon duplicates are suppressed exactly).

Both run off any file-source directory (parquet), checkpoint to a caller
directory, and resume incrementally from the checkpoint's offset log —
pytest restarts a query over a grown source dir and checks only the delta
was read (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..kernels.cells import Grid
from ..engine.tiling import cell_col


def stream_tile_counts(
    spark: SparkSession,
    src_dir: str,
    schema: StructType | str,
    grid: Grid,
    ts: str = "ts",
    x: str = "x",
    y: str = "y",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(event-time window, cell) counts over a streaming point source.

    The watermark caps aggregation state: a window finalizes once event
    time passes its end + watermark, and later-arriving rows for it are
    dropped. ``update``/``append`` output modes both work; the pytest gate
    uses availableNow + update for deterministic batch-equivalence."""
    src = (
        spark.readStream.schema(schema).parquet(src_dir)
        .withColumn("cell_id", cell_col(grid, x, y))
        .withWatermark(ts, watermark)
    )
    return src.groupBy(F.window(F.col(ts), window), F.col("cell_id")).agg(
        F.count("*").alias("n")
    ).select(
        F.col("window.start").alias("w_start"), "cell_id", "n"
    )


def stream_tile_assign(
    spark: SparkSession,
    src_dir: str,
    schema: StructType | str,
    grid: Grid,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Stateless streaming tile assignment — the identical codegen cell
    projection as the batch path, over a file stream. Pairs with a file
    sink + checkpoint for exactly-once incremental ingest (the resume
    gate): a restarted query replays from the committed source offsets and
    writes only the delta."""
    return (
        spark.readStream.schema(schema).parquet(src_dir)
        .withColumn("cell_id", cell_col(grid, x, y))
    )


def run_to_parquet(stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
                   timeout_s: int = 120) -> None:
    """Drain available input into a parquet file sink (exactly-once via the
    checkpoint's offset + commit logs), then stop."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def stream_dedup_docs(
    spark: SparkSession,
    src_dir: str,
    schema: StructType | str,
    ts: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash within
    the watermark horizon passes through; subsequent duplicates are
    suppressed. State is keyed by (hash) and aged out by the watermark —
    bounded memory at any stream length."""
    src = (
        spark.readStream.schema(schema).parquet(src_dir)
        .withColumn("_h", F.md5(F.col(text_col)))
        .withWatermark(ts, watermark)
    )
    return src.dropDuplicatesWithinWatermark(["_h"]).drop("_h")


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      output_mode: str = "update", timeout_s: int = 120) -> list:
    """Drain everything currently available into an in-memory sink and
    return the rows — the deterministic test/driver harness for the
    streaming operators (processes all pending files in micro-batches,
    commits offsets to ``checkpoint_dir``, then stops; a later call resumes
    from those offsets and reads only new files)."""
    import uuid

    name = "s" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    rows = stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()
    return rows
