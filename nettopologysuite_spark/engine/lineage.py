"""Checkpointed, resumable pipeline stages with per-partition lineage.

North-rule realization (BASELINE.json: "resumable from checkpoint with
per-partition lineage + metrics"). On Iceberg the commit is a snapshot; in
the sandbox the same contract is realized with atomic parquet directories:

- each stage writes its output parquet, then a ``_lineage`` parquet holding
  per-partition row counts + key ranges + wall time, then a ``_STAGE_OK``
  marker — marker last, so a crash anywhere leaves the stage incomplete and
  a re-run recomputes it (write-ahead ordering = snapshot-commit analog);
- ``run_stage`` short-circuits to the committed output when the marker
  exists: any failed run resumes from the last committed stage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _marker(path: str) -> str:
    return os.path.join(path, "_STAGE_OK")


def stage_is_committed(path: str) -> bool:
    return os.path.exists(_marker(path))


def partition_lineage(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """(partition_id, n_rows[, key_min, key_max]) per partition."""
    df2 = df.withColumn("_pid", F.spark_partition_id())
    aggs = [F.count("*").alias("n_rows")]
    if key_col:
        aggs += [F.min(key_col).alias("key_min"), F.max(key_col).alias("key_max")]
    return df2.groupBy("_pid").agg(*aggs).withColumnRenamed("_pid", "partition_id")


def run_stage(
    spark: SparkSession,
    out_dir: str,
    build: "callable[[], DataFrame]",
    key_col: str | None = None,
    stage_name: str | None = None,
) -> DataFrame:
    """Execute-or-resume a pipeline stage.

    Returns the stage output DataFrame (reading the committed parquet). The
    lineage table lands at ``{out_dir}/_lineage`` and run metrics in the
    marker JSON.
    """
    data_dir = os.path.join(out_dir, "data")
    if stage_is_committed(out_dir):
        return spark.read.parquet(data_dir)
    t0 = time.time()
    df = build()
    df.write.mode("overwrite").parquet(data_dir)
    out = spark.read.parquet(data_dir)
    lineage = partition_lineage(out, key_col)
    lineage.write.mode("overwrite").parquet(os.path.join(out_dir, "_lineage"))
    n_rows = out.count()
    wall = time.time() - t0
    with open(_marker(out_dir), "w") as f:
        json.dump(
            {
                "stage": stage_name or os.path.basename(out_dir),
                "rows": n_rows,
                "wall_sec": round(wall, 3),
                "committed_at": time.time(),
            },
            f,
        )
    return out


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_lineage"))
