"""Bucketed-storage co-located join: zero-Exchange plan + result equality
with the shuffle join."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from nettopologysuite_spark.engine.storage import (
        join_bucketed,
        write_bucketed,
    )

    left = spark.range(10_000).select(
        F.col("id").alias("pid"), (F.col("id") % 64).alias("cell_id")
    )
    right = spark.range(2_000).select(
        F.col("id").alias("rid"), (F.col("id") % 64).alias("cell_id")
    )
    write_bucketed(left, "nts_bkt_left", 8)
    write_bucketed(right, "nts_bkt_right", 8)
    try:
        joined = join_bucketed(spark, "nts_bkt_left", "nts_bkt_right")
        # disable AQE-broadcast conversion noise for a deterministic plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:600]
        assert "Exchange" not in plan, plan[:1500]
        # result equality with the plain shuffle join
        got = joined.count()
        expect = left.join(right, "cell_id").count()
        assert got == expect > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS nts_bkt_left")
        spark.sql("DROP TABLE IF EXISTS nts_bkt_right")
