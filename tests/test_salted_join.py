"""Salting correctness: the salted sort-merge cell join must produce exactly
the broadcast join's rows (SURVEY.md §7.3 #4 property test)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from nettopologysuite_spark.engine.joins import (  # noqa: E402
    pip_join_points,
    pip_join_points_sortmerge,
)


def test_salted_sortmerge_equals_broadcast(spark, sf_dir):
    pts = E._event_points(spark, sf_dir)
    pack = E._octagon_pack(E._nation_keys(spark, sf_dir))
    base = {
        (r["pid"], r["poly_id"])
        for r in pip_join_points(pts, pack, E.GRID, "covers").collect()
    }
    # threshold=5 forces salting of nearly every occupied cell
    salted = pip_join_points_sortmerge(
        pts, pack, E.GRID, "covers", hot_cell_threshold=5, id_col="pid"
    )
    got = [(r["pid"], r["poly_id"]) for r in salted.collect()]
    assert len(got) == len(set(got)), "salting must not duplicate pairs"
    assert set(got) == base
    # physical plan: really a sort-merge join, not a broadcast
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:400]
