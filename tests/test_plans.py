"""Physical-plan quality gates: the engine must produce the plans it
promises — broadcast cell joins, filter/column pushdown into scans, native
whole-stage-codegen tiling, sort-merge with salting where requested."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_join_is_broadcast(spark, sf_dir):
    df = E.q_pip_convex_join(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:500]
    assert "SortMergeJoin" not in plan


def test_tile_assign_is_pure_codegen(spark, sf_dir):
    df = E.q_tile_assign(spark, sf_dir)
    plan = _plan(df)
    # no Python evaluation anywhere in the tiling projection
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # '*(n)' prefixes mark whole-stage-codegen stages in the compact form
    assert "*(" in plan


def test_scan_pushdown(spark, sf_dir):
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    q = events.filter(F.col("event_id") < 100).select("event_id")
    plan = q.queryExecution if False else q._jdf.queryExecution().toString()
    # filter reaches the parquet scan; only the needed column is read
    assert "PushedFilters: [" in plan and "LessThan(event_id,100)" in plan, plan[-800:]
    assert "ReadSchema: struct<event_id:bigint>" in plan


def test_within_distance_refine_is_native(spark, sf_dir):
    df = E.q_within_dist_join(spark, sf_dir)
    plan = _plan(df)
    # the squared-distance refinement stays JVM-side
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_poly_poly_join_shape(spark, sf_dir):
    df = E.q_poly_poly_join(spark, sf_dir)
    plan = _plan(df)
    # the big×big path: NATIVE equi-join on cell_id (shuffled-hash; AQE may
    # convert to broadcast at runtime from true sizes — never from the
    # meaningless compile-time stats below a Python UDF), envelope-overlap +
    # reference-cell dedup inside the join condition (JVM), and exactly TWO
    # Python crossings: the vectorized envelope UDF per side feeding the
    # native sequence()-explode, and the refine above the join
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan[:800]
    assert "FLOOR" in plan  # native ref-cell arithmetic in the join condition
    assert plan.count("ArrowEvalPython") == 3  # env × 2 sides + refine
    # the cover explode is native sequence(), not a Python array UDF
    assert "sequence(greatest(" in plan, plan[:800]


def test_within_dist_df_join_is_native(spark, sf_dir):
    """Table-driven within-distance join: native cover explode + equi-join +
    codegen distance refine — zero Python in the whole plan."""
    plan = _plan(E.q_within_dist_join_df(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "sequence(" in plan  # native cover explode


def test_geo_dedup_is_pure_codegen(spark, sf_dir):
    plan = _plan(E.q_geo_dedup(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_media_stats_is_native(spark, sf_dir):
    plan = _plan(E.q_media_stats(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_embed_dedup_is_native(spark, sf_dir):
    """LSH signatures, bucket self-join, and exact cosine re-check are all
    JVM higher-order expressions — zero Python in the plan."""
    plan = _plan(E.q_embed_dedup(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_text_scoring_is_native_single_split(spark, sf_dir):
    """lang_id/doc_quality: no Python, and marker counts come from ONE
    split (array filters), not per-marker replace scans."""
    for q in (E.q_lang_id, E.q_doc_quality):
        plan = _plan(q(spark, sf_dir))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "replace" not in plan.lower().replace("regexp_replace", "")


def test_poly_poly_contains_shape(spark, sf_dir):
    """Containment big×big join: same native candidate machinery as
    poly_poly_join, refine through the vectorized batch-covers kernel —
    exactly 3 Python crossings (2 envelope UDFs + 1 vectorized refine),
    zero per-pair Python."""
    df = E.q_poly_poly_contains(spark, sf_dir)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan[:800]
    assert "FLOOR" in plan
    assert plan.count("ArrowEvalPython") == 3
    assert "sequence(greatest(" in plan, plan[:800]


def test_within_dist_join_geom_shape(spark, sf_dir):
    """Extended within-distance join: native cell equi-join, codegen
    envelope-distance prefilter, exactly 3 Python crossings."""
    df = E.q_within_dist_join_geom(spark, sf_dir)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan[:800]
    assert plan.count("ArrowEvalPython") == 3
    assert "sequence(greatest(" in plan, plan[:800]


def test_poly_poly_touches_shape(spark, sf_dir):
    """Touches big×big join: same native candidate machinery, refine through
    the batched DE-9IM composition (intersects ∧ ¬interior/interior) —
    exactly 3 Python crossings (2 envelope UDFs + 1 vectorized refine),
    zero per-pair Python on the pure-polygonal workload."""
    df = E.q_poly_poly_touches(spark, sf_dir)
    plan = _plan(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan[:800]
    assert plan.count("ArrowEvalPython") == 3
    assert "sequence(greatest(" in plan, plan[:800]
