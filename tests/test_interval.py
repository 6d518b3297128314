"""Interval-join / as-of-join gates: brute-force equality, exactly-once pair
emission (reference-bin dedup), and zero-Python plans.

Reference semantics: 1-D interval stabbing per
``Index/IntervalRTree/SortedPackedIntervalRTree.cs:1-146`` /
``Index/Bintree/Bintree.cs:1-202``; SURVEY §2.8 maps these to the
relational interval/as-of join analogs."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nettopologysuite_spark.engine.interval import asof_join, interval_join  # noqa: E402


@pytest.fixture()
def intervals(spark):
    left = spark.createDataFrame(
        [(i, float((i * 37) % 100), float((i * 37) % 100 + 1 + i % 5))
         for i in range(200)],
        "a_id long, a_lo double, a_hi double",
    )
    right = spark.createDataFrame(
        [(j, float((j * 53) % 100), float((j * 53) % 100 + 1 + j % 3))
         for j in range(60)],
        "b_id long, b_lo double, b_hi double",
    )
    return left, right


def _brute(left, right):
    out = set()
    for a in left.collect():
        for b in right.collect():
            if a.a_lo <= b.b_hi and a.a_hi >= b.b_lo:
                out.add((a.a_id, b.b_id))
    return out


def test_interval_join_matches_brute_force(spark, intervals):
    left, right = intervals
    got = interval_join(left, right, 0.0, 106.0, nbins=16,
                        l_lo="a_lo", l_hi="a_hi", r_lo="b_lo", r_hi="b_hi")
    rows = got.select("a_id", "b_id").collect()
    # exactly once per pair: no dup rows even though intervals span many bins
    assert len(rows) == len({(r.a_id, r.b_id) for r in rows})
    assert {(r.a_id, r.b_id) for r in rows} == _brute(left, right)


def test_interval_join_touching_endpoints_inclusive(spark):
    left = spark.createDataFrame([(1, 0.0, 5.0)], "a_id long, a_lo double, a_hi double")
    right = spark.createDataFrame(
        [(1, 5.0, 7.0), (2, 7.5, 8.0)], "b_id long, b_lo double, b_hi double"
    )
    got = interval_join(left, right, 0.0, 10.0, nbins=4,
                        l_lo="a_lo", l_hi="a_hi", r_lo="b_lo", r_hi="b_hi")
    rows = got.collect()
    assert [(r.a_id, r.b_id, r.overlap) for r in rows] == [(1, 1, 0.0)]


def test_interval_join_plan_has_no_python(spark, intervals):
    left, right = intervals
    got = interval_join(left, right, 0.0, 106.0, nbins=16,
                        l_lo="a_lo", l_hi="a_hi", r_lo="b_lo", r_hi="b_hi")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_asof_join_matches_brute_force(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    queries = events.filter(F.col("event_id") % 7 == 3).select(
        F.col("event_id").alias("q_id"), "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 MINUTE")).alias("q_ts"),
    )
    got = {r.q_id: (r.evt_id, r.lag_us)
           for r in asof_join(events, queries).collect()}

    ev = [(r.user_id, r.ts, r.event_id) for r in events.collect()]
    expect = {}
    for q in queries.collect():
        cands = [(ts, eid) for (u, ts, eid) in ev
                 if u == q.user_id and ts <= q.q_ts]
        if cands:
            ts, eid = max(cands)  # latest ts, ties to max event_id
            d = q.q_ts - ts
            expect[q.q_id] = (
                eid,
                d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds,
            )
        else:
            expect[q.q_id] = (-1, -1)
    assert got == expect
    # every query appears exactly once
    assert len(got) == queries.count()


def test_asof_join_inclusive_and_tie_break(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, t0, 10), (1, t0, 11), (2, t0, 20)],
        "user_id long, ts timestamp, event_id long",
    )
    queries = spark.createDataFrame(
        [(100, 1, t0), (101, 2, t0 - dt.timedelta(seconds=1))],
        "q_id long, user_id long, q_ts timestamp",
    )
    got = {r.q_id: (r.evt_id, r.lag_us) for r in asof_join(events, queries).collect()}
    # inclusive match at equal ts; tie at equal ts broken to the MAX event id
    assert got[100] == (11, 0)
    # no event at or before the query time → sentinel
    assert got[101] == (-1, -1)


def test_asof_join_plan_has_no_python_single_shuffle(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    queries = events.filter(F.col("event_id") % 7 == 3).select(
        F.col("event_id").alias("q_id"), "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 MINUTE")).alias("q_ts"),
    )
    out = asof_join(events, queries)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # one shuffle: the window's hash partitioning on the key (both union
    # branches repartition under the same exchange → ≤2 Exchange nodes)
    assert plan.count("Exchange") <= 2
