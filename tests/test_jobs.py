"""The spark-submit job: staged execution, lineage, and resume-from-commit."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from nettopologysuite_spark.engine.lineage import read_lineage, stage_is_committed  # noqa: E402
from nettopologysuite_spark.jobs.docs_join_job import run  # noqa: E402


def test_docs_join_job_runs_and_resumes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "job")
    t_first = time.time()
    summary = run(spark, sf_dir, out)
    got = {(r["poly_id"], r["n_docs"]) for r in summary.collect()}
    first_run = time.time() - t_first
    # agrees with the oracle-gated query
    expect_rows = E.q_docs_pip_join(spark, sf_dir).groupBy("poly_id").count().collect()
    expect = {(r["poly_id"], r["count"]) for r in expect_rows}
    assert got == expect
    # all three stages committed with lineage
    for stage in ("docs", "joined", "summary"):
        assert stage_is_committed(f"{out}/{stage}")
        lineage = read_lineage(spark, f"{out}/{stage}")
        assert lineage.agg({"n_rows": "sum"}).collect()[0][0] > 0
    # resume: a second run must short-circuit to the committed outputs
    t0 = time.time()
    summary2 = run(spark, sf_dir, out)
    resumed_in = time.time() - t0
    assert {(r["poly_id"], r["n_docs"]) for r in summary2.collect()} == got
    # reading committed parquet, not recomputing — bounded RELATIVE to this
    # host's observed speed (absolute wall bounds flake on a drifting VM)
    assert resumed_in < max(5.0, 0.75 * first_run)
