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


def test_spark_submit_with_py_files_zip(tmp_path):
    """The north-rule launch contract, end-to-end: package the engine as a
    zip, spark-submit the shim with --py-files from a CLEAN cwd (the
    package must resolve only through the zip), and check the job commits
    its stages and prints the summary."""
    import os
    import shutil
    import subprocess
    import zipfile

    repo = Path(__file__).resolve().parent.parent
    pkg_zip = tmp_path / "nettopologysuite_spark.zip"
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((repo / "nettopologysuite_spark").rglob("*.py")):
            zf.write(p, p.relative_to(repo))
    shim = tmp_path / "submit_docs_join.py"
    shutil.copy(repo / "submit_docs_join.py", shim)
    out = tmp_path / "job_out"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(pkg_zip), str(shim),
            "--input", "/root/testdata/sf0.001", "--output", str(out),
            "--level", "6",
        ],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("oct-")]
    assert len(lines) > 0
    total = sum(int(ln.split("\t")[1]) for ln in lines)
    assert total == 145  # matches the oracle-gated docs_pip_join at sf0.001
    for stage in ("docs", "joined", "summary"):
        assert (out / stage / "_STAGE_OK").exists()
