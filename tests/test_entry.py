"""Integration tests: driver contract (entry/queries/oracles) + invariants."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E  # noqa: E402
from tests.oracle_check import compare, duck_con  # noqa: E402

FAST_ORACLE_QUERIES = [
    "tile_assign",
    "tile_morton",
    "pip_rect_join",
    "pip_convex_join",
    "within_dist_join",
    "knn_join",
    "docs_pip_join",
    "dedup_exact",
]


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "poly_id"}


# Queries with a documented rows-only driver check (no DuckDB oracle):
# geo_kmeans is an ITERATIVE algorithm (Lloyd) — per the driver contract
# those may omit oracle_sql(); its pytest gate pins argmin optimality,
# monotone inertia, and the centroid fixpoint instead.
ROWS_ONLY: set[str] = {"geo_kmeans"}


def test_queries_have_oracles_or_documented_skip():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == ROWS_ONLY


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    con = duck_con(sf_dir)
    spdf = E.queries()[name](spark, sf_dir).toPandas()
    dpdf = con.execute(E.oracle_sql()[name]).df()
    problems = compare(name, spdf, dpdf)
    assert not problems, problems


def test_span_invariant(spark, sf_dir):
    from nettopologysuite_spark.engine.docs import (
        check_span_invariant,
        docs_spatial_join,
        synthesize_docs,
    )

    pack = E._octagon_pack(E._nation_keys(spark, sf_dir))
    out = docs_spatial_join(spark, sf_dir, pack, E.GRID, with_spans=True)
    src = synthesize_docs(spark, sf_dir)
    assert check_span_invariant(src, out) == 0


def test_tile_assignment_matches_kernel_oracle(spark, sf_dir):
    """Spark cell ids == single-process numpy oracle (tile exactness gate)."""
    import numpy as np

    from nettopologysuite_spark.engine.derive import points_numpy

    pdf = E.q_tile_assign(spark, sf_dir).toPandas().sort_values("pid")
    ids = pdf["pid"].to_numpy()
    x, y = points_numpy(ids)
    expect = E.GRID.cell_ids(x, y)
    assert np.array_equal(pdf["cell_id"].to_numpy(), expect)


def test_pip_join_matches_bruteforce(spark, sf_dir):
    """Engine join rows == brute-force numpy oracle (no index, no cells)."""
    import numpy as np

    from nettopologysuite_spark.engine.derive import nation_octagon_geom, points_numpy
    from nettopologysuite_spark.kernels.pip import EXTERIOR, PreparedPolygon

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ids = np.array(sorted(r[0] for r in events.select("event_id").collect()))
    x, y = points_numpy(ids)
    expect = set()
    for k in E._nation_keys(spark, sf_dir):
        pp = PreparedPolygon(nation_octagon_geom(k))
        hit = pp.locate(x, y) != EXTERIOR
        expect |= {(int(i), f"oct-{k}") for i in ids[hit]}
    got = {
        (r["pid"], r["poly_id"])
        for r in E.q_pip_convex_join(spark, sf_dir).collect()
    }
    assert got == expect
