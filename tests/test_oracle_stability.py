"""Every oracle SQL must be re-executable in one DuckDB connection.

Regression for the round-4 crash class: DuckDB 1.0.0's buffer accounting
broke when a 64-term expression sat inside a window ORDER BY — the FIRST
execution succeeded and the SECOND threw bogus out-of-memory errors (and
intermittently corrupted the combined Spark+DuckDB harness). The driver's
correctness gate runs all oracles in one connection, so each must survive
repeated execution."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pytest  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_all_oracles_survive_double_execution(con):
    oracles = E.oracle_sql()
    for name, sql in oracles.items():
        r1 = con.execute(sql).fetchall()
        r2 = con.execute(sql).fetchall()
        assert len(r1) == len(r2), name
