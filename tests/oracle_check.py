"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB over the same sf dir; compare
row-count + schema-ish + exact sorted values. Usable standalone:

    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    a = normalize(spark_pdf)
    b = normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} != {list(b.columns)}")
        return problems
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            neq = av != bv
            try:
                import numpy as np
                both_nan = pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy()
                neq = neq & ~both_nan
            except Exception:
                pass
            if neq.any():
                i = int(neq.argmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"{av[i]!r} != {bv[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from nettopologysuite_spark.engine.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs = E.queries()
    oracles = E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(spdf)}")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            failed.append(name)
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name}: rows={len(spdf)}")
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
