"""Local replica of the driver's correctness gate — stricter.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf parquet, then compares: row count, sorted
column names, and exact cell-by-cell equality after canonical row sort
(values stringified — so a single-ULP float divergence fails here
before it flakes the driver's hash).

Usage: python tools/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: "∅" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from sales_analytics_etl_sql_powerbi_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in osql:
            print(f"skip  {name}: rows-only ({len(got)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(exc).__name__}: {exc}")
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            failures.append(name)
            neq = (g != w).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(g)} rows differ; first:")
            idx = neq.idxmax()
            print("  spark:", g.loc[idx].to_dict())
            print("  duck :", w.loc[idx].to_dict())
            continue
        print(f"ok    {name}: {len(g)} rows x {len(g.columns)} cols [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
