"""Driver-mimic: run every __spark_entry__ query on Spark and its DuckDB
oracle side-by-side at sf0.01; compare row count, column names, and
order-insensitive values. Usage:

    PYTHONPATH=. python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from light_curve_spark.session import build_session
from light_curve_spark.sources.catalog import TESTDATA_TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) < 1e-9
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a = normalize(spark_df)
    b = normalize(duck_df)
    n_bad = 0
    first = None
    for i in range(len(a)):
        for c in a.columns:
            if not values_equal(a.iloc[i][c], b.iloc[i][c]):
                n_bad += 1
                if first is None:
                    first = f"row {i} col {c}: spark={a.iloc[i][c]!r} duck={b.iloc[i][c]!r}"
                break
    if n_bad:
        problems.append(f"{n_bad}/{len(a)} rows differ; first: {first}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows, cols={list(sdf.columns)}")
            if len(sdf) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        if "fixtures/oracle" in oracles[name] and not sf_dir.rstrip("/").endswith(
            "sf0.01"
        ):
            # fixture oracles are materialized over the sf0.01 tables
            # (the driver's correctness-gate scale) — at other scales the
            # query still runs (rows reported) but values can't compare
            print(f"SKIP {name}: fixture oracle bound to sf0.01 ({len(sdf)} rows ran)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} spark rows / {len(ddf)} duck rows):")
            for p in problems:
                print(f"  - {p}")
        else:
            print(f"OK   {name}: {len(sdf)} rows match")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
