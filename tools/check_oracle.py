"""Local mirror of the driver's correctness gate: run every
``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on DuckDB at
the same sf, compare row count, column names, and order-insensitive
values. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.floor("us")
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from rockefeller_spark.session import get_spark
    spark = get_spark("check-oracle", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            rows_only.append(name)
            print(f"rows-only {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            failed.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failed.append((name, f"schema: {list(g.columns)} vs {list(w.columns)}"))
            print(f"FAIL {name}: schema {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failed.append((name, f"rows: {len(g)} vs {len(w)}"))
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            failed.append((name, f"values: {str(e)[:300]}"))
            print(f"FAIL {name}: values differ: {str(e)[:300]}")
            continue
        passed.append(name)
        print(f"PASS {name}: {len(g)} rows  ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} failed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
