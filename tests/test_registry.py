"""Registry contract sanity + a fast end-to-end parity spot-check at
sf0.001 for a representative subset (the full sweep is
tools/check_oracle.py, which the driver mirrors at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry
from rockefeller_spark.registry import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SPOT = ["cdc_lww_latest", "pricing_summary", "scd_fanout",
        "collect_event_types", "rollup_cube_orders", "pivot_event_counts",
        "scalar_functions", "union_dedup", "doc_exact_dedup",
        "emb_cosine_topk", "cdc_time_pruned_read"]


def test_contract_shapes():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
    assert all(callable(f) for f in qs.values())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SPOT)
def test_spot_parity(spark, con, name):
    got = _canon(QUERIES[name](spark, SF).toPandas())
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert {"conv_id", "turn_idx", "text"} <= set(df.columns)
