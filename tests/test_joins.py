"""Temporal joins: as-of (union+window) and bucketized time-range join."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from rockefeller_spark.joins import asof_join, time_range_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (1, 102, _ts(5)),
         (2, 200, _ts(30))],
        "k int, id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0), (1, _ts(15), 15.0), (2, _ts(31), 31.0)],
        "k int, ts timestamp, v double")
    out = asof_join(left, right, on=["k"], value_cols=["v"]) \
        .toPandas().set_index("id")
    assert out.loc[100, "v_asof"] == 10.0      # equal ts: inclusive
    assert out.loc[101, "v_asof"] == 15.0      # latest prior
    assert pd.isna(out.loc[102, "v_asof"])     # nothing at/before
    assert pd.isna(out.loc[200, "v_asof"])     # right row is later


def test_asof_join_dedupes_equal_ts_right_rows(spark):
    left = spark.createDataFrame([(1, 1, _ts(20))], "k int, id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(10), 9.0)], "k int, ts timestamp, v double")
    out = asof_join(left, right, on=["k"], value_cols=["v"]).toPandas()
    assert len(out) == 1 and out.v_asof.iloc[0] == 9.0   # max-sorting wins


def test_asof_join_chunked_equals_single_window_on_zipf_skew(spark):
    """The skew-safe chunked carry-forward must produce EXACTLY the
    single-window result on a Zipf-skewed fixture (one key holds ~half
    the rows), across chunk widths — including widths so small that most
    chunks are empty and widths so large that everything is one chunk."""
    import random
    from datetime import timedelta
    rnd = random.Random(31)
    t0 = _ts(0)
    def at(sec):
        return t0 + timedelta(seconds=sec)
    keys = [1] * 500 + [rnd.randint(2, 20) for _ in range(500)]  # hot key 1
    left = spark.createDataFrame(
        [(k, i, at(rnd.randint(0, 3600))) for i, k in enumerate(keys)],
        "k int, id int, ts timestamp")
    right = spark.createDataFrame(
        [(k, at(rnd.randint(0, 3600)), float(i))
         for i, k in enumerate(keys[::3])],
        "k int, ts timestamp, v double")
    base = asof_join(left, right, on=["k"], value_cols=["v"]) \
        .toPandas().set_index("id").sort_index()
    for chunk in (7, 60, 600, 100_000):
        got = asof_join(left, right, on=["k"], value_cols=["v"],
                        chunk_sec=chunk).toPandas().set_index("id").sort_index()
        pd.testing.assert_frame_equal(got, base)


def test_asof_join_chunked_boundary_semantics(spark):
    """Chunk-edge cases: right row exactly on a chunk boundary, left row
    in a later empty-right chunk, equal-ts inclusivity across the
    boundary row injection."""
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(20)), (1, 102, _ts(5)),
         (2, 200, _ts(30))],
        "k int, id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0), (1, _ts(15), 15.0), (2, _ts(31), 31.0)],
        "k int, ts timestamp, v double")
    out = asof_join(left, right, on=["k"], value_cols=["v"], chunk_sec=10) \
        .toPandas().set_index("id")
    assert out.loc[100, "v_asof"] == 10.0      # boundary ts, inclusive
    assert out.loc[101, "v_asof"] == 15.0      # carry from previous chunk
    assert pd.isna(out.loc[102, "v_asof"])
    assert pd.isna(out.loc[200, "v_asof"])


def test_time_range_join_matches_bruteforce(spark):
    import itertools
    rows = [(k, i, _ts(sec)) for i, (k, sec) in enumerate(
        itertools.product([1, 2], [0, 10, 29, 30, 31, 55, 59]))]
    df = spark.createDataFrame(rows, "k int, id int, ts timestamp")
    out = time_range_join(df, df.selectExpr("k", "id as rid", "ts"),
                          on=["k"], window_sec=30, suffix="")
    got = {(r.id, r.rid) for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["k", "id", "ts"])
    want = {(a.id, b.id)
            for _, a in pdf.iterrows() for _, b in pdf.iterrows()
            if a.k == b.k and abs((a.ts - b.ts).total_seconds()) <= 30}
    assert got == want
