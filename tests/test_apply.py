"""End-to-end CDC apply vs the pandas oracle + the core invariants:
idempotence, batching invariance, permutation invariance, delete/reinsert,
salted-LWW equivalence."""

from __future__ import annotations

import pandas as pd
import pytest

from rockefeller_spark import gen
from rockefeller_spark.cdc import dedupe_lww, dedupe_lww_salted
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, bootstrap, read_state
from rockefeller_spark.oracle import replay
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    if "ts" in pdf.columns:
        pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.floor("us")
    return pdf


def _assert_state_equals_oracle(table, events_pdf, base_pdf=None):
    got = _canon(read_state(table).toPandas())
    want = _canon(replay(events_pdf, base_pdf))
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), STORED_TRANSCRIPT_SCHEMA,
                            n_buckets=8)


def test_single_batch_apply_equals_oracle(spark, table):
    ev = gen.gen_change_events(spark, n_events=4000, n_convs=60, seed=11)
    apply_batch(table, ev)
    _assert_state_equals_oracle(table, ev.toPandas())


def test_apply_over_base_state(spark, table):
    base = gen.gen_transcripts(spark, n_convs=40, max_turns=10, seed=5)
    bootstrap(table, base)
    ev = gen.gen_change_events(spark, n_events=1500, n_convs=40, max_turns=10, seed=5)
    apply_batch(table, ev)
    _assert_state_equals_oracle(table, ev.toPandas(), base.toPandas())


def test_idempotence_same_batch_twice(spark, table):
    ev = gen.gen_change_events(spark, n_events=1000, n_convs=30, seed=2)
    apply_batch(table, ev, stream_id="s", epoch=0)
    before = _canon(read_state(table).toPandas())
    r = apply_batch(table, ev, stream_id="s", epoch=0)
    assert r.skipped
    # and even WITHOUT the epoch gate, re-apply is a semantic no-op
    apply_batch(table, ev)
    after = _canon(read_state(table).toPandas())
    pd.testing.assert_frame_equal(before, after)


def test_batching_invariance_and_out_of_order_batches(spark, table):
    ev = gen.gen_change_events(spark, n_events=3000, n_convs=50, seed=9)
    pdf = ev.toPandas()
    # split into 3 micro-batches by hash, applied in a scrambled order
    parts = [pdf[pdf.lsn % 3 == k] for k in (2, 0, 1)]
    for part in parts:
        apply_batch(table, spark.createDataFrame(part, ev.schema))
    _assert_state_equals_oracle(table, pdf)


def test_delete_then_reinsert_and_late_stale_event(spark, table):
    from datetime import datetime, timezone
    et = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (1, "I", "cA", 0, "user", "hello", None, None, et),
        (5, "D", "cA", 0, None, None, None, None, et),
        (7, "I", "cA", 0, "user", "back", None, None, et),
    ]
    ev_schema = gen.expected_schema()
    b1 = spark.createDataFrame([rows[0], rows[2]], ev_schema)
    b2 = spark.createDataFrame([rows[1]], ev_schema)  # delete arrives LAST but is stale
    apply_batch(table, b1)
    apply_batch(table, b2)
    got = read_state(table).toPandas()
    assert got.text.tolist() == ["back"]
    # a late, even staler update must not resurrect anything
    b3 = spark.createDataFrame([(2, "U", "cA", 0, "user", "stale", None, None, et)], ev_schema)
    apply_batch(table, b3)
    assert read_state(table).toPandas().text.tolist() == ["back"]
    # tombstone wins while it is newest
    b4 = spark.createDataFrame([(9, "D", "cA", 0, None, None, None, None, et)], ev_schema)
    apply_batch(table, b4)
    assert read_state(table).count() == 0


def test_salted_lww_equivalent_to_direct(spark):
    ev = gen.gen_change_events(spark, n_events=5000, n_convs=20, seed=13)
    a = dedupe_lww(ev).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = dedupe_lww_salted(ev, n_salts=7).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_file_pruning_small_batch_touches_few_files(spark, table):
    big = gen.gen_change_events(spark, n_events=5000, n_convs=200, seed=21)
    apply_batch(table, big)
    files_before = {f.path for f in table.current().files}
    # a one-conversation batch must rewrite only that conversation's bucket
    from datetime import datetime, timezone
    one = spark.createDataFrame(
        [(10**6, "U", "c00000000", 0, "user", "patch", None, None,
          datetime(2024, 1, 1, tzinfo=timezone.utc))],
        gen.expected_schema())
    r = apply_batch(table, one)
    assert len(r.buckets_touched) == 1
    files_after = {f.path for f in table.current().files}
    untouched_kept = files_before & files_after
    assert len(untouched_kept) >= len(files_before) - len(files_before) // 2
    # and the untouched files carried over byte-identical (same path = same file)
    touched_bucket = r.buckets_touched[0]
    for f in table.current().files:
        if f.bucket != touched_bucket:
            assert f.path in files_before


def test_apply_retries_recompute_after_concurrent_commit(spark, tmp_path):
    """Optimistic concurrency: a competing writer lands between the
    apply's snapshot read and its commit. retries=0 fails fast; with a
    retry budget the apply recomputes against the NEW snapshot and the
    final state reflects BOTH writers (LWW across their LSNs)."""
    from rockefeller_spark.lake import CommitConflictError, LakeTable
    from rockefeller_spark.oracle import replay
    from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
    import pandas as pd

    table = LakeTable.create(spark, str(tmp_path / "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=800, n_convs=8, seed=251)
    pdf = ev.toPandas()
    mine = spark.createDataFrame(pdf[pdf.lsn % 2 == 0], ev.schema)
    theirs = spark.createDataFrame(pdf[pdf.lsn % 2 == 1], ev.schema)

    # inject the competing commit exactly once, at my commit point
    real_commit = table.commit
    injected = {"done": False}

    def racing_commit(*args, **kwargs):
        if not injected["done"]:
            injected["done"] = True
            other = LakeTable(spark, table.path)
            apply_batch(other, theirs)          # the other writer wins
        return real_commit(*args, **kwargs)

    table.commit = racing_commit
    with pytest.raises(CommitConflictError):
        apply_batch(table, mine)                # fail-fast default
    # the losing attempt changed nothing
    assert table.current().snapshot_id == 1

    injected["done"] = False                    # race fires again
    res = apply_batch(table, mine, retries=2)   # attempt 1 loses, retry wins
    assert not res.skipped
    assert injected["done"]
    table.commit = real_commit
    got = read_state(table).toPandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = replay(pdf).sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_adaptive_salt_sees_target_side_rows(spark, tmp_path):
    """ADVICE r4: a trickle batch into a bucket holding a huge stored
    conversation must still salt — in CoW the reducer re-aggregates the
    whole target bucket, so the census folds per-bucket STORED rows (from
    manifest metadata) into the batch counts."""
    from pyspark.sql import functions as F

    table = LakeTable.create(spark, str(tmp_path / "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    # one conversation, 20k stored turns -> one big bucket
    base = (spark.range(20_000)
            .select(F.lit("c-big").alias("conv_id"),
                    F.col("id").cast("int").alias("turn_idx"),
                    F.lit("user").alias("role"), F.lit("x").alias("text"),
                    F.lit(None).cast("string").alias("tool"),
                    F.current_timestamp().alias("ts")))
    bootstrap(table, base)
    # a 5-event trickle into the same conversation
    tiny = (spark.range(5)
            .select(F.col("id").cast("long").alias("lsn"),
                    F.lit("U").alias("op"), F.lit("c-big").alias("conv_id"),
                    F.col("id").cast("int").alias("turn_idx"),
                    F.lit("user").alias("role"), F.lit("y").alias("text"),
                    F.lit(None).cast("string").alias("tool"),
                    F.current_timestamp().alias("ts"),
                    F.current_timestamp().alias("event_ts")))
    res = apply_batch(table, tiny, write_salt=4, salt_min_rows=1000)
    assert res.snapshot is not None
    salt_k = res.snapshot.lineage.get("salt_k", {})
    # the census saw 20_005 rows in the bucket (5 from the batch alone
    # would never cross salt_min_rows) and split it up to the cap
    assert list(salt_k.values()) == [4], salt_k
    # correctness unchanged: 20k rows, 5 updated
    got = read_state(table)
    assert got.count() == 20_000
    assert got.filter(F.col("text") == "y").count() == 5
