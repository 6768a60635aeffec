"""Dead-letter router + liveness verifier + compaction."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.quarantine import split_quarantine, verify_liveness

ET = datetime(2024, 1, 20, tzinfo=timezone.utc)


RAW_SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp, event_ts timestamp")


def _ev(spark, rows):
    # raw upstream shape: everything nullable — the router's whole job is
    # to enforce the contract the strict CHANGE_EVENT_SCHEMA declares
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_split_quarantine_all_branches(spark):
    rows = [
        (1, "I", "c1", 0, "user", "ok", None, None, ET),          # valid
        (2, "X", "c1", 1, "user", "ok", None, None, ET),          # bad_op
        (3, "I", None, 0, "user", "ok", None, None, ET),          # null_key
        (4, "U", "c1", 2, "user", None, None, None, ET),          # missing_payload
        (-5, "I", "c1", 3, "user", "ok", None, None, ET),         # negative_lsn
        (6, "D", "c1", 4, None, None, None, None, ET),            # delete: valid
        (None, "I", "c1", 5, "user", "ok", None, None, ET),       # null_lsn
    ]
    valid, bad = split_quarantine(_ev(spark, rows))
    assert sorted(r.lsn for r in valid.collect()) == [1, 6]
    got = {r._reason for r in bad.collect()}
    assert got == {"bad_op", "null_key", "missing_payload", "negative_lsn",
                   "null_lsn"}
    assert bad.filter(F.col("quarantined_at").isNull()).count() == 0


def test_quarantined_rows_never_break_apply(spark, tmp_path):
    from rockefeller_spark.lake import LakeTable
    from rockefeller_spark.merge import apply_batch, read_state
    from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
    t = LakeTable.create(spark, str(tmp_path / "t"), STORED_TRANSCRIPT_SCHEMA,
                         n_buckets=4)
    rows = [
        (1, "I", "c1", 0, "user", "good", None, None, ET),
        (2, "X", "c1", 1, "user", "bad-op", None, None, ET),
    ]
    valid, bad = split_quarantine(_ev(spark, rows))
    apply_batch(t, valid)
    assert read_state(t).count() == 1
    assert bad.count() == 1


def test_verify_liveness(spark):
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=40, seed=31)
    flags = verify_liveness(ev, horizon="2023-11-25 00:00:00").toPandas()
    assert set(flags.columns) == {"conv_id", "last_seen", "delisted"}
    assert len(flags) == flags.conv_id.nunique()
    # the hot conversation has recent events → live
    assert not flags[flags.conv_id == "c00000000"].delisted.iloc[0]


def test_compact_drops_tombstones_and_shrinks_files(spark, tmp_path):
    from rockefeller_spark.lake import LakeTable
    from rockefeller_spark.merge import apply_batch, read_state
    from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
    t = LakeTable.create(spark, str(tmp_path / "t"), STORED_TRANSCRIPT_SCHEMA,
                         n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=30, seed=37,
                               p_delete=0.3)
    pdf = ev.toPandas()
    for k in range(4):
        apply_batch(t, spark.createDataFrame(pdf[pdf.lsn % 4 == k], ev.schema))
    before_files = len(t.current().files)
    visible_before = read_state(t).toPandas()
    stored_before = t.read().count()
    old_v = t.current_version()

    t.compact()
    visible_after = read_state(t).toPandas()
    assert visible_after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True) \
        .equals(visible_before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert t.read().count() == len(visible_after)      # tombstones gone
    assert t.read().count() < stored_before
    assert len(t.current().files) <= before_files
    # time travel to the pre-compaction snapshot still sees tombstoned rows
    assert t.read(old_v).count() == stored_before
