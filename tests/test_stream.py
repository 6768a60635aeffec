"""Streaming WAL tail: checkpointed resume, exactly-once across restarts,
lineage/metrics emission."""

from __future__ import annotations

import pandas as pd

from rockefeller_spark import gen
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import read_state
from rockefeller_spark.metrics import MetricsLog
from rockefeller_spark.oracle import replay
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
from rockefeller_spark.stream import drain


def _canon(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


def test_stream_drain_resume_exactly_once(spark, tmp_path):
    src = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    mpath = str(tmp_path / "metrics")
    table = LakeTable.create(spark, str(tmp_path / "t"), STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=8)
    metrics = MetricsLog(mpath)

    ev = gen.gen_change_events(spark, n_events=3000, n_convs=40, seed=17)
    pdf = ev.toPandas()
    # WAL segment 1: first ~half by lsn (out of order within the segment)
    seg1 = pdf[pdf.lsn < 1500]
    seg2 = pdf[pdf.lsn >= 1500]
    spark.createDataFrame(seg1, ev.schema).write.mode("append").parquet(src)

    drain(spark, src, table, ckpt, metrics=metrics, max_files_per_trigger=4)
    v_after_seg1 = table.current_version()
    mid = _canon(read_state(table).toPandas())
    want_mid = _canon(replay(seg1))
    pd.testing.assert_frame_equal(mid[want_mid.columns.tolist()], want_mid,
                                  check_dtype=False)

    # "restart": new query, same checkpoint; segment 2 lands meanwhile
    spark.createDataFrame(seg2, ev.schema).write.mode("append").parquet(src)
    drain(spark, src, table, ckpt, metrics=metrics, max_files_per_trigger=4)

    got = _canon(read_state(table).toPandas())
    want = _canon(replay(pdf))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    # restart with NOTHING new: checkpoint must make it a no-op
    v_before = table.current_version()
    drain(spark, src, table, ckpt, metrics=metrics)
    assert table.current_version() == v_before
    assert v_after_seg1 < v_before

    # lineage/metrics were emitted per micro-batch with per-bucket detail
    m = metrics.read(spark).toPandas()
    assert len(m) >= 2
    assert (m["rows_written"] >= 0).all()
    assert m["snapshot_id"].notna().any()


def test_epoch_replay_is_noop_even_with_new_query(spark, tmp_path):
    """Simulate the crash-replay case: same stream_id + epoch re-applied
    directly (as a restarted foreachBatch would) → skipped."""
    from rockefeller_spark.merge import apply_batch
    from rockefeller_spark.stream import stream_id_for
    table = LakeTable.create(spark, str(tmp_path / "t2"), STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=500, n_convs=10, seed=23)
    sid = stream_id_for(str(tmp_path / "ckpt2"))
    r1 = apply_batch(table, ev, stream_id=sid, epoch=0)
    assert not r1.skipped
    r2 = apply_batch(table, ev, stream_id=sid, epoch=0)
    assert r2.skipped


def test_partition_profile_and_skew_report(spark):
    from rockefeller_spark.metrics import key_skew_report, partition_profile
    ev = gen.gen_change_events(spark, n_events=5000, n_convs=500, seed=29)
    prof = partition_profile(ev).toPandas()
    assert prof["rows"].sum() == 5000
    skew = key_skew_report(ev, "conv_id", top_n=5).toPandas()
    assert skew.iloc[0]["conv_id"] == "c00000000"  # the Zipf hot key surfaces
