"""Crash injection: a failure between data-file staging and the metadata
commit must leave the table bit-identical (orphan files ignored), and the
retried batch must succeed exactly-once. Runs under BOTH commit-protocol
backends (POSIX and the S3-semantics fake, ``commit_backend``)."""

from __future__ import annotations

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("commit_backend")

from rockefeller_spark import gen
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, read_state
from rockefeller_spark.oracle import replay
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


def _canon(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


def test_crash_between_stage_and_commit(spark, tmp_path, monkeypatch):
    table = LakeTable.create(spark, str(tmp_path / "t"), STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=600, n_convs=10, seed=61)
    pdf = ev.toPandas()
    b1 = spark.createDataFrame(pdf[pdf.lsn < 300], ev.schema)
    b2 = spark.createDataFrame(pdf[pdf.lsn >= 300], ev.schema)
    apply_batch(table, b1, stream_id="s", epoch=0)
    v_before = table.current_version()
    state_before = _canon(read_state(table).toPandas())

    # crash AFTER files are staged, BEFORE the snapshot commit
    real_commit = LakeTable.commit

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(LakeTable, "commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        apply_batch(table, b2, stream_id="s", epoch=1)
    monkeypatch.setattr(LakeTable, "commit", real_commit)

    # reader sees the previous snapshot untouched; orphans are invisible
    assert table.current_version() == v_before
    pd.testing.assert_frame_equal(
        _canon(read_state(table).toPandas()), state_before)

    # the retried epoch applies exactly once and converges to the oracle
    apply_batch(table, b2, stream_id="s", epoch=1)
    got = _canon(read_state(table).toPandas())
    want = _canon(replay(pdf))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # and a replay of the same epoch after recovery is a no-op
    assert apply_batch(table, b2, stream_id="s", epoch=1).skipped
