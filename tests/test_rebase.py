"""Commit rebase for disjoint concurrent writers + per-attempt DML
freshness (round-4 VERDICT item 4 and the dml.py ADVICE item)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.dml import delete_where
from rockefeller_spark.lake import CommitConflictError, LakeTable
from rockefeller_spark.merge import apply_batch, read_state
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"),
                            STORED_TRANSCRIPT_SCHEMA, n_buckets=4)


def _expected_state(spark, ev):
    """Key-level LWW reference state computed independently of the engine."""
    pdf = ev.toPandas().sort_values("lsn")
    state = {}
    for _, r in pdf.iterrows():
        k = (r["conv_id"], r["turn_idx"])
        state[k] = None if r["op"] == "D" else (r["role"], r["text"])
    return {k: v for k, v in state.items() if v is not None}


def _visible(table):
    return {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
            for r in read_state(table).collect()}


def _inject_conflict(monkeypatch, table, action):
    """Intercept the victim apply's FIRST commit: run ``action`` (which
    commits something else, moving the table head) and only then let the
    real commit proceed — it now fails its expected_version check, which
    exercises the conflict path. Re-entrant: commits issued from inside
    ``action`` (and every later commit) go straight through."""
    real_commit = table.commit
    state = {"fired": False, "in_action": False}

    def racing_commit(*args, **kwargs):
        if not state["fired"] and not state["in_action"]:
            state["fired"] = True
            state["in_action"] = True
            try:
                action()
            finally:
                state["in_action"] = False
        return real_commit(*args, **kwargs)

    monkeypatch.setattr(table, "commit", racing_commit)
    return state


def test_rebase_on_disjoint_compaction(spark, table, monkeypatch):
    """An untouched-bucket compaction landing mid-apply re-commits the
    staged files WITHOUT recomputing the merge (no extra stage write)."""
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=31)
    apply_batch(table, ev)
    one = gen.gen_change_events(spark, n_events=10, n_convs=1, seed=32)
    probe = apply_batch(table, one)          # learn the hot conv's bucket
    touched = set(probe.buckets_touched)
    others = set(range(4)) - touched

    stages = {"n": 0}
    real_stage = table._stage_write

    def counting_stage(*args, **kwargs):
        stages["n"] += 1
        return real_stage(*args, **kwargs)
    monkeypatch.setattr(table, "_stage_write", counting_stage)
    _inject_conflict(monkeypatch, table,
                     lambda: table.compact(buckets=others))

    # wrap the rebase itself in a Spark job group: a rebase is pure
    # metadata, so ZERO Spark jobs may run inside it
    import rockefeller_spark.merge as M
    real_rebase = M._rebase_commit

    def grouped_rebase(*args, **kwargs):
        sc = spark.sparkContext
        sc.setJobGroup("rebase-window", "must run no jobs")
        try:
            return real_rebase(*args, **kwargs)
        finally:
            sc.setJobGroup("", "")
    monkeypatch.setattr(M, "_rebase_commit", grouped_rebase)

    more = gen.gen_change_events(spark, n_events=10, n_convs=1, seed=33)
    res = apply_batch(table, more, retries=2)
    assert res.rebased
    assert res.snapshot.lineage["rebased_from"] == 2
    assert res.snapshot.lineage["rebased_onto"] == 3
    # ONE stage write for the apply + one for the compaction — no restage
    assert stages["n"] == 2
    # and the conflict resolution launched zero Spark jobs
    assert spark.sparkContext.statusTracker() \
        .getJobIdsForGroup("rebase-window") == []
    # state exact: both batches and the compaction all landed
    want = _expected_state(spark, ev.unionByName(one).unionByName(more))
    assert _visible(table) == want


def test_overlapping_conflict_recomputes_not_rebases(spark, table, monkeypatch):
    """A competing apply to the SAME bucket must force a full recompute
    (rebase refused), and the LWW outcome must still be exact."""
    ev = gen.gen_change_events(spark, n_events=200, n_convs=1, seed=34)
    pdf = ev.toPandas()
    first = spark.createDataFrame(pdf[pdf.lsn < 100], ev.schema)
    second = spark.createDataFrame(pdf[pdf.lsn >= 100], ev.schema)

    _inject_conflict(monkeypatch, table, lambda: apply_batch(table, first))
    res = apply_batch(table, second, retries=2)
    assert not res.rebased                   # overlap → recompute path
    assert _visible(table) == _expected_state(spark, ev)


def test_conflict_without_retries_still_raises(spark, table, monkeypatch):
    ev = gen.gen_change_events(spark, n_events=100, n_convs=1, seed=35)
    pdf = ev.toPandas()
    first = spark.createDataFrame(pdf[pdf.lsn < 50], ev.schema)
    second = spark.createDataFrame(pdf[pdf.lsn >= 50], ev.schema)

    _inject_conflict(monkeypatch, table, lambda: apply_batch(table, first))
    with pytest.raises(CommitConflictError):
        apply_batch(table, second)           # retries=0, same-bucket overlap


def test_mor_append_rebases_through_any_samelayout_commit(spark, table,
                                                          monkeypatch):
    """A MOR delta append commutes: it rebases even when the competing
    commit touched the same buckets (read-time LWW orders by _lsn)."""
    ev = gen.gen_change_events(spark, n_events=200, n_convs=4, seed=36)
    apply_batch(table, ev)
    _inject_conflict(
        monkeypatch, table,
        lambda: apply_batch(table, gen.gen_change_events(
            spark, n_events=10, n_convs=4, seed=37)))
    res = apply_batch(table, gen.gen_change_events(spark, n_events=10,
                                                   n_convs=4, seed=38),
                      mode="mor", retries=1)
    assert res.rebased
    assert table.current().multi_version


def test_rebase_refused_after_rescale(spark, table, monkeypatch):
    """A concurrent bucket-count change invalidates staged bucket ids:
    rebase must refuse and the recompute must land correctly."""
    ev = gen.gen_change_events(spark, n_events=200, n_convs=10, seed=40)
    apply_batch(table, ev)
    _inject_conflict(monkeypatch, table, lambda: table.rescale_buckets(8))
    more = gen.gen_change_events(spark, n_events=20, n_convs=10, seed=41)
    res = apply_batch(table, more, retries=2)
    assert not res.rebased
    assert table.current().n_buckets == 8
    assert _visible(table) == _expected_state(spark, ev.unionByName(more))


def test_dml_retry_recomputes_lsn(spark, table, monkeypatch):
    """Under retries, a conflicting commit must NOT leave DML tombstones
    with a stale HWM+1: the factory re-derives matches and LSN per
    attempt, so the delete still outranks the competitor's rows."""
    ev = gen.gen_change_events(spark, n_events=100, n_convs=1, seed=42)
    apply_batch(table, ev)
    conv = read_state(table).select("conv_id").first()["conv_id"]

    # competitor: replays the same conversation's events 1000 LSNs higher
    # — ABOVE the stale HWM+1 the first DML attempt would have baked in
    comp_pdf = ev.toPandas()
    comp_pdf = comp_pdf[comp_pdf.op != "D"].copy()
    comp_pdf["lsn"] = comp_pdf["lsn"] + 1000
    comp_pdf["text"] = "resurrected"

    def competitor():
        apply_batch(table, spark.createDataFrame(comp_pdf, ev.schema))

    _inject_conflict(monkeypatch, table, competitor)
    delete_where(table, F.col("conv_id") == conv, retries=2)
    # the conversation is GONE: the retried tombstones outrank the
    # competitor's post-conflict upserts
    assert read_state(table).filter(F.col("conv_id") == conv).count() == 0


def test_adaptive_salt_counts_unit():
    from rockefeller_spark.merge import _adaptive_salt_counts
    # uniform: nobody exceeds the fair share → no salting at all
    assert _adaptive_salt_counts({b: 1000 for b in range(16)}, cap=8,
                                 parallelism=8) == {}
    # one bucket holds half the batch → it alone splits, capped
    counts = {0: 5_000_000, **{b: 40_000 for b in range(1, 16)}}
    out = _adaptive_salt_counts(counts, cap=8, parallelism=8)
    assert set(out) == {0} and 2 <= out[0] <= 8
    # tiny batches never split (min_rows floor)
    assert _adaptive_salt_counts({0: 150_000}, cap=8, parallelism=32) == {}


def test_adaptive_salt_splits_only_hot_bucket(spark, tmp_path):
    """A hot conversation's bucket writes multiple files; uniform buckets
    stay one file per batch — and the state is still exact."""
    table = LakeTable.create(spark, str(tmp_path / "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=30_000, n_convs=40, seed=50)
    hot = F.when(F.pmod(F.col("lsn"), F.lit(2)) == 0, F.lit("c-hot")) \
           .otherwise(F.col("conv_id"))
    ev = ev.withColumn("conv_id", hot)
    pdf = ev.toPandas()
    res = apply_batch(table, ev, write_salt=4, salt_min_rows=2_000)
    from rockefeller_spark.lake import key_bucket
    hot_bucket = key_bucket("c-hot", 4)
    per_bucket = {}
    for f in table.current().files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
    # the hot bucket split across salt tasks; at least one other bucket
    # stayed single-file (AQE may merge small buckets into one task each)
    assert per_bucket[hot_bucket] > 1
    assert min(v for b, v in per_bucket.items() if b != hot_bucket) == 1
    want = _expected_state(spark, spark.createDataFrame(pdf, ev.schema))
    assert _visible(table) == want


def test_salt_config_invariance(spark, tmp_path):
    """LWW semantics are independent of the salt configuration: the same
    stream applied under no-salt, adaptive, and forced-aggressive salting
    converges to the identical visible state (the salt only moves rows
    between reducers/files, never across (bucket, key) groups)."""
    ev = gen.gen_change_events(spark, n_events=4000, n_convs=25, seed=55)
    hot = F.when(F.pmod(F.col("lsn"), F.lit(3)) == 0, F.lit("c-hot")) \
           .otherwise(F.col("conv_id"))
    ev = ev.withColumn("conv_id", hot)
    pdf = ev.toPandas()
    states = []
    for salt, min_rows in ((1, 200_000), (8, 500), (16, 1)):
        t = LakeTable.create(spark, str(tmp_path / f"t{salt}-{min_rows}"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
        for k in range(3):   # out-of-order micro-batches
            chunk = spark.createDataFrame(pdf[pdf.lsn % 3 == (2 - k)],
                                          ev.schema)
            apply_batch(t, chunk, write_salt=salt, salt_min_rows=min_rows)
        states.append(_visible(t))
    assert states[0] == states[1] == states[2]
