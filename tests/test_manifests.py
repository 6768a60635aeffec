"""Round-4 metadata layer: manifest-sharded snapshots, commit rebase,
maintenance lock, timestamp time travel, delta-aware feed pruning."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.feed import changes_between, changes_since
from rockefeller_spark.lake import (DELTA_SHARD, LakeTable, changed_buckets,
                                    n_shards_for, shard_of)
from rockefeller_spark.merge import apply_batch, bootstrap, read_state
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"),
                            STORED_TRANSCRIPT_SCHEMA, n_buckets=4)


def _manifest_files(table):
    return {f for f in os.listdir(table.meta_dir)
            if f.startswith("m-") and f.endswith(".json")}


def test_path_bucket_roundtrip():
    assert LakeTable._path_bucket("data/abc-b00012.parquet") == 12
    assert LakeTable._path_bucket("data/abc-delta.parquet") is None
    with pytest.raises(ValueError):
        LakeTable._path_bucket("data/garbage.parquet")


def test_shard_of_covers_ranges():
    ns = n_shards_for(4096)
    assert ns == 32
    assert shard_of(None, 4096, ns) == DELTA_SHARD
    seen = {shard_of(b, 4096, ns) for b in range(4096)}
    assert seen == set(range(32))          # contiguous, all used
    assert n_shards_for(4) == 4            # small tables: shard per bucket


def test_commit_rewrites_only_touched_shards(spark, table):
    """The O(total-files) fix: a commit touching one bucket writes ONE new
    manifest; every other shard's entry carries forward by path."""
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=11)
    apply_batch(table, ev)                                 # touches all buckets
    before_entries = {e.shard: e.path for e in table.current().manifests}
    before_files = _manifest_files(table)

    # a single-conversation batch touches exactly one bucket → one shard
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=12)
    res = apply_batch(table, one)
    assert len(res.buckets_touched) == 1
    after_entries = {e.shard: e.path for e in table.current().manifests}
    touched_shard = shard_of(res.buckets_touched[0], 4, n_shards_for(4))
    for shard, path in before_entries.items():
        if shard == touched_shard:
            assert after_entries[shard] != path            # rewritten
        else:
            assert after_entries[shard] == path            # carried forward
    # exactly one new manifest file on disk
    assert len(_manifest_files(table) - before_files) == 1


def test_snapshot_json_holds_manifest_list_not_files(spark, table):
    bootstrap(table, gen.gen_transcripts(spark, n_convs=10, seed=13))
    d = table.current().to_json()
    assert "manifests" in d and "files" not in d
    # and the lazily-loaded view still reaches every file
    assert sum(e["n_files"] for e in d["manifests"]) == len(table.current().files)


def test_manifest_expiry_reclaims_unreferenced_shards(spark, table):
    ev = gen.gen_change_events(spark, n_events=300, n_convs=12, seed=14)
    pdf = ev.toPandas()
    for k in range(3):
        chunk = spark.createDataFrame(pdf[pdf.lsn % 3 == k], ev.schema)
        apply_batch(table, chunk)
    n_before = len(_manifest_files(table))
    stats = table.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert stats["deleted_manifests"] > 0
    assert len(_manifest_files(table)) < n_before
    # every retained snapshot still fully readable
    assert read_state(table).count() > 0
    retained = {e.path for s in table.history() for e in s.manifests}
    assert {os.path.join("metadata", f) for f in _manifest_files(table)} == retained


def test_rollback_is_metadata_only_and_locked(spark, table):
    ev = gen.gen_change_events(spark, n_events=200, n_convs=8, seed=15)
    pdf = ev.toPandas()
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn < 100], ev.schema))
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn >= 100], ev.schema))
    files_before = _manifest_files(table)
    target_manifests = [e.path for e in table.snapshot(1).manifests]
    table.rollback(1)
    # zero new manifest files: the rollback snapshot adopts the target's
    assert _manifest_files(table) == files_before
    assert [e.path for e in table.current().manifests] == target_manifests

    # the maintenance lock serializes rollback against expire
    lock = os.path.join(table.meta_dir, ".maint.lock")
    with open(lock, "w") as fh:
        fh.write("held")
    with pytest.raises(TimeoutError):
        with table._maintenance_lock(timeout_s=0.2):
            pass
    os.remove(lock)


def test_expire_and_rollback_interleave_safely(spark, table):
    """The ADVICE race: rollback to an out-of-retention target racing an
    expire run. With the lock, whichever wins, the table never points at
    deleted files."""
    ev = gen.gen_change_events(spark, n_events=300, n_convs=10, seed=16)
    pdf = ev.toPandas()
    for k in range(3):
        apply_batch(table, spark.createDataFrame(pdf[pdf.lsn % 3 == k],
                                                 ev.schema))
    want_v1 = read_state(table, snapshot_id=1).count()

    errs: list[Exception] = []

    def do_expire():
        try:
            table.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
        except Exception as e:              # pragma: no cover
            errs.append(e)

    def do_rollback():
        try:
            table.rollback(1)
        except ValueError:
            pass                            # target already expired: clean
        except Exception as e:              # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=do_expire)
    t2 = threading.Thread(target=do_rollback)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    # whichever order won, every file the CURRENT snapshot references exists
    cur = table.current()
    for f in cur.files:
        assert os.path.exists(os.path.join(table.path, f.path))
    if cur.lineage.get("op") == "rollback":
        assert read_state(table).count() == want_v1


def test_timestamp_time_travel(spark, table):
    ev = gen.gen_change_events(spark, n_events=200, n_convs=8, seed=17)
    pdf = ev.toPandas()
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn < 100], ev.schema))
    time.sleep(0.01)
    t_mid = time.time() * 1000               # epoch millis (float ok)
    time.sleep(0.01)
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn >= 100], ev.schema))

    assert table.snapshot_as_of(t_mid).snapshot_id == 1
    assert table.snapshot_as_of(time.time()).snapshot_id == 2  # seconds ok too
    v1 = table.read(as_of=t_mid).count()
    assert v1 == table.read(snapshot_id=1).count()
    with pytest.raises(ValueError, match="no snapshot at or before"):
        table.snapshot_as_of(0)
    with pytest.raises(ValueError, match="not both"):
        table.read(snapshot_id=1, as_of=t_mid)

    # cursorless feed consumption by timestamp
    feed, cursor = changes_since(table, timestamp=t_mid)
    assert cursor == 2
    assert feed.count() == changes_between(table, 1, 2).count()
    with pytest.raises(ValueError, match="exactly one"):
        changes_since(table, 1, timestamp=t_mid)

    # expired-timestamp error path: expire v0/v1, then ask for t_mid
    table.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    with pytest.raises(ValueError, match="no snapshot at or before"):
        table.snapshot_as_of(t_mid)


def test_changed_buckets_prunes_with_annotated_deltas(spark, table):
    """A pending MOR delta no longer kills feed pruning: the delta file
    carries its touched-bucket set."""
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=18)
    apply_batch(table, ev)                                 # v1: CoW baseline
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=19)
    res = apply_batch(table, one, mode="mor")              # v2: delta append
    snap = table.current()
    deltas = [f for f in snap.files if f.bucket is None]
    assert deltas and all(f.buckets == res.buckets_touched for f in deltas)

    diff = changed_buckets(table.snapshot(1), table.snapshot(2))
    assert diff == set(res.buckets_touched)                # pruned, not None

    # and the feed over the delta trickle matches a key-level recompute
    # (None-normalized so NaN payloads compare equal to themselves)
    import pandas as pd

    def rows(sid):
        pdf = read_state(table, sid).toPandas()
        return {(r["conv_id"], r["turn_idx"]):
                tuple(None if pd.isna(v) else v for v in r)
                for _, r in pdf.iterrows()}
    feed = changes_between(table, 1, 2).toPandas()
    s1, s2 = rows(1), rows(2)
    changed_keys = {k for k in set(s1) | set(s2) if s1.get(k) != s2.get(k)}
    assert set(map(tuple, feed[["conv_id", "turn_idx"]].values)) == changed_keys


def test_read_prunes_annotated_delta_files(spark, table):
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=20)
    apply_batch(table, ev)
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=21)
    res = apply_batch(table, one, mode="mor")
    touched = set(res.buckets_touched)
    other = next(b for b in range(4) if b not in touched)
    # reading an untouched bucket skips the annotated delta entirely
    n_files_scanned = len([
        f for f in table.current().files
        if (f.bucket == other if f.bucket is not None
            else (f.buckets is None or other in f.buckets))])
    got = table.read(buckets={other}).inputFiles()
    assert len(got) == n_files_scanned
    assert not any(p.endswith("-delta.parquet") for p in got)
