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
from rockefeller_spark.lake import (DELTA_SHARD, DataFile, LakeTable,
                                    changed_buckets, grid_range,
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
    # bucket ids >= 100000 widen past 5 digits (ADVICE r4: the 5-digit
    # regex wedged any commit removing files on a >=100k-bucket table)
    assert LakeTable._path_bucket(f"data/abc-b{123456:05d}.parquet") == 123456
    with pytest.raises(ValueError):
        LakeTable._path_bucket("data/garbage.parquet")


def test_shard_of_covers_ranges():
    ns = n_shards_for(4096)
    assert ns == 32
    assert shard_of(None, 4096, ns) == DELTA_SHARD
    seen = {shard_of(b, 4096, ns) for b in range(4096)}
    assert seen == set(range(32))          # contiguous, all used
    assert n_shards_for(4) == 4            # small tables: shard per bucket
    # grid_range is the exact preimage of shard_of, covering [0, B)
    for B, S in ((4096, 32), (4, 4), (10, 3), (100000, 32)):
        edges = [grid_range(s, B, S) for s in range(S)]
        assert edges[0][0] == 0 and edges[-1][1] == B
        for (_, h1), (l2, _) in zip(edges, edges[1:]):
            assert h1 == l2                # contiguous, no gaps
        for s, (lo, hi) in enumerate(edges):
            for b in (lo, hi - 1):
                assert shard_of(b, B, S) == s


def _assert_range_invariants(table):
    """Live range entries pairwise disjoint; every file inside its range."""
    snap = table.current()
    spans = sorted((e.lo, e.hi) for e in snap.manifests if e.lo is not None)
    for (_, h1), (l2, _) in zip(spans, spans[1:]):
        assert h1 <= l2, f"overlapping manifest ranges: {spans}"
    for e in snap.manifests:
        for f in table._load_manifest(e.path):
            if e.lo is None:
                assert f.bucket is None
            else:
                assert e.lo <= f.bucket < e.hi


def test_commit_rewrites_only_touched_shards(spark, table):
    """The O(total-files) fix: a commit touching one bucket writes ONE new
    manifest; every other shard's entry carries forward by path."""
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=11)
    apply_batch(table, ev)                                 # touches all buckets
    before_entries = {(e.lo, e.hi): e.path for e in table.current().manifests}
    before_files = _manifest_files(table)

    # a single-conversation batch touches exactly one bucket → one shard
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=12)
    res = apply_batch(table, one)
    assert len(res.buckets_touched) == 1
    b = res.buckets_touched[0]
    after_entries = {(e.lo, e.hi): e.path for e in table.current().manifests}
    assert set(after_entries) == set(before_entries)       # ranges stable
    for (lo, hi), path in before_entries.items():
        if lo <= b < hi:
            assert after_entries[(lo, hi)] != path         # rewritten
        else:
            assert after_entries[(lo, hi)] == path         # carried forward
    # exactly one new manifest file on disk
    assert len(_manifest_files(table) - before_files) == 1
    _assert_range_invariants(table)


def test_pruned_read_loads_only_covering_shards(spark, tmp_path):
    """Round-5 headline: read(buckets)/lookup/stats are O(covering
    shards) driver-side — a fresh handle's manifest cache shows exactly
    which shards were loaded."""
    table = LakeTable.create(spark, str(tmp_path / "t8"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=8)
    ev = gen.gen_change_events(spark, n_events=800, n_convs=40, seed=22)
    apply_batch(table, ev)                          # populates all 8 buckets
    assert len(table.current().manifests) == 8      # shard per bucket here

    cold = LakeTable.load(spark, str(tmp_path / "t8"))
    assert cold._manifest_cache == {}
    # stats: zero manifest loads (manifest-list aggregates only)
    s = cold.stats()
    assert cold._manifest_cache == {}
    assert s["rows"] == sum(f.rows for f in table.current().files)
    assert s["n_files"] == len(table.current().files)
    assert s["max_lsn"] == max(f.max_lsn for f in table.current().files)

    # a one-bucket pruned read loads exactly ONE shard
    got = cold.read(buckets={3})
    assert len(cold._manifest_cache) == 1
    assert {LakeTable._path_bucket(p) for p in got.inputFiles()} == {3}

    # point lookup: still one shard beyond what's cached
    cold2 = LakeTable.load(spark, str(tmp_path / "t8"))
    cold2.lookup("c00000001").count()
    assert len(cold2._manifest_cache) == 1

    # per-bucket HWM view restricted to one bucket: one shard loaded
    cold3 = LakeTable.load(spark, str(tmp_path / "t8"))
    al = cold3.applied_lsns(buckets={5}).toPandas()
    assert len(cold3._manifest_cache) == 1
    assert set(al["part_key"]) == {"5"}
    full = table.applied_lsns().toPandas()
    assert al[al.part_key == "5"]["max_lsn"].iloc[0] == \
        full[full.part_key == "5"]["max_lsn"].iloc[0]


def test_pruned_read_loads_delta_shard_too(spark, table):
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=23)
    apply_batch(table, ev)
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=24)
    res = apply_batch(table, one, mode="mor")
    b = res.buckets_touched[0]
    cold = LakeTable.load(table.spark, table.path)
    files = cold.current().files_for({b})
    # loaded: the covering range shard + the delta shard (annotated hit)
    assert len(cold._manifest_cache) == 2
    assert any(f.bucket is None for f in files)
    other = next(x for x in range(4) if x != b)
    cold2 = LakeTable.load(table.spark, table.path)
    files2 = cold2.current().files_for({other})
    # the annotated delta does NOT intersect -> its rows are filtered, but
    # the delta shard manifest is still the only extra load
    assert not any(f.bucket is None for f in files2)


def test_manifest_shard_split_grows_with_table(spark, tmp_path):
    """A shard over manifest_target_entries splits into contiguous
    sub-ranges on its next touch; reads/commits stay correct."""
    table = LakeTable.create(spark, str(tmp_path / "ts"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=64)
    table.manifest_target_entries = 8          # force splits at toy scale
    # appends accumulate files (~1/bucket each): 6 rounds → ~6 files per
    # bucket → ~12 per 2-bucket grid cell, over the target of 8
    for k in range(6):
        bootstrap(table, gen.gen_transcripts(spark, n_convs=100,
                                             seed=25 + k))
    snap = table.current()
    assert len(snap.manifests) > n_shards_for(64)       # split happened
    assert any(e.hi - e.lo == 1 for e in snap.manifests
               if e.lo is not None)                     # below grid cells
    assert all(e.n_files <= 8 or (e.hi - e.lo) == 1
               for e in snap.manifests if e.lo is not None)
    _assert_range_invariants(table)
    # total coverage is intact
    assert sum(e.n_files for e in snap.manifests) == len(snap.files)

    # further single-bucket commits rewrite only the (small) covering shard
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=26)
    before = {(e.lo, e.hi): e.path for e in table.current().manifests}
    res = apply_batch(table, one)
    b = res.buckets_touched[0]
    after = {(e.lo, e.hi): e.path for e in table.current().manifests}
    untouched_same = [before[k] == after.get(k) for k in before
                      if not (k[0] <= b < k[1])]
    assert all(untouched_same)
    _assert_range_invariants(table)
    assert read_state(table).count() > 0


def test_stale_lock_break_is_single_winner(table):
    """ADVICE r4: breaking a stale lock must not delete a fresh winner's
    lock, and a broken holder must not remove its successor's lock."""
    lock = os.path.join(table.meta_dir, ".maint.lock")
    # stale foreign lock on disk
    with open(lock, "w") as fh:
        fh.write("deadtoken 1 0")
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    with table._maintenance_lock(timeout_s=1.0):
        # we broke the stale lock and now own a fresh one
        with open(lock) as fh:
            our_token = fh.read().split(" ", 1)[0]
        assert our_token != "deadtoken"
        # simulate a SECOND waiter observing the (now fresh) lock: it must
        # NOT break it
        with pytest.raises(TimeoutError):
            with table._maintenance_lock(timeout_s=0.2):
                pass
        # simulate OUR lock being stale-broken and replaced by a successor
        os.remove(lock)
        with open(lock, "w") as fh:
            fh.write("successor 2 0")
    # release must have left the successor's lock alone (token mismatch)
    with open(lock) as fh:
        assert fh.read().split(" ", 1)[0] == "successor"
    os.remove(lock)


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


def test_expire_and_rollback_interleave_safely(spark, tmp_path,
                                               commit_backend):
    """The ADVICE race: rollback to an out-of-retention target racing an
    expire run. With the lock, whichever wins, the table never points at
    deleted files. Runs under both commit-protocol backends (the table is
    created AFTER the backend swap, so the handle really uses it)."""
    table = LakeTable.create(spark, str(tmp_path / "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
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


def test_commit_loads_only_covering_shards(spark, tmp_path):
    """The WRITE path is O(covering shards) driver-side too: a cold
    handle applying a one-bucket batch loads exactly the covering shard's
    manifest (census listing + remove set + rebuild all share it)."""
    table = LakeTable.create(spark, str(tmp_path / "tc"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=8)
    ev = gen.gen_change_events(spark, n_events=800, n_convs=40, seed=27)
    apply_batch(table, ev)                          # seed all 8 shards
    cold = LakeTable.load(spark, str(tmp_path / "tc"))
    one = gen.gen_change_events(spark, n_events=5, n_convs=1, seed=28)
    res = apply_batch(cold, one)
    assert len(res.buckets_touched) == 1
    # loaded: the covering shard; written: its replacement (cached at
    # write). Nothing else — 2 cache entries total.
    assert len(cold._manifest_cache) == 2
    rewritten = [e.path for e in cold.current().manifests
                 if e.covers(res.buckets_touched[0])]
    assert rewritten and rewritten[0] in cold._manifest_cache


def test_maintain_noop_is_metadata_flat(spark, tmp_path):
    """maintain() runs per stream micro-batch: a no-op cycle must load
    only the shards that could contain an over-threshold bucket — here
    none — not the full file list."""
    from rockefeller_spark.maintenance import CompactionPolicy, maintain
    table = LakeTable.create(spark, str(tmp_path / "tm"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=8)
    ev = gen.gen_change_events(spark, n_events=800, n_convs=40, seed=29)
    apply_batch(table, ev)                       # 1 file per bucket
    cold = LakeTable.load(spark, str(tmp_path / "tm"))
    acts = maintain(cold, CompactionPolicy(expire_keep_last=None))
    assert not acts["full_compact"] and not acts["bucket_compacts"]
    assert acts["pending_delta_files"] == 0
    assert cold._manifest_cache == {}            # zero manifest loads


def test_expire_fast_path_is_exact_and_safe(spark, tmp_path):
    """Expiry without the orphan sweep is O(churn) — candidates come from
    expired-ONLY manifest shards — and must delete exactly the dead file
    set (cross-checked against a full reference computation taken BEFORE
    expiry), never a live one. Includes the rollback trap: the rollback
    snapshot re-references old files via its adopted manifest list."""
    table = LakeTable.create(spark, str(tmp_path / "te"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=600, n_convs=20, seed=30)
    pdf = ev.toPandas()
    for k in range(6):
        chunk = spark.createDataFrame(pdf[pdf.lsn % 6 == k], ev.schema)
        apply_batch(table, chunk, mode="mor" if k % 3 == 2 else "cow")
    table.compact()
    table.rollback(3)

    keep = 3
    cur = table.current_version()
    hist = table.history()
    retained = [s for s in hist if s.snapshot_id > cur - keep]
    expired = [s for s in hist if s.snapshot_id <= cur - keep]
    live = {f.path for s in retained for f in s.files}
    dead = {f.path for s in expired for f in s.files} - live
    assert dead                                    # the test has teeth

    stats = table.expire_snapshots(keep_last=keep, clean_orphans=False)
    assert stats["orphan_sweep"] is False
    assert stats["deleted_files"] == len(dead)
    for p in live:
        assert os.path.exists(os.path.join(table.path, p)), p
    for p in dead:
        assert not os.path.exists(os.path.join(table.path, p)), p
    # rollback state still fully readable
    assert read_state(table).count() > 0


def test_per_batch_expire_skips_orphan_sweep_and_policy_rate_limits(
        spark, tmp_path):
    """clean_orphans=False must not pay (or perform) the full-listing
    sweep: even an AGED orphan survives until a sweeping call. The
    streaming policy runs the sweep at most once per
    orphan_sweep_every_s."""
    from rockefeller_spark.maintenance import CompactionPolicy, maintain
    table = LakeTable.create(spark, str(tmp_path / "to"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=200, n_convs=8, seed=31)
    pdf = ev.toPandas()
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn < 100], ev.schema))
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn >= 100], ev.schema))
    orphan = os.path.join(table.data_dir, "orphan-b00000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"x")
    os.utime(orphan, (1, 1))                       # aged far past any grace

    table.expire_snapshots(keep_last=1, clean_orphans=False,
                           orphan_grace_s=0.0)
    assert os.path.exists(orphan)                  # no sweep ran
    table.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert not os.path.exists(orphan)              # sweeping call reclaims

    # policy: first cycle sweeps (no marker), second is rate-limited
    pol = CompactionPolicy(expire_keep_last=1, orphan_sweep_every_s=3600.0,
                           orphan_grace_s=0.0)
    a1 = maintain(table, pol)
    a2 = maintain(table, pol)
    assert a1["expired"]["orphan_sweep"] is True
    assert a2["expired"]["orphan_sweep"] is False


def test_emptied_range_recarves_on_next_add(spark, tmp_path):
    """A shard whose files are all removed drops its entry (the range
    becomes a gap); later adds to those buckets re-carve a grid-aligned
    range and the disjointness invariant holds throughout."""
    table = LakeTable.create(spark, str(tmp_path / "tg"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=32)
    apply_batch(table, ev)
    snap = table.current()
    victim = snap.manifests[0]
    vrange = (victim.lo, victim.hi)
    # remove every file in the victim shard (a compaction-to-empty shape)
    table.commit([], {f.path for f in table._load_manifest(victim.path)})
    assert vrange not in {(e.lo, e.hi) for e in table.current().manifests}
    _assert_range_invariants(table)
    # re-populate one of its buckets: the range re-carves from the gap
    add = DataFile(f"data/{'a' * 32}-b{victim.lo:05d}.parquet",
                   victim.lo, 10, 0, 9)
    table.commit([add], set())
    cur = table.current()
    assert any(e.covers(victim.lo) for e in cur.manifests)
    _assert_range_invariants(table)
    assert add.path in {f.path for f in cur.files}


def test_legacy_fixed_shard_manifest_entry_refused():
    """ADVICE r5: a table written by the pre-range engine (entries keyed
    by fixed 'shard' id) must refuse loudly, not parse every range shard
    as a delta shard and resurrect removed files on the next commit."""
    from rockefeller_spark.lake import ManifestEntry
    with pytest.raises(ValueError, match="legacy fixed-shard"):
        ManifestEntry.from_json({"shard": 3, "path": "metadata/m-x.json",
                                 "n_files": 1, "rows": 10})
    e = ManifestEntry.from_json({"path": "metadata/m-y.json", "lo": 0,
                                 "hi": 4, "n_files": 1, "rows": 10})
    assert (e.lo, e.hi) == (0, 4)


def test_maintain_defers_only_multi_version_refusals(
        spark, tmp_path, monkeypatch):
    """ADVICE r5: maintain() must treat the routine 'pending MOR deltas'
    refusal as a deferral but let any OTHER ValueError (an invariant
    violation — a genuine engine bug) propagate."""
    from rockefeller_spark.lake import MultiVersionError
    from rockefeller_spark.maintenance import CompactionPolicy, maintain
    table = LakeTable.create(spark, str(tmp_path / "tv"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=2)
    for seed in (41, 42, 43):              # appends accumulate files/bucket
        bootstrap(table, gen.gen_transcripts(spark, n_convs=6, seed=seed))
    pol = CompactionPolicy(max_bucket_files=2, expire_keep_last=None)

    def refuse(**kw):
        raise MultiVersionError("pending merge-on-read deltas")
    monkeypatch.setattr(table, "compact", refuse)
    acts = maintain(table, pol)
    assert acts["bucket_compacts"] == "deferred_multi_version"

    def invariant(**kw):
        raise ValueError("compaction produced rows outside the requested buckets")
    monkeypatch.setattr(table, "compact", invariant)
    with pytest.raises(ValueError, match="outside the requested"):
        maintain(table, pol)


def test_lock_release_survives_successor_and_unreadable_path(table):
    """ADVICE r5: release verifies ownership by INODE identity on the fd
    it held open since acquisition — no content re-read that could fail
    transiently and strand the holder's own lock on disk."""
    lock = os.path.join(table.meta_dir, ".maint.lock")
    # normal path: lock removed on exit
    with table._maintenance_lock(timeout_s=1.0):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)
    # lock REPLACED mid-hold (stale-broken by a waiter + successor took
    # over): release must leave the successor's same-path lock alone
    with table._maintenance_lock(timeout_s=1.0):
        os.remove(lock)
        with open(lock, "w") as fh:
            fh.write("successor 2 0")
    with open(lock) as fh:
        assert fh.read().startswith("successor")
    os.remove(lock)
    # lock DELETED mid-hold: release is a clean no-op
    with table._maintenance_lock(timeout_s=1.0):
        os.remove(lock)
    assert not os.path.exists(lock)
