"""Merge-on-read apply mode: delta appends + read-time LWW resolution."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, bootstrap, read_state
from rockefeller_spark.oracle import replay
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"),
                            STORED_TRANSCRIPT_SCHEMA, n_buckets=4)


def _canon(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort") \
              .reset_index(drop=True)


def _check(table, pdf_events):
    got = _canon(read_state(table).toPandas())
    want = _canon(replay(pdf_events))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    return got


def test_mor_out_of_order_batches_equal_oracle(spark, table):
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=20, seed=73,
                               p_delete=0.2, p_dup_lsn=0.1)
    pdf = ev.toPandas()
    for i, k in enumerate([3, 1, 0, 2]):           # out of LSN order
        res = apply_batch(table, spark.createDataFrame(
            pdf[pdf.lsn % 4 == k], ev.schema), mode="mor")
        assert res.snapshot.lineage["mode"] == "mor"
    assert table.current().multi_version
    _check(table, pdf)
    # pure append: no file was ever removed across the snapshot chain
    counts = [len(s.files) for s in table.history()]
    assert counts == sorted(counts)


def test_mor_compact_resolves_to_single_version(spark, table):
    ev = gen.gen_change_events(spark, n_events=1500, n_convs=15, seed=79,
                               p_delete=0.25)
    pdf = ev.toPandas()
    for k in range(3):
        apply_batch(table, spark.createDataFrame(pdf[pdf.lsn % 3 == k],
                                                 ev.schema), mode="mor")
    stored_multi = table.read().count()
    visible = _check(table, pdf)
    table.compact()
    assert not table.current().multi_version
    # compaction resolved LWW and dropped tombstones: physical == visible
    assert table.read().count() == len(visible) < stored_multi
    _check(table, pdf)
    # post-compaction CoW and MOR applies still work on the same table
    more = gen.gen_change_events(spark, n_events=500, n_convs=15, seed=79)
    more = more.withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
    apply_batch(table, more, mode="mor")
    _check(table, pd.concat([pdf, more.toPandas()], ignore_index=True))


def test_mor_epoch_replay_skipped(spark, table):
    ev = gen.gen_change_events(spark, n_events=300, n_convs=5, seed=83)
    apply_batch(table, ev, stream_id="s", epoch=0, mode="mor")
    n_files = len(table.current().files)
    res = apply_batch(table, ev, stream_id="s", epoch=0, mode="mor")
    assert res.skipped
    assert len(table.current().files) == n_files
    _check(table, ev.toPandas())


def test_mixed_cow_and_mor_converge(spark, table):
    base = gen.gen_transcripts(spark, n_convs=10, seed=5)
    bootstrap(table, base)
    ev = gen.gen_change_events(spark, n_events=1200, n_convs=10, seed=89)
    pdf = ev.toPandas()
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn % 3 == 0], ev.schema),
                mode="cow")
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn % 3 == 2], ev.schema),
                mode="mor")
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn % 3 == 1], ev.schema),
                mode="cow")
    got = _canon(read_state(table).toPandas())
    want = _canon(replay(pdf, base=base.toPandas()))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_cow_subset_buckets_with_pending_deltas(spark, table):
    """A CoW batch touching a STRICT SUBSET of buckets while MOR deltas
    (which span buckets) are pending: the pruned target read must not leak
    other buckets' delta rows into the merge (regression: the untouched-
    bucket guard used to raise ValueError on every such apply)."""
    ev = gen.gen_change_events(spark, n_events=1200, n_convs=12, seed=97,
                               p_delete=0.15)
    pdf = ev.toPandas()
    res = apply_batch(table, ev, mode="mor")
    assert table.current().multi_version
    # pick one conversation → its batch touches exactly one bucket
    conv = pdf.conv_id.iloc[0]
    upd = pdf[pdf.conv_id == conv].copy()
    upd["lsn"] = upd["lsn"] + 10_000_000
    upd["text"] = "rewritten"
    res = apply_batch(table, spark.createDataFrame(upd, ev.schema),
                      mode="cow")
    assert not res.skipped
    assert len(res.buckets_touched) < table.current().n_buckets
    assert table.current().multi_version          # deltas still pending
    _check(table, pd.concat([pdf, upd], ignore_index=True))
    # a later full compact folds the leftover delta copies away
    table.compact()
    assert not table.current().multi_version
    _check(table, pd.concat([pdf, upd], ignore_index=True))


def test_streaming_mor_drain_equals_oracle(spark, table, tmp_path):
    """The wired streaming path in MOR mode: drain a WAL, deltas append,
    read-time resolution matches the oracle."""
    from rockefeller_spark.stream import drain
    src = str(tmp_path / "wal")
    ev = gen.gen_change_events(spark, n_events=1000, n_convs=10, seed=107,
                               num_partitions=4)
    ev.write.mode("overwrite").parquet(src)
    drain(spark, src, table, str(tmp_path / "ck"), mode="mor",
          max_files_per_trigger=2)
    assert table.current().multi_version
    _check(table, ev.toPandas())


def test_mor_delta_files_carry_key_bounds_and_prune_lookups(spark, table):
    """Bucket-spanning MOR delta files get min_key/max_key stamped too
    (the span-buckets stage path reads the same footer stats), so a
    point lookup prunes pending DELTAS whose key range excludes the key
    — on top of the touched-bucket-set pruning they already carry."""
    base = gen.gen_change_events(spark, n_events=2000, n_convs=20, seed=311)
    apply_batch(table, base)
    # two deltas over DISJOINT key populations: conv ids starting "a..."
    # vs "z..." sort far apart, so their key ranges cannot overlap
    mk = lambda prefix, seed, shift: (
        gen.gen_change_events(spark, n_events=300, n_convs=5, seed=seed)
        .withColumn("conv_id", F.concat(F.lit(prefix), F.col("conv_id")))
        .withColumn("lsn", F.col("lsn") + F.lit(shift)))
    apply_batch(table, mk("aaa-", 312, 10_000_000), mode="mor")
    apply_batch(table, mk("zzz-", 313, 20_000_000), mode="mor")
    snap = table.current()
    deltas = [f for f in snap.files if f.bucket is None]
    assert deltas, "fixture must leave pending deltas"
    for f in deltas:
        assert f.min_key is not None and f.max_key is not None
    a_key = next(f.min_key for f in deltas if f.min_key.startswith("aaa-"))
    opened = {p.split("/")[-1] for p in table.lookup(a_key).inputFiles()}
    for f in deltas:
        name = f.path.split("/")[-1]
        if f.min_key.startswith("zzz-"):
            assert name not in opened, \
                "lookup opened a delta whose key range excludes the key"
    # and the answer matches the unpruned read
    got = table.lookup(a_key).count()
    want = read_state(table).filter(F.col("conv_id") == a_key).count()
    assert got >= want > 0


def test_mor_empty_batch_skips_but_null_buckets_refuse(spark, table,
                                                       monkeypatch):
    """The fused MOR census rides a collect_set Observation, which drops
    NULL buckets — a row count on the same Observation disambiguates:
    a truly EMPTY batch skips cleanly, while winners whose bucket keys
    all hash to NULL must raise (silently deleting their staged files
    would be data loss), never commit, never discard."""
    ev = gen.gen_change_events(spark, n_events=500, n_convs=5, seed=331)
    # empty batch -> clean skip
    res = apply_batch(table, ev.filter(F.lit(False)), mode="mor")
    assert res.skipped and res.snapshot is None
    assert not [f for f in table.current().files]
    # force the pathological census: a bucket expression that yields NULL
    import rockefeller_spark.merge as merge_mod
    from pyspark.sql import types as T

    def null_bucket_expr(col, n):
        return F.lit(None).cast(T.IntegerType())
    monkeypatch.setattr(merge_mod, "bucket_expr", null_bucket_expr)
    with pytest.raises(ValueError, match="quarantine"):
        apply_batch(table, ev, mode="mor")
    # nothing committed, and the refused batch's staged files were removed
    assert table.current().snapshot_id == 0
    import os
    leftovers = [f for f in os.listdir(table.data_dir)] \
        if os.path.isdir(table.data_dir) else []
    assert not leftovers


def test_mor_delta_key_blooms_prune_overlapping_deltas(spark, table,
                                                       monkeypatch):
    """Key BOUNDS can't prune trickle deltas whose key ranges overlap
    (every micro-batch touches convs across the whole lexical range);
    the manifest-stored key BLOOM rules those deltas out per key — a
    point lookup opens only the deltas that might hold the key, from
    metadata alone."""
    base = gen.gen_change_events(spark, n_events=2000, n_convs=40, seed=321)
    apply_batch(table, base)
    convs = sorted(base.select("conv_id").distinct().toPandas().conv_id)
    # 4 trickle batches over INTERLEAVED conv subsets: each batch's
    # min/max key spans nearly the whole range, so bounds prune nothing
    groups = [convs[i::4] for i in range(4)]
    for i, grp in enumerate(groups):
        upd = (base.filter(F.col("conv_id").isin(grp))
               .withColumn("lsn", F.col("lsn") + F.lit((i + 1) * 1_000_000)))
        apply_batch(table, upd, mode="mor")
    snap = table.current()
    deltas = [f for f in snap.files if f.bucket is None]
    assert deltas and all(f.key_bloom for f in deltas)
    # bounds overlap check: the target key is INSIDE every delta's range
    key = groups[0][len(groups[0]) // 2]
    in_range = [f for f in deltas
                if f.min_key <= key <= f.max_key]
    assert len(in_range) > len(groups[0]) // len(convs) + 1, \
        "fixture must make bounds non-selective"
    opened = {p.split("/")[-1] for p in table.lookup(key).inputFiles()}
    opened_deltas = [f for f in deltas if f.path.split("/")[-1] in opened]
    skipped_by_bloom = [f for f in in_range
                        if f.path.split("/")[-1] not in opened]
    assert skipped_by_bloom, "bloom must skip bounds-kept deltas"
    # correctness: the lookup sees the key's LWW winner from its group
    got = table.lookup(key)
    assert got.filter(F.col("_lsn") >= 1_000_000).count() > 0
    # a key in NO delta opens no delta file at all
    fresh = "zzzz-not-updated"
    opened2 = {p.split("/")[-1] for p in table.lookup(fresh).inputFiles()}
    assert not any(f.path.split("/")[-1] in opened2 for f in deltas)

    # oversize deltas skip the bloom (saturation guard) and stay correct
    monkeypatch.setattr(LakeTable, "bloom_max_rows", 1)
    apply_batch(table, base.withColumn(
        "lsn", F.col("lsn") + F.lit(9_000_000)), mode="mor")
    new_deltas = [f for f in table.current().files
                  if f.bucket is None and f.path not in
                  {d.path for d in deltas}]
    assert new_deltas and all(f.key_bloom is None for f in new_deltas)
    assert table.lookup(key).filter(
        F.col("_lsn") >= 9_000_000).count() > 0


def test_mor_raw_append_path_equals_oracle(spark, table):
    """dedupe_batch=False (the Hudi insert-path analog) lands events as
    delta rows without the per-batch LWW shuffle; read-time resolution
    and a later compact still converge to the oracle, including
    duplicate LSNs, tombstones, and out-of-order delivery."""
    ev = gen.gen_change_events(spark, n_events=2500, n_convs=15, seed=331,
                               p_delete=0.2, p_dup_lsn=0.05)
    pdf = ev.toPandas()
    edges = [-1, 800, 1600, 2500]
    for lo, hi in zip(edges, edges[1:]):
        apply_batch(table, spark.createDataFrame(
            pdf[(pdf.lsn > lo) & (pdf.lsn <= hi)], ev.schema),
            mode="mor", dedupe_batch=False)
    snap = table.current()
    assert snap.multi_version
    # raw path: delta rows == stored events of the batch, not winners
    total_delta_rows = sum(f.rows for f in snap.files if f.bucket is None)
    assert total_delta_rows == len(pdf)
    _check(table, pdf)                         # read-time LWW resolves
    table.compact()
    _check(table, pdf)                         # and compaction folds it
    # blooms still stamp on the raw path (same staging write)
    # (deltas were folded; re-add one raw batch to check)
    apply_batch(table, spark.createDataFrame(
        pdf[pdf.lsn > 2000].assign(lsn=pdf[pdf.lsn > 2000].lsn + 10_000),
        ev.schema), mode="mor", dedupe_batch=False)
    deltas = [f for f in table.current().files if f.bucket is None]
    assert deltas and all(f.key_bloom for f in deltas)
    _check(table, pdf)  # replayed higher-LSN identical payloads: no-op


def test_lookup_many_single_job_prunes_per_key(spark, table):
    """lookup_many fetches N keys in one pruned scan: only files whose
    bounds/bloom admit SOME requested key open, and the result equals
    per-key lookups unioned."""
    base = gen.gen_change_events(spark, n_events=3000, n_convs=30, seed=341)
    apply_batch(table, base)
    # trickle deltas over interleaved conv subsets (overlapping bounds,
    # selective blooms — same fixture shape as the bloom test)
    convs = sorted(base.select("conv_id").distinct().toPandas().conv_id)
    for i in range(4):
        upd = (base.filter(F.col("conv_id").isin(convs[i::4]))
               .withColumn("lsn", F.col("lsn") + F.lit((i + 1) * 1_000_000)))
        apply_batch(table, upd, mode="mor")
    want_keys = [convs[0], convs[1], convs[7]]
    got = table.lookup_many(want_keys)
    per_key = None
    for k in want_keys:
        d = table.lookup(k)
        per_key = d if per_key is None else per_key.unionByName(d)
    a = got.toPandas().sort_values(["conv_id", "turn_idx", "_lsn"]) \
        .reset_index(drop=True)
    b = per_key.toPandas().sort_values(["conv_id", "turn_idx", "_lsn"]) \
        .reset_index(drop=True)
    assert len(a) == len(b) and (a.conv_id.values == b.conv_id.values).all()
    # pruning: deltas whose bloom excludes ALL requested keys don't open
    deltas = [f for f in table.current().files if f.bucket is None]
    opened = {p.split("/")[-1] for p in got.inputFiles()}
    from rockefeller_spark.lake import bloom_might_contain
    for f in deltas:
        if not any(bloom_might_contain(f.key_bloom, k) for k in want_keys):
            assert f.path.split("/")[-1] not in opened
    assert any(f.path.split("/")[-1] not in opened for f in deltas), \
        "fixture must actually prune at least one delta"
    # empty and missing keys behave
    assert table.lookup_many([]).count() == 0
    assert table.lookup_many(["no-such-conv"]).count() == 0
