"""MERGE-style upsert of a change-event batch into an icelake table.

The apply algorithm (the engine's core), expressed so Spark's optimizer
gets maximal leverage — one shuffle, file-pruned reads, skew-immune:

1. **Epoch gate** — a replayed micro-batch epoch is a no-op (exactly-once).
2. **Additive schema evolution** — new payload columns in the batch extend
   the table schema in the same commit; no rewrite of old files.
3. **Within-batch LWW dedup** — fused with step 5 (one hash aggregation
   covers both; `cdc.dedupe_lww` is the standalone form of the same op).
4. **Touched-file pruning** — winners' key buckets are collected (tiny:
   at most n_buckets ints) and only those buckets' files are read; all
   other files carry over into the new snapshot byte-identical. This is
   what keeps a small batch O(batch) against a 10^10-row table.
5. **MERGE as union + max_by** — instead of a full-outer join, target rows
   (with their stored ``_lsn``) and winner rows are unioned and reduced by
   max ``_lsn`` per key. Equivalent to
   ``MERGE WHEN MATCHED AND s.lsn > t._lsn THEN UPDATE/DELETE
   WHEN NOT MATCHED THEN INSERT`` but executes as one hash aggregation —
   cheaper than a join and immune to hot-key skew via partial aggregation.
   Tombstones are retained rows (``_deleted=true``), so apply is fully
   commutative across batches: any partition of the log into micro-batches
   in any order converges to the same state (tested).
6. **Adaptively salted bucket write** — output repartitions by (bucket,
   salt); ONLY buckets whose batch volume exceeds a per-reducer target
   split (up to ``write_salt`` ways), so a hot conversation's bucket
   spreads over multiple writer tasks while uniform batches stay
   one-file-per-bucket (uniform salting was measured a net loss).
7. **Atomic snapshot commit** with per-bucket lineage/metrics.

Replaces the reference's blind per-row INSERT (no key, no dedup — replay
duplicates rows, ``/root/reference/scripts/collector.py:54-64``) and keyed
UPDATE (``/root/reference/scripts/verify.py:60-87``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Union

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rockefeller_spark import schema as S
from rockefeller_spark.cdc import winners_to_stored
from rockefeller_spark.lake import (CommitConflictError, DataFile, LakeTable,
                                    Snapshot, bucket_expr, changed_buckets)
from rockefeller_spark.normalize import normalize_columns


@dataclass
class ApplyResult:
    snapshot: Snapshot | None
    skipped: bool = False
    events_in: int | None = None
    winners: int | None = None
    buckets_touched: list[int] = field(default_factory=list)
    rows_written: int = 0
    # True when a commit conflict was resolved by REBASING the already-
    # staged files onto the competing snapshot (disjoint writers) instead
    # of recomputing the merge
    rebased: bool = False
    # how many times the merge was COMPUTED (1 = no conflict or rebase;
    # >1 = optimistic-concurrency recomputes) — the multi-writer
    # observability counter
    attempts: int = 1
    # per-phase wall seconds of this apply: {"census_s", "stage_s",
    # "commit_s", "total_s"}. ``stage_s`` is the cluster job (shuffle +
    # write); ``commit_s`` is pure DRIVER work (manifest serialization +
    # the atomic publish) — the per-micro-batch fixed cost that bounds
    # streaming throughput at high trigger rates (bench_stream reports
    # the aggregate breakdown so that cost is a number, not a guess).
    timings: dict | None = None
    # approximate distinct-key count of the batch (HLL, rides the MOR
    # raw-append census observation — only stamped on that path, where
    # no exact winner count exists). events_in / key_estimate is the
    # within-batch duplication ratio the streaming auto-dedupe policy
    # feeds back on.
    key_estimate: int | None = None

    def lineage(self) -> dict[str, Any]:
        return {} if self.snapshot is None else self.snapshot.lineage


def _adaptive_salt_counts(bucket_counts: dict[int, int], cap: int,
                          parallelism: int,
                          min_rows: int = 200_000) -> dict[int, int]:
    """The skew census → per-bucket salt fan-out: bucket b splits
    ``min(cap, ceil(count_b / target))`` ways, where the target is one
    reducer's fair share of the batch (floored at ``min_rows`` — below
    that a 'straggler' finishes in under a second and splitting it only
    multiplies files). Returns {} when NO bucket exceeds the target — the
    common uniform case, where the apply plan then carries no salt join
    at all and writes exactly one file per (task, bucket)."""
    total = sum(bucket_counts.values())
    target = max(total // max(parallelism, 1), min_rows)
    out: dict[int, int] = {}
    for b, n in bucket_counts.items():
        k = min(cap, -(-n // target))
        if k > 1:
            out[b] = k
    return out


def _evolved_schema(table_schema: T.StructType, events: DataFrame) -> T.StructType | None:
    """If the batch carries additive payload columns OR widens a stored
    column's type (int→long etc.), return the evolved stored schema;
    None if unchanged. Non-additive changes raise."""
    incoming_payload = [f for f in events.schema.fields
                        if f.name not in ("lsn", "op", "event_ts")]
    merged = S.evolve_additive(table_schema, T.StructType(incoming_payload))
    return merged if merged != table_schema else None


def apply_batch(table: LakeTable,
                events: Union[DataFrame, Callable[[], DataFrame]], *,
                stream_id: str | None = None, epoch: int | None = None,
                write_salt: int = 4, salt_min_rows: int = 200_000,
                collect_metrics: bool = True,
                mode: str = "cow", retries: int = 0,
                dedupe_batch: bool = True) -> ApplyResult:
    """Apply one micro-batch with optimistic-concurrency conflict
    handling. The merge computes against the snapshot current at its
    start and commits with ``expected_version``; if another writer (a
    concurrent compact, DML statement, or second stream) lands first, the
    conflict resolves in two tiers:

    1. **Rebase (no recompute).** If every bucket the competing commit(s)
       changed is DISJOINT from this batch's touched buckets — checked
       from metadata only, Iceberg's file-set validation — the already-
       staged files re-commit against the new snapshot as-is. This makes
       apply-vs-maintenance conflicts (a compaction of OTHER buckets
       landing mid-apply, the routine pairing once ``jobs/maintain_job``
       runs in its own worker) cost one metadata round, not a merge
       recompute. MOR appends rebase whenever the bucket layout is
       unchanged (a pure append commutes). Rebase is refused when the
       competitor rescaled buckets, when this batch evolves the schema,
       or when bucket overlap is real — those fall through to tier 2.
    2. **Recompute.** With ``retries`` > 0 the WHOLE apply re-runs
       against the new snapshot (the CoW merge result depends on target
       state; the epoch gate is re-checked, so a replayed epoch the
       competitor just committed turns into a skip).

    ``events`` may be a DataFrame or a zero-arg CALLABLE returning one —
    the callable is re-invoked on every recompute attempt, so inputs that
    depend on the current table state (predicate DML's matched keys and
    its high-water-mark LSN) are derived fresh per attempt rather than
    baked stale into a retried plan. A losing attempt's staged files
    become orphans behind ``expire_snapshots``'s grace window.
    Single-writer deployments keep ``retries=0`` (fail fast). See
    :func:`_apply_once` for the apply algorithm itself."""
    for attempt in range(max(retries, 0) + 1):
        ev = events() if callable(events) else events
        try:
            res = _apply_once(table, ev, stream_id=stream_id,
                              epoch=epoch, write_salt=write_salt,
                              salt_min_rows=salt_min_rows,
                              collect_metrics=collect_metrics, mode=mode,
                              dedupe_batch=dedupe_batch)
            res.attempts = attempt + 1
            return res
        except CommitConflictError:
            if attempt == max(retries, 0):
                raise
    raise AssertionError("unreachable")


def _apply_once(table: LakeTable, events: DataFrame, *,
                stream_id: str | None = None, epoch: int | None = None,
                write_salt: int = 4, salt_min_rows: int = 200_000,
                collect_metrics: bool = True,
                mode: str = "cow",
                dedupe_batch: bool = True) -> ApplyResult:
    """Apply one micro-batch of change events. Idempotent three ways:
    by (stream_id, epoch), by per-row ``_lsn`` LWW, and by exact-duplicate
    LSN collapse — so at-least-once upstream delivery still yields
    exactly-once table state.

    ``mode`` picks the write strategy (Iceberg's copy-on-write vs
    merge-on-read trade, re-expressed):

    - ``"cow"`` (default): read the touched buckets, reduce events+target
      by max ``_lsn`` per key, REWRITE those buckets. Reads stay plain
      scans; each apply pays O(batch + touched-bucket rows) of rewrite —
      right for low-cadence batches or read-heavy tables.
    - ``"mor"``: dedupe the batch and APPEND its winners as bucket-
      SPANNING delta files (Hudi log-file analog: a small batch writes a
      handful of files, not ≥n_buckets tiny ones) — no target read, no
      rewrite; apply cost is O(batch) regardless of table size. The
      snapshot is marked multi-version: readers (``read_state``) resolve
      max-``_lsn`` per key, and bucket pruning can't skip the delta files,
      until ``table.compact()`` re-resolves and re-buckets — right for
      high-cadence streaming into a huge table, where per-batch rewrite of
      every hot bucket is the bottleneck. Replayed non-epoch-gated batches
      append bit-identical (key, _lsn) duplicates; convergence is
      unaffected (ties are identical rows) and compaction collapses them.
    """
    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown apply mode {mode!r}: use 'cow' or 'mor'")
    if stream_id is not None and epoch is not None and \
            table.epoch_committed(stream_id, epoch):
        return ApplyResult(None, skipped=True)

    t_start = time.time()
    t_census = 0.0
    snap = table.current()
    events = normalize_columns(events)

    new_schema = None
    evolved = _evolved_schema(snap.schema, events)
    if evolved is not None:
        # additive evolution folded into this commit; _lsn/_deleted stay last
        meta = [f for f in evolved.fields if f.name in S.META_COLS]
        user = [f for f in evolved.fields if f.name not in S.META_COLS]
        new_schema = T.StructType(user + meta)

    obs = Observation("apply_in") if collect_metrics else None
    if obs is not None:
        events = events.observe(obs, F.count(F.lit(1)).alias("n"),
                                F.max("lsn").alias("max_lsn"))

    bexpr = bucket_expr(snap.bucket_col, snap.n_buckets)
    touched: set[int] = set()
    bucket_counts: dict[int, int] = {}
    stored_files: list[DataFile] = []
    if mode != "mor":
        # Touched buckets (and their event counts) are computable from the
        # RAW events (bucket depends only on conv_id), so this pass is one
        # cheap map-side-combined hash aggregation (≤ n_buckets rows/task)
        # — the pruning index for the target read AND the skew census for
        # the adaptive write salt. CoW needs it BEFORE the merge (the
        # target read prunes on it); MOR instead piggybacks the census on
        # the staging write below (an Observation over the winners — same
        # bucket set, zero extra pass; measured ~13% of the MOR apply wall).
        _t0 = time.time()
        touched_rows = (events.groupBy(bexpr.alias("b"))
                        .agg(F.count(F.lit(1)).alias("n")).collect())
        t_census = time.time() - _t0
        touched = {r["b"] for r in touched_rows}
        bucket_counts = {r["b"]: r["n"] for r in touched_rows}
        if not touched:
            return ApplyResult(None, skipped=True, events_in=0)
        # the touched buckets' stored files, from the covering manifest
        # shards only (O(batch) metadata) — reused twice: their per-bucket
        # row counts join the skew census (in CoW the reducer re-aggregates
        # the WHOLE target bucket, so a trickle batch into a bucket holding
        # a huge historical conversation must still salt — batch counts
        # alone would leave it one straggling reducer), and their paths
        # form the commit's remove set. Bucket-spanning delta files span
        # buckets, so their rows are left out — the census is then a lower
        # bound, which only under-salts until compaction folds deltas in.
        stored_files = snap.files_for(touched)
        for f in stored_files:
            if f.bucket is not None:
                bucket_counts[f.bucket] = bucket_counts.get(f.bucket, 0) + f.rows

    # Within-batch LWW dedup and merge-vs-target are the SAME max-_lsn
    # reduction, so they are fused into ONE hash aggregation: project every
    # raw event to the stored-row shape (op='D' → tombstone) and union with
    # the target's stored rows; max_by(_lsn) per key then resolves
    # event-vs-event and event-vs-target. In MOR mode the target never
    # joins in — the same aggregation dedupes the batch alone and its
    # winners append as deltas.
    #
    # The whole apply is ONE shuffle: `_bucket` and `_salt` are
    # deterministic functions of the key, so repartitioning on
    # (_bucket, _salt) and grouping by (_bucket, _salt, conv_id, turn_idx)
    # already satisfies the aggregation's required clustering — Catalyst
    # inserts no second exchange — AND the output is exactly the layout the
    # bucketed write wants. The salt spreads a hot bucket over up to
    # `write_salt` reducers/writers (the skew defense, applied adaptively
    # below — only where the census says the bucket is actually hot).
    stored_src = winners_to_stored(events)
    salt_k: dict[int, int] = {}
    census_obs: Observation | None = None
    if mode == "mor":
        # MOR: dedupe the batch alone (one AQE-sized shuffle on the key)
        # and write it as bucket-SPANNING delta files — a 50k-event batch
        # lands as a handful of files, not ≥n_buckets tiny ones (Hudi
        # log-file analog); compaction re-buckets and restores pruning.
        # The touched-bucket census rides the SAME pass as an Observation
        # over the winners (each event key yields exactly one winner, so
        # the winners' bucket set equals the raw events') — MOR pays one
        # scan of the batch, not two.
        from rockefeller_spark.cdc import dedupe_lww
        census_obs = Observation("mor_census")
        # dedupe_batch=False is the RAW-APPEND path (Hudi insert-path
        # analog): skip the within-batch LWW shuffle entirely and land the
        # events as delta rows as-is — read-time max-_lsn resolution gives
        # the same answer (duplicate-LSN replays are bit-identical, so the
        # tie is semantics-free), and compaction folds the extra versions
        # later. For a trickle micro-batch the reduce saves almost nothing
        # (each key appears ~once) while its exchange is the batch's only
        # shuffle — skipping it removes a whole stage of per-batch fixed
        # cost. The trade: deltas hold events, not winners, so read/compact
        # amplification grows with within-batch key duplication — keep the
        # default (dedupe) for catch-up-sized batches.
        base = (dedupe_lww(stored_src, order_col="_lsn") if dedupe_batch
                else stored_src)
        # the row count rides the same Observation: collect_set drops NULL
        # buckets, so "touched is empty" alone cannot distinguish an empty
        # batch from a batch whose winners all have null bucket keys — the
        # count disambiguates (the latter must NOT silently discard rows)
        census_aggs = [F.collect_set(bexpr).alias("touched"),
                       F.count(F.lit(1)).alias("n_winners")]
        if not dedupe_batch:
            # raw-append sketches the batch's distinct keys too (HLL,
            # same pass): events_in/key_estimate is the duplication ratio
            # the streaming auto policy uses to fall back to dedupe when
            # replays/hot-key churn would inflate the deltas
            census_aggs.append(
                F.approx_count_distinct(
                    F.xxhash64(*[F.col(c) for c in S.KEY_COLS]))
                .alias("n_keys"))
        merged = base.observe(census_obs, *census_aggs)
    else:
        target = table.read(buckets=touched)
        if snap.multi_version:
            # Pending MOR delta files SPAN buckets, so the pruned read still
            # carries rows of keys outside the touched buckets; keep only
            # rows that hash into a touched bucket or the merge would emit
            # (and the guard below reject) untouched-bucket rows. Delta-file
            # copies of the keys we rewrite stay behind in the snapshot, but
            # they are (key, _lsn) duplicates of — or older than — the
            # rewritten winners, and the snapshot stays multi-version, so
            # read-time LWW resolves them exactly until compact().
            target = target.filter(bexpr.isin(sorted(touched)))
        merged_in = target.unionByName(stored_src, allowMissingColumns=True)
        rest = [c for c in merged_in.columns
                if c not in S.KEY_COLS and c not in ("_bucket", "_salt")]
        w = F.struct(*[F.col(c) for c in rest])
        # ADAPTIVE write salt (`write_salt` is the per-bucket CAP): only
        # buckets whose batch volume exceeds a per-reducer target split,
        # by ceil(count/target) ways — a hot conversation's bucket spreads
        # over k reducer/writer tasks while uniform buckets stay UNSALTED
        # (salt 0). Uniformly salting every bucket was measured 1.5x
        # SLOWER than no salt at hot_key_fraction=0.1 (BENCH/BASELINE.md
        # round-4 skew leg): the hot reducer wasn't the critical path and
        # the salt multiplied output files (and their footer/commit cost)
        # by `write_salt` for every bucket. The census is free — the
        # touched-bucket pass already counts per bucket.
        # the fair share divides by the REDUCER count (shuffle partitions),
        # not the core count: a bucket 2-3x the per-reducer mean straggles
        # even when cores ≪ reducers (measured +30% wall at 8 cores when
        # the divisor was defaultParallelism and the Zipf head went unsplit)
        spark_ = events.sparkSession
        try:
            n_reducers = int(spark_.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            n_reducers = spark_.sparkContext.defaultParallelism
        salt_k = _adaptive_salt_counts(
            bucket_counts, cap=max(write_salt, 1),
            parallelism=max(n_reducers,
                            spark_.sparkContext.defaultParallelism),
            min_rows=salt_min_rows)
        # NOTE the salt column must stay a NON-FOLDABLE expression even in
        # the all-ones case: a literal `_salt` gets constant-folded, the
        # repartition's HashPartitioning then no longer satisfies the
        # aggregation's required clustering, Catalyst inserts a SECOND
        # exchange on the full (bucket, salt, key) set, and the bucketed
        # write degrades to every-task-writes-every-bucket (measured 10x
        # the file count and 7x the wall on the trickle leg).
        if salt_k:
            kdf = events.sparkSession.createDataFrame(
                [(int(b), int(k)) for b, k in salt_k.items()],
                "_bucket int, _k int")
            merged_in = (merged_in
                         .withColumn("_bucket",
                                     bucket_expr(snap.bucket_col, snap.n_buckets))
                         .join(F.broadcast(kdf), "_bucket", "left")
                         .withColumn("_salt",
                                     F.pmod(F.xxhash64(F.col("turn_idx")),
                                            F.coalesce(F.col("_k"), F.lit(1))))
                         .drop("_k"))
        else:
            merged_in = (merged_in
                         .withColumn("_bucket",
                                     bucket_expr(snap.bucket_col, snap.n_buckets))
                         .withColumn("_salt",
                                     F.pmod(F.xxhash64(F.col("turn_idx")),
                                            F.lit(1))))
        # repartition WITHOUT a pinned partition count: a pinned N blocks
        # AQE from coalescing, so a small batch would pay the same N-task
        # scheduling overhead as a 50M-event one. With the count left to
        # AQE, small batches collapse to a few tasks and big batches still
        # spread over spark.sql.shuffle.partitions.
        merged = (merged_in
                  .repartition(F.col("_bucket"), F.col("_salt"))
                  .groupBy("_bucket", "_salt", *S.KEY_COLS)
                  .agg(F.max_by(w, F.col("_lsn")).alias("_w"))
                  .select("_bucket", *S.KEY_COLS,
                          *[F.col(f"_w.{c}").alias(c) for c in rest]))

    # Stage the data files FIRST (expensive, crash-safe: uncommitted files
    # are ignorable orphans), derive per-bucket lineage from their footer
    # stats (no extra job), then commit everything in one atomic snapshot.
    _t0 = time.time()
    adds = table._stage_write(merged, snap.n_buckets, snap.bucket_col,
                              pre_bucketed=True, span_buckets=(mode == "mor"))
    t_stage = time.time() - _t0
    key_est = None
    if mode == "mor":
        # the staging write was the census action — read the observation
        census = census_obs.get
        touched = set(census["touched"])
        key_est = census.get("n_keys")
        if census["n_winners"] == 0:
            # empty batch: nothing was written worth keeping (at most a
            # zero-row parquet) — drop the orphans now and skip the commit
            for f in adds:
                try:
                    os.remove(os.path.join(table.path, f.path))
                except FileNotFoundError:
                    pass
            return ApplyResult(None, skipped=True, events_in=0)
        if not touched:
            # winners exist but every bucket key hashed to NULL (e.g. a
            # bucket expression over a null key under a future bucketing
            # function): deleting the staged files here would be SILENT
            # data loss — refuse and leave routing to the caller (the
            # streaming path quarantines bad rows before apply)
            for f in adds:
                try:
                    os.remove(os.path.join(table.path, f.path))
                except FileNotFoundError:
                    pass
            raise ValueError(
                f"MOR census found {census['n_winners']} winner rows but "
                "no non-null bucket keys; refusing to commit or discard "
                "them — route null-key rows to quarantine before apply")
        # stamp each bucket-spanning delta file with the batch's touched-
        # bucket set (from the fused census, ≤ n_buckets ints): reads and
        # the change feed keep pruning under a delta trickle instead of
        # scanning every pending delta for every bucket
        for f in adds:
            f.buckets = sorted(touched)
    else:
        bad = {f.bucket for f in adds} - touched
        if bad:
            raise ValueError(
                f"merge produced rows in untouched buckets {sorted(bad)}")
    per_bucket: dict[str, dict[str, Any]] = {}
    for f in adds:
        b = per_bucket.setdefault(str(f.bucket), {"rows": 0, "files": 0,
                                                  "min_lsn": None, "max_lsn": None})
        b["rows"] += f.rows
        b["files"] += 1
        if f.min_lsn is not None:
            b["min_lsn"] = f.min_lsn if b["min_lsn"] is None else min(b["min_lsn"], f.min_lsn)
            b["max_lsn"] = f.max_lsn if b["max_lsn"] is None else max(b["max_lsn"], f.max_lsn)

    events_in = None
    if obs is not None:
        try:
            events_in = obs.get.get("n")
        except Exception:
            pass
    rows_written = sum(b["rows"] for b in per_bucket.values())
    lineage: dict[str, Any] = {
        "stream_id": stream_id, "epoch": epoch, "mode": mode,
        "buckets_touched": sorted(touched),
        "events_in": events_in, "rows_written": rows_written,
        "per_bucket": per_bucket,
    }
    if salt_k:
        # observable record of the adaptive-salt decision (which buckets
        # split, how many ways) — operators and tests read it from lineage
        lineage["salt_k"] = {str(b): k for b, k in sorted(salt_k.items())}
    if mode == "mor":
        remove: set[str] = set()       # pure append; deltas resolve at read
        multi_version = True
    else:
        # the shard-pruned listing from the census pass doubles as the
        # remove set — O(batch) driver metadata, no second manifest walk
        remove = {f.path for f in stored_files if f.bucket is not None}
        multi_version = None           # inherit (a CoW apply resolves only
                                       # the buckets it touched)
    rebased = False
    _t0 = time.time()
    try:
        new_snap = table.commit(adds, remove, stream_id=stream_id,
                                epoch=epoch, new_schema=new_schema,
                                lineage=lineage,
                                expected_version=snap.snapshot_id,
                                multi_version=multi_version)
    except CommitConflictError:
        new_snap = _rebase_commit(table, snap, adds, touched, mode=mode,
                                  stream_id=stream_id, epoch=epoch,
                                  new_schema=new_schema, lineage=lineage)
        if new_snap is None:
            raise          # not disjoint / not rebasable: recompute upstream
        if new_snap is _SKIPPED:
            return ApplyResult(None, skipped=True)
        rebased = True
    t_commit = time.time() - _t0
    return ApplyResult(new_snap, events_in=events_in, winners=None,
                       buckets_touched=sorted(touched),
                       rows_written=rows_written, rebased=rebased,
                       key_estimate=key_est,
                       timings={"census_s": round(t_census, 4),
                                "stage_s": round(t_stage, 4),
                                "commit_s": round(t_commit, 4),
                                "total_s": round(time.time() - t_start, 4)})


_SKIPPED = object()   # sentinel: competitor committed our (stream, epoch)


def _rebase_commit(table: LakeTable, expected: Snapshot,
                   adds: list[DataFile], touched: set[int], *, mode: str,
                   stream_id: str | None, epoch: int | None,
                   new_schema, lineage: dict[str, Any],
                   max_races: int = 3):
    """Iceberg-style conflict rebase: when the commit(s) that beat this
    apply changed only buckets DISJOINT from its touched set (validated
    from manifest metadata alone — untouched manifest shards are shared
    by path, so only changed shards load), the already-staged files are
    re-committed against the new table head without recomputing the
    merge. Returns the new Snapshot, ``_SKIPPED`` if the competitor
    already committed this (stream, epoch), or None when a rebase would
    be unsound:

    - the competitor rescaled buckets (bucket ids shifted under us);
    - this batch evolves the schema (merging two concurrent evolutions
      needs the recompute path's fresh schema merge);
    - CoW and the changed-bucket sets intersect, or the competitor's
      reach is unknowable (an unannotated bucket-spanning delta);
    - the expected base snapshot already expired.

    MOR appends need no disjointness: a pure delta append commutes with
    any same-layout commit (read-time LWW orders by ``_lsn``)."""
    for _ in range(max_races):
        cur = table.current()
        if cur.snapshot_id == expected.snapshot_id:
            return None                       # hint racing; let caller retry
        if stream_id is not None and epoch is not None and \
                cur.committed_epochs.get(stream_id, -1) >= epoch:
            return _SKIPPED
        if cur.n_buckets != expected.n_buckets or new_schema is not None:
            return None
        if cur.schema != expected.schema or cur.name_log != expected.name_log:
            # competitor evolved the schema (add/widen/rename/drop): the
            # staged files' on-disk columns were written under the OLD
            # names/types, but a rebase would stamp them with the NEW
            # snapshot's vintage — mis-mapping them. Recompute instead.
            return None
        if mode != "mor":
            try:
                diff = changed_buckets(expected, cur)
            except (FileNotFoundError, ValueError):
                return None                   # base expired mid-flight
            if diff is None or diff & touched:
                return None
            remove = {f.path for f in cur.files_for(touched)
                      if f.bucket is not None}
            multi_version = None
        else:
            remove = set()
            multi_version = True
        try:
            return table.commit(
                adds, remove, stream_id=stream_id, epoch=epoch,
                lineage={**lineage, "rebased_from": expected.snapshot_id,
                         "rebased_onto": cur.snapshot_id},
                expected_version=cur.snapshot_id,
                multi_version=multi_version)
        except CommitConflictError:
            continue                          # yet another writer; revalidate
    return None


def read_state(table: LakeTable, snapshot_id: int | None = None,
               buckets: set[int] | None = None) -> DataFrame:
    """The visible table: stored rows minus tombstones minus engine columns.
    On a multi-version snapshot (merge-on-read deltas pending compaction)
    the read resolves last-writer-wins first — one map-side-combined
    max-``_lsn`` hash aggregation per key, the same skew-immune reduction
    the apply path uses; single-version snapshots read as plain scans.
    ``buckets`` prunes the read to the named key buckets (delta rows of
    other buckets are filtered at row level, mirroring the apply path)."""
    snap = table.snapshot(snapshot_id) if snapshot_id is not None else table.current()
    user_cols = [f.name for f in snap.schema.fields if f.name not in S.META_COLS]
    df = table.read(snapshot_id, buckets=buckets)
    if buckets is not None and snap.multi_version:
        df = df.filter(bucket_expr(snap.bucket_col, snap.n_buckets)
                       .isin(sorted(buckets)))
    if snap.multi_version:
        from rockefeller_spark.cdc import dedupe_lww
        df = dedupe_lww(df, order_col="_lsn")
    return df.filter(~F.col("_deleted")).select(*user_cols)


def bootstrap(table: LakeTable, base: DataFrame, *, write_salt: int = 4,
              base_lsn: int = -1) -> Snapshot:
    """Load an initial transcript table as stored rows.

    ``base_lsn`` is the WAL position the snapshot is consistent WITH (the
    Debezium "snapshot at binlog position" contract): base rows are
    stamped ``_lsn = base_lsn`` so only events NEWER than the snapshot
    outrank them — a replay that re-reads pre-snapshot events (an operator
    resuming catch-up from LSN 0, an at-least-once source overshooting
    backwards) converges to the same state instead of letting stale
    events clobber newer base rows. Events AT ``base_lsn`` tie with the
    base row; the snapshot already reflects them, so either winner is the
    same visible row. The default ``-1`` keeps the old semantics (every
    event outranks base rows) for sources that deliver strictly
    post-snapshot events. The position is recorded in the commit's
    lineage so a crash between bootstrap and the first catch-up chunk can
    recover it (:func:`rockefeller_spark.catchup.recorded_base_lsn`)."""
    stored = (base
              .withColumn("_lsn", F.lit(int(base_lsn)).cast("long"))
              .withColumn("_deleted", F.lit(False)))
    return table.append(stored, write_salt=write_salt,
                        lineage={"op": "bootstrap",
                                 "base_lsn": int(base_lsn)})
