"""Benchmark harness — prints a compact summary as the LAST stdout line
and writes the full per-leg detail (all walls, all sub-metrics) to
``BENCH/last_detail.json``. The split exists because the recording
pipeline tail-captures stdout: round 4's single ever-growing JSON line
outgrew the capture buffer and the round's walls were lost to the
machine-readable record. The last line stays small and bounded; the
detail file carries everything.

Headline workload: the engine's reason to exist — CDC apply throughput.
A deterministic change-event log (Zipf-skewed, duplicate LSNs, tombstones,
out-of-order) is pre-materialized to parquet (generation excluded from the
timed window), then applied through the full MERGE path in micro-batches
into a fresh icelake table. Reported as events/sec plus per-query seconds
for the registry's headline queries at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir      (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores    (default 32)
  BENCH_EVENTS         CDC event count   (default 50_000_000)
  BENCH_BATCHES        micro-batches     (default 4)
  BENCH_BUCKETS        table key buckets (default 256)
  BENCH_REPEATS        best-of-N for the apply legs (default 3: a single
                       driver invocation must ride out one hypervisor
                       interference window — round-4 VERDICT)
  BENCH_APPLY_ONLY     skip registry queries (for the scaling harness)
  BENCH_MOR / BENCH_SKEW / BENCH_READS / BENCH_COMPACT / BENCH_FEED
                       "0" disables the corresponding leg (default all on)
  BENCH_DETAIL_FILE    detail JSON path (default BENCH/last_detail.json;
                       the scaling harness points its subprocesses at
                       per-level files so they don't clobber the full
                       run's record)

The same job runs unchanged at any parallelism — the N-vs-4N scaling
evidence in BENCH/BASELINE.md is produced by bench/scaling.py running this
file at SPARK_GRAFT_CPUS=8 and =32.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from rockefeller_spark import gen, registry
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
from rockefeller_spark.session import get_spark

HEADLINE_QUERIES = [
    "cdc_apply_full", "cdc_lww_latest", "cdc_high_water_marks",
    "cdc_change_feed", "asof_join",
    "pricing_summary", "revenue_by_nation", "brand_revenue",
    "topk_orders_per_priority", "sessionize", "hourly_rollup",
    "doc_exact_dedup", "doc_minhash_pairs", "doc_simhash_pairs",
    "doc_tokens", "emb_cosine_topk", "emb_centroid_assign",
    "emb_ivf_topk", "emb_lsh_topk", "emb_near_dup",
]


def _force(df) -> None:
    """Fully materialize a DataFrame without collecting it to the driver."""
    df.write.format("noop").mode("overwrite").save()


def bench_cdc_apply(spark, n_events: int, n_batches: int,
                    n_buckets: int = 64, repeats: int = 1,
                    mode: str = "cow") -> dict:
    """Steady-state apply throughput. ``repeats`` re-runs the whole
    batch loop against a fresh table and reports the best wall — the
    least-interfered, JIT-warm measurement (this sandbox's shared
    hypervisor injects minutes-long noise windows; see BASELINE.md).
    ``mode="mor"`` measures the merge-on-read path (delta appends, no
    bucket rewrite) and includes the final read-time resolution + the
    compaction in a separate field so the trade is visible."""
    work = tempfile.mkdtemp(prefix="rk-bench-")
    events_path = os.path.join(work, "events")
    # materialize the log OUTSIDE the timed window
    ev = gen.gen_change_events(spark, n_events=n_events,
                               n_convs=max(1000, n_events // 200),
                               max_turns=50, seed=42,
                               num_partitions=32)  # gen speed ≠ measured work
    ev.write.mode("overwrite").parquet(events_path)

    log = spark.read.parquet(events_path)
    span = n_events // n_batches + 1
    walls = []
    stats = None
    resolve_sec = None
    for r in range(max(repeats, 1)):
        tdir = os.path.join(work, f"table-{r}")
        table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                                 n_buckets=n_buckets)
        t0 = time.time()
        for b in range(n_batches):
            batch = log.filter((log.lsn >= b * span) & (log.lsn < (b + 1) * span))
            apply_batch(table, batch, stream_id="bench", epoch=b,
                        collect_metrics=False, mode=mode)
        walls.append(round(time.time() - t0, 3))
        if mode == "mor":
            t1 = time.time()
            # pay the deferred LWW resolution MOR traded apply cost for
            table.compact()
            resolve_sec = round(time.time() - t1, 3)
        stats = table.stats()
        shutil.rmtree(tdir, ignore_errors=True)
    elapsed = min(walls)
    shutil.rmtree(work, ignore_errors=True)
    out = {"apply_sec": elapsed, "apply_walls": walls,
           "events_per_sec": round(n_events / elapsed, 1),
           "n_events": n_events, "n_batches": n_batches, "mode": mode,
           "final_rows": stats["rows"], "snapshots": stats["snapshot_id"]}
    if resolve_sec is not None:
        out["compact_resolve_sec"] = resolve_sec
    return out


def bench_trickle(spark, base_events: int = 10_000_000,
                  n_trickle: int = 8, batch_events: int = 50_000,
                  n_buckets: int = 256) -> dict:
    """The scenario MOR exists for: a stream of SMALL batches against a
    big table. CoW pays a read+rewrite of every touched bucket per batch
    (Zipf keys touch most buckets, so cost ~ O(table) each time); MOR
    appends O(batch) deltas. Reports both modes' wall for the same
    ``n_trickle`` × ``batch_events`` trickle after the same base load."""
    work = tempfile.mkdtemp(prefix="rk-trickle-")
    total = base_events + n_trickle * batch_events
    ev = gen.gen_change_events(spark, n_events=total,
                               n_convs=max(1000, base_events // 200),
                               max_turns=50, seed=43, num_partitions=32)
    ev.write.mode("overwrite").parquet(os.path.join(work, "events"))
    log = spark.read.parquet(os.path.join(work, "events"))
    # pre-split each trickle batch into its own WAL segment (as a real
    # stream source delivers them) so the timed window measures apply, not
    # re-scanning the whole log to carve out 50k rows per batch
    for b in range(n_trickle):
        lo = base_events + b * batch_events
        (log.filter((log.lsn >= lo) & (log.lsn < lo + batch_events))
            .coalesce(4).write.mode("overwrite")
            .parquet(os.path.join(work, f"seg-{b}")))

    out: dict = {"base_events": base_events, "n_trickle": n_trickle,
                 "batch_events": batch_events}
    # mor_raw = dedupe_batch=False: land events as deltas without the
    # per-batch LWW shuffle (the Hudi insert-path analog) — prices what
    # the within-batch reduce costs a trickle micro-batch
    for name, kw in (("cow", dict(mode="cow")), ("mor", dict(mode="mor")),
                     ("mor_raw", dict(mode="mor", dedupe_batch=False))):
        tdir = os.path.join(work, f"t-{name}")
        table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                                 n_buckets=n_buckets)
        apply_batch(table, log.filter(log.lsn < base_events),
                    collect_metrics=False)          # base load, untimed
        t0 = time.time()
        for b in range(n_trickle):
            batch = spark.read.parquet(os.path.join(work, f"seg-{b}"))
            apply_batch(table, batch, collect_metrics=False, **kw)
        out[f"{name}_trickle_sec"] = round(time.time() - t0, 3)
        shutil.rmtree(tdir, ignore_errors=True)
    out["mor_speedup"] = round(out["cow_trickle_sec"]
                               / max(out["mor_trickle_sec"], 1e-9), 2)
    out["raw_vs_mor"] = round(out["mor_trickle_sec"]
                              / max(out["mor_raw_trickle_sec"], 1e-9), 2)
    shutil.rmtree(work, ignore_errors=True)
    return out


def bench_catchup(spark, n_events: int = 10_000_000, n_chunks: int = 8,
                  n_buckets: int = 256) -> dict:
    """Post-outage backlog drain: chunked catch-up (bounded spans, per-
    chunk commits — the shape a 10^10-event backlog REQUIRES) vs the
    one-shot apply of the same WAL (the fastest possible single commit,
    unusable at real backlog sizes). The ratio is the price of bounded
    working sets + durable per-chunk progress."""
    from rockefeller_spark.catchup import catch_up
    from rockefeller_spark.sources import FileSource
    work = tempfile.mkdtemp(prefix="rk-catchup-")
    ev = gen.gen_change_events(spark, n_events=n_events,
                               n_convs=max(1000, n_events // 200),
                               max_turns=50, seed=47, num_partitions=32)
    wal = os.path.join(work, "wal")
    # a real WAL is LSN-sequential on disk (binlog segments): range-laid
    # files let each bounded chunk read prune to its segments via footer
    # stats instead of rescanning the whole backlog per chunk
    (ev.repartitionByRange(32, "lsn").sortWithinPartitions("lsn")
       .write.mode("overwrite").parquet(wal))

    out: dict = {"n_events": n_events, "n_chunks": n_chunks}
    tdir = os.path.join(work, "t-oneshot")
    table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=n_buckets)
    t0 = time.time()
    apply_batch(table, spark.read.parquet(wal), collect_metrics=False,
                mode="mor")
    out["oneshot_sec"] = round(time.time() - t0, 3)
    shutil.rmtree(tdir, ignore_errors=True)

    # primary: the DEFAULT auto-sized walk (spans grow off the stage floor,
    # row-budget bounded) — seeded at the same small span the fixed leg uses
    tdir = os.path.join(work, "t-chunked")
    table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=n_buckets)
    t0 = time.time()
    res = catch_up(spark, FileSource(wal), table, "bench",
                   chunk_lsns=n_events // n_chunks, mode="mor")
    out["chunked_sec"] = round(time.time() - t0, 3)
    out["chunks_committed"] = res.chunks_committed
    out["spans"] = res.spans
    out["events_per_sec"] = round(res.events / max(out["chunked_sec"], 1e-9), 1)
    out["chunking_overhead_x"] = round(out["chunked_sec"]
                                       / max(out["oneshot_sec"], 1e-9), 2)
    out["walls"] = res.walls
    shutil.rmtree(tdir, ignore_errors=True)

    # comparison: fixed spans (the pre-round-8 default) — what a user who
    # pins max_chunk_rows=None pays for n_chunks stage floors
    tdir = os.path.join(work, "t-fixed")
    table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=n_buckets)
    t0 = time.time()
    resf = catch_up(spark, FileSource(wal), table, "bench",
                    chunk_lsns=n_events // n_chunks, max_chunk_rows=None,
                    mode="mor")
    out["fixed_span_sec"] = round(time.time() - t0, 3)
    out["fixed_span_chunks"] = resf.chunks_committed
    out["fixed_span_overhead_x"] = round(out["fixed_span_sec"]
                                         / max(out["oneshot_sec"], 1e-9), 2)
    shutil.rmtree(work, ignore_errors=True)
    return out


def _stream_breakdown(batch_timings: list, wall: float) -> dict:
    """Aggregate the per-micro-batch phase walls (stream.make_batch_applier
    timings) into the stream leg's fixed-cost table: how much of the drain
    is the cluster job (stage), how much is pure DRIVER work (commit =
    manifest serialization + atomic publish; census; maintenance policy;
    quarantine routing), and how much is Spark streaming machinery
    (trigger/checkpoint gap = wall minus time spent inside foreachBatch).
    This is the number behind the 8->32-core stream flattening: the
    per-batch driver serialization does not shrink with cores."""
    if not batch_timings:
        return {}
    n = len(batch_timings)
    tot = lambda k: round(sum(b.get(k) or 0.0 for b in batch_timings), 3)
    in_batch = tot("batch_total_s")
    return {"n_batches": n,
            "stage_s": tot("stage_s"),
            "commit_s": tot("commit_s"),
            "census_s": tot("census_s"),
            # gated on the bad-row count riding the apply's scan
            # (stream.make_batch_applier): ~0 for clean batches
            "quarantine_s": tot("quarantine_s"),
            "maintain_s": tot("maintain_s"),
            "other_in_batch_s": round(
                in_batch - tot("stage_s") - tot("commit_s")
                - tot("census_s") - tot("quarantine_s")
                - tot("maintain_s"), 3),
            "trigger_gap_s": round(wall - in_batch, 3),
            "per_batch_driver_s": round(
                (tot("commit_s") + tot("census_s") + tot("maintain_s")) / n, 4)}


def bench_stream(spark, n_events: int = 16_000_000, n_segments: int = 8,
                 n_buckets: int = 256, repeats: int = 3) -> dict:
    """End-to-end Structured Streaming leg — the north rule's actual
    shape: ``readStream`` over a WAL directory → dead-letter split →
    salted MOR apply → per-batch maintenance policy, driven by
    ``availableNow`` (one checkpointed catch-up pass, exactly what a
    cluster deployment's stream job runs between restarts).

    The source parquet is written with ``n_segments × files_per_seg``
    files and the drain paces itself with ``maxFilesPerTrigger``, so the
    timed window covers ~``n_segments`` full foreachBatch cycles —
    quarantine routing, the fused one-shuffle MOR append, the atomic
    commit, the policy's per-batch evaluation + snapshot expiry, and
    checkpoint I/O — not just the apply kernel the batch legs time.

    The maintenance policy here is the CATCH-UP shape: full compaction
    deferred to after the drain (a backlog drain that full-compacts
    every time a 2M-event delta lands on a young table does O(n²) total
    rewrite work — the trickle defaults exist for small-batch/large-table
    cadence, not this one). Per-batch maintenance still runs and stays
    metadata-flat; the deferred LWW resolution is timed separately as
    ``final_compact_sec``."""
    from rockefeller_spark.maintenance import CompactionPolicy
    from rockefeller_spark.stream import drain

    work = tempfile.mkdtemp(prefix="rk-stream-")
    source = os.path.join(work, "wal")
    # enough WAL files per trigger to FILL the executor: a micro-batch's
    # scan/map side is bounded by its file count (64 MB parquet files
    # don't split under maxPartitionBytes), so 6 files on 8+ cores leaves
    # the map stage under-filled and the 2→8 stream pair reads as an
    # engine scaling gap when it's harness layout (measured: stage-only
    # 0.59 at 6 files/trigger). A real deployment's trigger covers many
    # WAL segments; mirror that by scaling files with cores.
    files_per_seg = max(6, spark.sparkContext.defaultParallelism)
    ev = gen.gen_change_events(spark, n_events=n_events,
                               n_convs=max(1000, n_events // 200),
                               max_turns=50, seed=48,
                               num_partitions=n_segments * files_per_seg)
    ev.write.mode("overwrite").parquet(source)

    policy = CompactionPolicy(max_delta_files=100_000,
                              max_delta_row_fraction=2.0,
                              expire_keep_last=8,
                              orphan_sweep_every_s=1e9)
    walls = []
    stats = None
    final_compact = None
    best_breakdown = None
    for r in range(max(repeats, 1)):
        tdir = os.path.join(work, f"t-{r}")
        ckpt = os.path.join(work, f"ckpt-{r}")
        table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                                 n_buckets=n_buckets)
        batch_timings: list = []
        t0 = time.time()
        drain(spark, source, table, ckpt, mode="mor",
              max_files_per_trigger=files_per_seg, compaction=policy,
              timings=batch_timings)
        wall = round(time.time() - t0, 3)
        if not walls or wall < min(walls):
            best_breakdown = _stream_breakdown(batch_timings, wall)
        walls.append(wall)
        t1 = time.time()
        table.compact()        # the deferred catch-up resolution
        final_compact = min(final_compact or 9e9,
                            round(time.time() - t1, 3))
        stats = table.stats()
        shutil.rmtree(tdir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    elapsed = min(walls)
    shutil.rmtree(work, ignore_errors=True)
    return {"stream_sec": elapsed, "stream_walls": walls,
            "events_per_sec": round(n_events / elapsed, 1),
            "final_compact_sec": final_compact,
            "n_events": n_events, "n_segments": n_segments,
            "mode": "mor+deferred-maintenance", "final_rows": stats["rows"],
            "snapshots": stats["snapshot_id"],
            "driver_breakdown": best_breakdown}


def bench_skew(spark, n_events: int = 20_000_000,
               n_buckets: int = 256, repeats: int = 3) -> dict:
    """Adversarial key-skew leg: ONE conversation holds ~30% of all
    events (far beyond the Zipf head), so its bucket receives 30% of the
    shuffle. The apply path's defense is the adaptively salted
    (bucket, salt) repartition — with salt cap 1 the hot bucket lands on
    ONE reducer/writer task; with the cap at 8 it spreads over up to 8.

    Best-of-``repeats`` per salt config against a FRESH table each run,
    salt configs INTERLEAVED (1,8,1,8,...) so a hypervisor noise window
    hits both configs equally rather than biasing one — the round-3
    single-sample version produced a 1.71x-faster vs 1.36x-slower
    contradiction between two runs of identical code. All walls are
    reported; the speedup is computed on the minima.

    Also times the skew CENSUS alone on the same events (the touched-
    bucket groupBy-count the CoW path needs anyway for read pruning) —
    the adaptive mechanism's marginal cost when no skew exists."""
    from pyspark.sql import functions as F
    work = tempfile.mkdtemp(prefix="rk-skew-")
    events_path = os.path.join(work, "events")
    ev = gen.gen_change_events(spark, n_events=n_events,
                               n_convs=max(1000, n_events // 200),
                               max_turns=50, seed=44, num_partitions=32)
    ev = ev.withColumn(
        "conv_id",
        F.when(F.pmod(F.col("lsn"), F.lit(10)) < 3, F.lit("c-hot"))
         .otherwise(F.col("conv_id")))
    ev.write.mode("overwrite").parquet(events_path)
    log = spark.read.parquet(events_path)
    out: dict = {"n_events": n_events, "hot_key_fraction": 0.3,
                 "n_buckets": n_buckets, "repeats": repeats}
    walls: dict[int, list[float]] = {1: [], 8: []}
    for r in range(max(repeats, 1)):
        for salt in (1, 8):
            tdir = os.path.join(work, f"t-{salt}-{r}")
            table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                                     n_buckets=n_buckets)
            t0 = time.time()
            apply_batch(table, log, collect_metrics=False, write_salt=salt)
            walls[salt].append(round(time.time() - t0, 3))
            shutil.rmtree(tdir, ignore_errors=True)
    for salt in (1, 8):
        out[f"apply_salt{salt}_walls"] = walls[salt]
        out[f"apply_salt{salt}_sec"] = min(walls[salt])
    out["salting_speedup"] = round(out["apply_salt1_sec"]
                                   / max(out["apply_salt8_sec"], 1e-9), 2)
    # census-alone cost: one map-side-combined hash agg over the batch
    # (<= n_buckets rows per task); CoW pays this REGARDLESS of salting
    # (it is also the read-pruning index), so adaptivity is marginally
    # free there; MOR rides it on the staging write as an Observation
    from rockefeller_spark.lake import bucket_expr
    census_walls = []
    for _ in range(2):
        t0 = time.time()
        log.groupBy(bucket_expr("conv_id", n_buckets).alias("b")) \
           .agg(F.count(F.lit(1)).alias("n")).collect()
        census_walls.append(round(time.time() - t0, 3))
    out["census_sec"] = min(census_walls)
    shutil.rmtree(work, ignore_errors=True)
    return out


def bench_skew_target(spark, base_hot_rows: int = 6_000_000,
                      base_cold_rows: int = 6_000_000,
                      trickle_events: int = 200_000,
                      n_buckets: int = 64, repeats: int = 3) -> dict:
    """TARGET-side skew: a small trickle batch lands in a bucket that
    already holds a huge conversation. The CoW rewrite re-aggregates the
    ENTIRE stored bucket, so batch-volume-only salting would leave one
    straggling reducer chewing the historical rows — the census therefore
    folds the TARGET's per-bucket stored row counts (from the same pruned
    manifest listing the apply reuses as its remove set) into the salt
    decision. Salt configs interleaved, base state restored between runs
    by metadata-only rollback (same stored state every run)."""
    from pyspark.sql import functions as F
    work = tempfile.mkdtemp(prefix="rk-skewt-")
    tdir = os.path.join(work, "t")
    table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=n_buckets)
    # one conversation with base_hot_rows distinct turns (one hot bucket)
    # + uniform background conversations everywhere else
    hot = gen.gen_change_events(spark, n_events=base_hot_rows,
                                n_convs=1, max_turns=base_hot_rows,
                                seed=45, num_partitions=32) \
             .withColumn("conv_id", F.lit("c-skew-hot"))
    cold = gen.gen_change_events(spark, n_events=base_cold_rows,
                                 n_convs=max(1000, base_cold_rows // 200),
                                 max_turns=50, seed=46, num_partitions=32)
    apply_batch(table, hot.unionByName(cold), collect_metrics=False)
    v_base = table.current_version()

    # trickle: updates to the hot conversation's existing turns
    trickle = gen.gen_change_events(spark, n_events=trickle_events,
                                    n_convs=1, max_turns=base_hot_rows,
                                    seed=47, num_partitions=8) \
                 .withColumn("conv_id", F.lit("c-skew-hot")) \
                 .withColumn("lsn", F.col("lsn") + F.lit(base_hot_rows * 4))
    trickle_path = os.path.join(work, "trickle")
    trickle.write.mode("overwrite").parquet(trickle_path)
    log = spark.read.parquet(trickle_path)

    out: dict = {"base_hot_rows": base_hot_rows,
                 "base_cold_rows": base_cold_rows,
                 "trickle_events": trickle_events,
                 "n_buckets": n_buckets, "repeats": repeats}
    walls: dict[int, list[float]] = {1: [], 8: []}
    for r in range(max(repeats, 1)):
        for salt in (1, 8):
            t0 = time.time()
            apply_batch(table, log, collect_metrics=False, write_salt=salt)
            walls[salt].append(round(time.time() - t0, 3))
            table.rollback(v_base)
    for salt in (1, 8):
        out[f"trickle_salt{salt}_walls"] = walls[salt]
        out[f"trickle_salt{salt}_sec"] = min(walls[salt])
    out["target_skew_speedup"] = round(out["trickle_salt1_sec"]
                                       / max(out["trickle_salt8_sec"], 1e-9),
                                       2)
    shutil.rmtree(work, ignore_errors=True)
    return out


def bench_compact(spark, n_events: int = 50_000_000,
                  n_buckets: int = 256, repeats: int = 2) -> dict:
    """Attribute the compaction bill (round-3 VERDICT: compact_resolve
    tripled when key-sorted compaction became the default, unmeasured).
    One MOR-loaded table; each config's full ``compact()`` is timed
    best-of-``repeats``, using the metadata-only ``rollback`` to restore
    the pre-compact snapshot between runs (same input state for every
    config, no table rebuild). Configs: sort_by_key on/off ×
    target_rows_per_file unset/set. The read-side payoff of sorting is
    measured separately by bench_read_side; this leg prices what the
    CompactionPolicy defaults COST."""
    work = tempfile.mkdtemp(prefix="rk-compact-")
    ev = gen.gen_change_events(spark, n_events=n_events,
                               n_convs=max(1000, n_events // 200),
                               max_turns=50, seed=46, num_partitions=32)
    ev.write.mode("overwrite").parquet(os.path.join(work, "events"))
    log = spark.read.parquet(os.path.join(work, "events"))
    table = LakeTable.create(spark, os.path.join(work, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=n_buckets)
    # MOR load → pending deltas, so compact() also pays the LWW resolve,
    # matching the stream loop's auto-compaction shape
    span = n_events // 4 + 1
    for b in range(4):
        apply_batch(table, log.filter((log.lsn >= b * span)
                                      & (log.lsn < (b + 1) * span)),
                    collect_metrics=False, mode="mor")
    base_v = table.current_version()
    target = max(200_000, n_events // n_buckets)
    configs = [("sorted", dict(sort_by_key=True)),
               ("unsorted", dict(sort_by_key=False)),
               ("sorted_sized", dict(sort_by_key=True,
                                     target_rows_per_file=target)),
               ("unsorted_sized", dict(sort_by_key=False,
                                       target_rows_per_file=target))]
    out: dict = {"n_events": n_events, "n_buckets": n_buckets,
                 "repeats": repeats, "target_rows_per_file": target}
    walls: dict[str, list[float]] = {name: [] for name, _ in configs}
    for r in range(max(repeats, 1)):
        for name, kw in configs:        # interleaved vs hypervisor noise
            t0 = time.time()
            table.compact(**kw)
            walls[name].append(round(time.time() - t0, 3))
            table.rollback(base_v)
            # reclaim the compacted files so runs don't accumulate disk
            table.expire_snapshots(keep_last=1, orphan_grace_s=3600.0)
            base_v = table.current_version()
    for name, _ in configs:
        out[f"compact_{name}_walls"] = walls[name]
        out[f"compact_{name}_sec"] = min(walls[name])
    out["sort_overhead_x"] = round(
        out["compact_sorted_sec"] / max(out["compact_unsorted_sec"], 1e-9), 2)
    shutil.rmtree(work, ignore_errors=True)
    return out


def bench_feed_trickle(spark, base_events: int = 10_000_000,
                       n_trickle: int = 8, batch_events: int = 50_000,
                       n_buckets: int = 256) -> dict:
    """Change-feed pruning under PENDING MOR deltas (round-3 VERDICT
    missing #3): delta files now carry their touched-bucket set, so a
    feed cut across a delta trickle reads only the changed buckets
    instead of both snapshots in full. The trickle is the pattern the
    pruning exists for — a handful of ACTIVE conversations receiving
    updates (≤ a few dozen buckets), against a table whose base load
    spans every bucket. Measures the pruned feed wall vs the unpruned
    full-diff reference on the same snapshots."""
    from pyspark.sql import functions as F

    from rockefeller_spark.feed import changes_between
    from rockefeller_spark.lake import changed_buckets as _cb
    from rockefeller_spark.merge import read_state
    work = tempfile.mkdtemp(prefix="rk-feedtrickle-")
    ev = gen.gen_change_events(spark, n_events=base_events,
                               n_convs=max(1000, base_events // 200),
                               max_turns=50, seed=47, num_partitions=32)
    ev.write.mode("overwrite").parquet(os.path.join(work, "events"))
    log = spark.read.parquet(os.path.join(work, "events"))
    # the trickle: updates to 25 active conversations, LSNs above the base
    tr = (gen.gen_change_events(spark, n_events=n_trickle * batch_events,
                                n_convs=25, max_turns=50, seed=48)
          .withColumn("lsn", F.col("lsn") + F.lit(base_events)))
    tr.write.mode("overwrite").parquet(os.path.join(work, "trickle"))
    trickle = spark.read.parquet(os.path.join(work, "trickle"))
    table = LakeTable.create(spark, os.path.join(work, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=n_buckets)
    apply_batch(table, log, collect_metrics=False)
    v_from = table.current_version()
    for b in range(n_trickle):
        lo = base_events + b * batch_events
        apply_batch(table, trickle.filter((trickle.lsn >= lo)
                                          & (trickle.lsn < lo + batch_events)),
                    collect_metrics=False, mode="mor")
    v_to = table.current_version()
    pruned_to = _cb(table.snapshot(v_from), table.snapshot(v_to))
    t0 = time.time()
    _force(changes_between(table, v_from, v_to))
    feed_sec = round(time.time() - t0, 3)
    # unpruned reference: the SAME operator with pruning disabled — what
    # every feed under pending deltas cost before delta files carried
    # their touched-bucket set (the round-3 behavior)
    t0 = time.time()
    _force(changes_between(table, v_from, v_to, prune=False))
    full_sec = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)
    return {"base_events": base_events, "n_trickle": n_trickle,
            "batch_events": batch_events,
            "buckets_changed": len(pruned_to) if pruned_to is not None else None,
            "n_buckets": n_buckets,
            "feed_pruned_sec": feed_sec,
            "full_diff_sec": full_sec,
            "pruning_speedup": round(full_sec / max(feed_sec, 1e-9), 2)}


def bench_read_side(spark, base_events: int = 10_000_000,
                    batch_events: int = 50_000,
                    n_buckets: int = 256) -> dict:
    """Read-side latency as a function of pending MOR delta batches — the
    number the MOR trade hides: `read_state` pays a growing LWW resolve
    and `lookup` loses bucket pruning for delta files until compaction.
    Measures full-state read and point-lookup wall at 0 / 4 / 16 pending
    delta batches, then after compact()."""
    work = tempfile.mkdtemp(prefix="rk-reads-")
    total = base_events + 16 * batch_events
    ev = gen.gen_change_events(spark, n_events=total,
                               n_convs=max(1000, base_events // 200),
                               max_turns=50, seed=45, num_partitions=32)
    ev.write.mode("overwrite").parquet(os.path.join(work, "events"))
    log = spark.read.parquet(os.path.join(work, "events"))
    table = LakeTable.create(spark, os.path.join(work, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=n_buckets)
    apply_batch(table, log.filter(log.lsn < base_events),
                collect_metrics=False)              # base load, untimed
    from rockefeller_spark.merge import read_state

    def measure(tag: str, out: dict) -> None:
        t0 = time.time()
        _force(read_state(table))
        out[f"read_state_sec_{tag}"] = round(time.time() - t0, 3)
        t0 = time.time()
        table.lookup("c00000123").count()
        out[f"lookup_sec_{tag}"] = round(time.time() - t0, 3)

    out: dict = {"base_events": base_events, "batch_events": batch_events,
                 "n_buckets": n_buckets}
    measure("0_deltas", out)
    applied = 0
    for n_pending in (4, 16):
        while applied < n_pending:
            lo = base_events + applied * batch_events
            apply_batch(table,
                        log.filter((log.lsn >= lo)
                                   & (log.lsn < lo + batch_events)),
                        collect_metrics=False, mode="mor")
            applied += 1
        measure(f"{n_pending}_deltas", out)
    # delta-file BLOOM pruning: with 16 pending trickle deltas whose key
    # ranges all overlap (every batch spans the conv population), bounds
    # prune nothing — the manifest blooms are what keep a point lookup
    # from opening every pending delta
    snap16 = table.current()
    from rockefeller_spark.lake import key_bucket
    # probe a COLD conv: present in exactly one trickle batch (a hot
    # Zipf conv is in every batch, so every bloom correctly answers yes
    # — the sketch's win is the long tail, which is most keys)
    import pyspark.sql.functions as _F
    key = (log.filter(log.lsn >= base_events)
           .groupBy("conv_id")
           .agg(_F.countDistinct(
               _F.floor((_F.col("lsn") - base_events)
                        / batch_events)).alias("nb"))
           .filter("nb = 1").orderBy("conv_id").limit(1)
           .collect()[0]["conv_id"])
    out["bloom_probe_key_batches"] = 1
    b16 = key_bucket(key, snap16.n_buckets)
    deltas16 = [f for f in snap16.files if f.bucket is None]
    bounds_kept = [f for f in deltas16
                   if (f.buckets is None or b16 in f.buckets)
                   and (f.min_key is None or f.min_key <= key)
                   and (f.max_key is None or key <= f.max_key)]
    opened16 = {p.split("/")[-1] for p in table.lookup(key).inputFiles()}
    out["bloom_pending_delta_files"] = len(deltas16)
    out["bloom_bounds_kept_deltas"] = len(bounds_kept)   # no-bloom opens
    out["bloom_deltas_opened"] = sum(
        1 for f in deltas16 if f.path.split("/")[-1] in opened16)
    t0 = time.time()
    table.compact()
    out["compact_sec"] = round(time.time() - t0, 3)
    measure("after_compact", out)
    # key-bound file pruning: a size-targeted key-sorted compaction
    # RANGE-splits each bucket into files with disjoint min_key/max_key
    # ranges, so the point lookup opens ~1 file of its bucket instead of
    # all of them (the 10^10-row shape where a bucket holds many files)
    t0 = time.time()
    table.compact(target_rows_per_file=max(
        base_events // n_buckets // 8, 10_000))
    out["compact_sized_sec"] = round(time.time() - t0, 3)
    snap = table.current()
    from rockefeller_spark.lake import key_bucket
    b = key_bucket("c00000123", snap.n_buckets)
    out["lookup_bucket_files"] = sum(
        1 for f in snap.files_for({b}) if f.bucket == b)
    out["lookup_files_opened"] = len(table.lookup("c00000123").inputFiles())
    t0 = time.time()
    table.lookup("c00000123").count()
    out["lookup_sec_keypruned"] = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 5×10^7 events into 256 buckets: one notch up from round 1 (2M/64) so
    # the run exercises file pruning and the fused one-shuffle apply on a
    # table much larger than any single executor's working set
    n_events = int(os.environ.get("BENCH_EVENTS", "50000000"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "4"))
    n_buckets = int(os.environ.get("BENCH_BUCKETS", "256"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    apply_only = os.environ.get("BENCH_APPLY_ONLY", "") == "1"
    with_mor = os.environ.get("BENCH_MOR", "1") == "1" and not apply_only
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # 4 shuffle partitions per core: smaller per-reducer hash state (less
    # GC at high thread counts) without over-scheduling
    spark = get_spark("rockefeller-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4,
                      extra_confs={"spark.driver.memory":
                                   os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
                                   # finer splits: keep the map side of the
                                   # merge at ≥cores tasks for bench-sized
                                   # inputs (at petabyte scale the default
                                   # 128m is already thousands of tasks)
                                   "spark.sql.files.maxPartitionBytes": "64m",
                                   # G1's concurrent phases thrash at 32
                                   # threads on this virtualized host
                                   # (measured 3-6x wall variance);
                                   # throughput GC is stable and ~40% faster
                                   "spark.driver.extraJavaOptions":
                                   "-XX:+UseParallelGC"})
    spark.sparkContext.setLogLevel("ERROR")

    total0 = time.time()
    cdc = bench_cdc_apply(spark, n_events, n_batches, n_buckets=n_buckets,
                          repeats=repeats)
    cdc_mor = None
    trickle = None
    skew = None
    reads = None
    if with_mor:
        cdc_mor = bench_cdc_apply(spark, n_events, n_batches,
                                  n_buckets=n_buckets, repeats=repeats,
                                  mode="mor")
        trickle = bench_trickle(spark, n_buckets=n_buckets)
    stream = None
    if os.environ.get("BENCH_STREAM", "" if apply_only else "1") == "1":
        # the scaling harness opts in explicitly (BENCH_STREAM=1 with
        # BENCH_APPLY_ONLY=1) so the north rule's streaming shape carries
        # scaling evidence too
        stream_events = int(os.environ.get("BENCH_STREAM_EVENTS",
                                           max(n_events // 2, 1_000_000)))
        stream = bench_stream(spark, n_events=stream_events,
                              n_buckets=n_buckets)
    skew_target = None
    if os.environ.get("BENCH_SKEW", "1") == "1" and not apply_only:
        skew = bench_skew(spark, n_events=max(n_events // 2, 1_000_000),
                          n_buckets=n_buckets)
        skew_target = bench_skew_target(spark)
    if os.environ.get("BENCH_READS", "1") == "1" and not apply_only:
        reads = bench_read_side(spark,
                                base_events=max(n_events // 5, 500_000),
                                n_buckets=n_buckets)
    compact = None
    if os.environ.get("BENCH_COMPACT", "1") == "1" and not apply_only:
        compact = bench_compact(spark, n_events=n_events,
                                n_buckets=n_buckets)
    feed = None
    if os.environ.get("BENCH_FEED", "1") == "1" and not apply_only:
        feed = bench_feed_trickle(spark,
                                  base_events=max(n_events // 5, 500_000),
                                  n_buckets=n_buckets)
    catchup = None
    if os.environ.get("BENCH_CATCHUP", "1") == "1" and not apply_only:
        catchup = bench_catchup(spark, n_events=max(n_events // 5, 500_000),
                                n_buckets=n_buckets)

    queries: dict[str, float] = {"cdc_apply_stream": cdc["apply_sec"]}
    if cdc_mor is not None:
        queries["cdc_apply_stream_mor"] = cdc_mor["apply_sec"]
    if not apply_only:
        for name in HEADLINE_QUERIES:
            fn = registry.QUERIES[name]
            best = None
            for _ in range(2):
                # drop persisted intermediates from earlier queries/legs:
                # cache pressure from the big apply legs otherwise inflates
                # every query ~3x on this box; best-of-2 additionally
                # removes first-run codegen and hypervisor noise
                spark.catalog.clearCache()
                t0 = time.time()
                _force(fn(spark, sf_dir))
                best = min(best or 9e9, time.time() - t0)
            queries[name] = round(best, 3)
    total = round(time.time() - total0, 3)

    detail = {
        "metric": "cdc_apply_events_per_sec_plus_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "cdc": cdc,
        "cdc_mor": cdc_mor,
        "cdc_trickle": trickle,
        "stream": stream,
        "skew": skew,
        "skew_target": skew_target,
        "read_side": reads,
        "compact": compact,
        "feed_trickle": feed,
        "catchup": catchup,
    }
    detail_file = os.environ.get(
        "BENCH_DETAIL_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "last_detail.json"))
    os.makedirs(os.path.dirname(detail_file), exist_ok=True)
    with open(detail_file, "w") as fh:
        json.dump(detail, fh, indent=1)

    # compact per-leg bests only — bounded size, survives tail capture
    summary: dict = {"apply_events_per_sec": cdc["events_per_sec"],
                     "apply_sec": cdc["apply_sec"],
                     "apply_repeats": repeats}
    if cdc_mor is not None:
        summary["mor_events_per_sec"] = cdc_mor["events_per_sec"]
        summary["mor_compact_resolve_sec"] = cdc_mor.get("compact_resolve_sec")
    if stream is not None:
        summary["stream_sec"] = stream["stream_sec"]
        summary["stream_events_per_sec"] = stream["events_per_sec"]
    if trickle is not None:
        summary["trickle_mor_speedup"] = trickle["mor_speedup"]
        summary["cow_trickle_sec"] = trickle["cow_trickle_sec"]
        summary["mor_trickle_sec"] = trickle["mor_trickle_sec"]
    if skew is not None:
        summary["salting_speedup"] = skew["salting_speedup"]
        summary["census_sec"] = skew["census_sec"]
    if skew_target is not None:
        summary["target_skew_speedup"] = skew_target["target_skew_speedup"]
    if reads is not None:
        summary["read_state_sec_16_deltas"] = reads["read_state_sec_16_deltas"]
        summary["lookup_sec_after_compact"] = reads["lookup_sec_after_compact"]
        summary["lookup_files_opened"] = reads["lookup_files_opened"]
        summary["lookup_bucket_files"] = reads["lookup_bucket_files"]
        summary["bloom_deltas_opened"] = reads["bloom_deltas_opened"]
        summary["bloom_bounds_kept_deltas"] = reads["bloom_bounds_kept_deltas"]
        summary["bloom_pending_delta_files"] = reads["bloom_pending_delta_files"]
    if compact is not None:
        summary["compact_sort_overhead_x"] = compact["sort_overhead_x"]
        summary["compact_sorted_sec"] = compact["compact_sorted_sec"]
    if feed is not None:
        summary["feed_pruning_speedup"] = feed["pruning_speedup"]
    if catchup is not None:
        summary["catchup_events_per_sec"] = catchup["events_per_sec"]
        summary["catchup_overhead_x"] = catchup["chunking_overhead_x"]
        summary["catchup_fixed_span_overhead_x"] = \
            catchup["fixed_span_overhead_x"]
    out = {
        "metric": detail["metric"],
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "summary": summary,
        "detail_file": "BENCH/last_detail.json",
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
