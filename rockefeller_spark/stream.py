"""Structured Streaming WAL tail → foreachBatch CDC apply.

The streaming entry point of the engine: tail a directory of change-event
files (the sandbox stand-in for a binlog/Kafka topic — swap the source
format string for ``kafka`` on a real cluster; nothing downstream changes),
and apply each micro-batch through :func:`rockefeller_spark.merge.apply_batch`.

Exactly-once across restarts is the composition of three mechanisms:
1. Spark's checkpointed source offsets (a finished batch is never re-read);
2. the epoch gate — ``apply_batch`` records ``(stream_id, batch_id)`` in the
   snapshot it commits, so the one batch Spark DOES replay after a crash
   (the in-flight one) is skipped if its commit already landed;
3. per-row ``_lsn`` LWW idempotence as the belt-and-braces backstop.

MERGE is not expressible as a built-in streaming sink, so ``foreachBatch``
is the idiomatic shape (Spark docs' recommended pattern for upsert sinks).
Late data needs no special casing — apply is order-insensitive by LSN — but
a watermark still bounds any in-stream stateful ops and documents lateness.

The reference's closest analogue is its daily re-run intent
(``/root/reference/airflow/dags/daily_dag.py:1-3`` placeholder) plus blind
re-INSERTs that duplicate rows on replay
(``/root/reference/scripts/collector.py:54-64``); this module is the
continuous, idempotent version.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rockefeller_spark import schema as S
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.maintenance import CompactionPolicy, maintain
from rockefeller_spark.sources import FileSource
from rockefeller_spark.merge import apply_batch
from rockefeller_spark.metrics import MetricsLog
from rockefeller_spark.quarantine import (observed_bad_count,
                                          split_quarantine_observed)


def stream_id_for(checkpoint_dir: str) -> str:
    """Stable stream identity across restarts: derived from the checkpoint
    location (same checkpoint = same logical stream = same epoch ledger)."""
    return "wal-" + hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]


def json_value_transform(event_schema=None):
    """Transform for Kafka-shaped sources: parse a binary/string ``value``
    column (one JSON change event per record) into the typed change-event
    shape. Usage with a real broker:

        events = spark.readStream.format("kafka")...load()
        applier = make_batch_applier(..., transform=json_value_transform())

    Rows whose JSON fails to parse keep NULL envelope fields and are
    routed to quarantine by the dead-letter splitter — a poison-pill
    record can never abort the stream."""
    schema = event_schema or S.CHANGE_EVENT_SCHEMA
    def _tx(df: DataFrame) -> DataFrame:
        parsed = df.select(
            F.from_json(F.col("value").cast("string"), schema).alias("_e"))
        return parsed.select(*[F.col(f"_e.{f.name}").alias(f.name)
                               for f in schema.fields])
    return _tx


# Auto raw-append policy bounds (make_batch_applier(dedupe_batch="auto")).
# The within-batch LWW dedupe is the MOR micro-batch's ONLY shuffle stage.
# Measured on the bench shape (BENCH/BASELINE.md round 8 decomposition):
# the exchange costs ~2x the parquet encode PER ROW, so deduping can never
# win the batch wall — the encode it saves, N*(1-1/dup) rows, is strictly
# less than the N rows it shuffles (raw-append measured 1.7-2.1x faster at
# 2 AND 8 cores, duplication 1.3-3.2x). What the dedupe DOES buy is bounded
# delta inflation: raw deltas hold events, not winners, so pending-delta
# volume (and read-time LWW resolve + compaction debt) grows dup-fold.
# Hence the bounds are AMPLIFICATION control, not wall optimization:
# dedupe when duplication exceeds the compaction policy's row-fraction
# headroom, or when the batch is backlog-sized (its raw deltas would be a
# large table fraction until the next compact). Both bounds are absolute —
# deliberately independent of core count / shuffle partitions, so the same
# stream does identical work at every cluster size (scaling evidence stays
# honest, and a cluster resize cannot flip the write shape). The policy
# feeds back on the PREVIOUS batch's measured size and duplication ratio
# (stream batches are auto-correlated; the numbers ride the apply's own
# Observation — zero extra Spark work).
RAW_APPEND_MAX_ROWS = 8_000_000     # above: backlog-sized, dedupe up front
RAW_APPEND_MAX_DUP_RATIO = 4.0      # above: raw deltas inflate >4x, dedupe


def make_batch_applier(table: LakeTable, stream_id: str, quarantine_dir: str,
                       *, write_salt: int = 4, mode: str = "cow",
                       retries: int = 0,
                       dedupe_batch: "bool | str" = "auto",
                       metrics: MetricsLog | None = None,
                       compaction: CompactionPolicy | None = None,
                       transform: Callable[[DataFrame], DataFrame] | None = None,
                       timings: list | None = None,
                       ) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body, exposed so ANY source shape can drive the
    sink — the file tail below, a rate source, or ``format("kafka")`` with
    a ``transform`` that parses the value bytes into the change-event
    shape. Each micro-batch: optional transform → dead-letter split →
    idempotent apply (the bad-row count rides its scan as an Observation)
    → count-gated epoch-keyed quarantine write → metrics → optional
    auto-maintenance (:func:`maintenance.maintain`).

    ``dedupe_batch`` (``mode="mor"`` only): ``True`` always LWW-dedupes
    the batch before the delta append, ``False`` always raw-appends
    (Hudi insert-path analog — read-time LWW makes the answer identical
    either way), and ``"auto"`` (default) picks per batch: raw-append
    when the previous batch was trickle-sized AND its duplication ratio
    was low (see the policy constants above), dedupe otherwise. The
    first batch of a stream dedupes (conservative: it may be a huge
    catch-up backlog). CoW ignores the knob — its fused merge dedupes
    inherently.

    ``retries`` > 0 is REQUIRED when more than one writer targets the
    table (a second stream, a concurrent compactor/DML): a losing commit
    first tries the metadata-only rebase, then recomputes up to
    ``retries`` times (see :func:`merge.apply_batch`). Single-writer
    deployments keep 0 (fail fast)."""
    if dedupe_batch not in (True, False, "auto"):
        raise ValueError("dedupe_batch: True, False, or 'auto'")
    auto = dedupe_batch == "auto" and mode == "mor"
    policy = {"dedupe": True}          # auto state: first batch dedupes

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if transform is not None:
            batch_df = transform(batch_df)
        good, bad, qobs = split_quarantine_observed(batch_df)
        use_dedupe = (policy["dedupe"] if auto
                      else (True if dedupe_batch == "auto"
                            else bool(dedupe_batch)))
        res = apply_batch(table, good, stream_id=stream_id, epoch=batch_id,
                          write_salt=write_salt, mode=mode, retries=retries,
                          dedupe_batch=use_dedupe)
        if auto and res.events_in:
            small = res.events_in <= RAW_APPEND_MAX_ROWS
            if use_dedupe:
                dup = res.events_in / max(res.rows_written
                                          or res.events_in, 1)
            else:
                dup = res.events_in / max(res.key_estimate
                                          or res.events_in, 1)
            policy["dedupe"] = not (small
                                    and dup <= RAW_APPEND_MAX_DUP_RATIO)
        # Dead-letter write, GATED on the bad-row count that rode the
        # apply's own census/staging scan (zero extra pass): a clean batch
        # — the steady state of a healthy stream — skips the second
        # full-width scan of the batch entirely (it was 24% of a drain's
        # wall, BENCH/BASELINE.md round 7). ``events_in is None`` means
        # apply short-circuited BEFORE any action (epoch-gate replay, or a
        # competing writer landed the same epoch), so the count never
        # materialized — those rare paths fall back to the unconditional
        # write, which is exactly what a replay needs: the write is
        # epoch-keyed overwrite (same subdir rewritten, no duplicates).
        # Failure ordering is unchanged: a lost dead-letter write fails
        # the batch before the checkpoint advances, and the replay is safe
        # because apply is epoch-gated + LWW-idempotent.
        t_quar = 0.0
        n_bad = (None if res.events_in is None
                 else observed_bad_count(qobs))
        if n_bad is None or n_bad:
            _t = time.time()
            (bad.withColumn("_stream_id", F.lit(stream_id))
                .withColumn("_epoch", F.lit(batch_id))
                .write.mode("overwrite")
                .parquet(os.path.join(quarantine_dir,
                                      f"{stream_id}-{batch_id:08d}")))
            t_quar = time.time() - _t
        if metrics is not None:
            metrics.record(res, stream_id=stream_id, epoch=batch_id)
        t_maint = 0.0
        if compaction is not None and res.snapshot is not None:
            _t = time.time()
            maintain(table, compaction)
            t_maint = time.time() - _t
        if timings is not None:
            # per-micro-batch wall breakdown (bench_stream aggregates it
            # into the driver-cost table — VERDICT r6 item 6)
            row = {"batch_id": batch_id, "events_in": res.events_in,
                   "quarantine_s": round(t_quar, 4),
                   "maintain_s": round(t_maint, 4),
                   "batch_total_s": round(time.time() - t0, 4)}
            if mode == "mor":
                row["dedupe_batch"] = use_dedupe
            if res.timings:
                row.update(res.timings)
            timings.append(row)
    return _apply


def run_stream(spark: SparkSession, source_dir: str, table: LakeTable,
               checkpoint_dir: str, *,
               event_schema=None,
               source_format: str = "parquet",
               max_files_per_trigger: int | None = None,
               watermark: str = "1 hour",
               available_now: bool = False,
               write_salt: int = 4,
               mode: str = "cow",
               retries: int = 0,
               dedupe_batch: "bool | str" = "auto",
               dedup_in_stream: bool = False,
               metrics: MetricsLog | None = None,
               quarantine_dir: str | None = None,
               compaction: CompactionPolicy | None = None,
               options: dict[str, Any] | None = None,
               timings: list | None = None) -> StreamingQuery:
    """Start the WAL tail. Returns the StreamingQuery; callers own its
    lifecycle (``processAllAvailable``/``awaitTermination``/``stop``).

    ``available_now=True`` drains everything currently in the source and
    stops — the batch-catchup mode (and what the tests use).
    ``max_files_per_trigger`` paces a continuous tail.

    Every micro-batch is routed through the dead-letter splitter first:
    lake commits are all-or-nothing and can never be rolled back, so a
    malformed row (null key/LSN, unknown op) must be excluded *before* the
    write — it lands in the quarantine table at ``quarantine_dir``
    (default ``<table>/quarantine``) instead of the lake. Quarantine
    writes are per-epoch overwrites, so a replayed micro-batch is
    idempotent there too.

    ``dedupe_batch`` (``mode="mor"`` only) picks the delta write shape
    per batch — see :func:`make_batch_applier`; the ``"auto"`` default
    raw-appends trickle micro-batches (skipping the batch's only shuffle
    stage) and falls back to LWW dedupe for big or duplicate-heavy ones.

    ``compaction`` (recommended for ``mode="mor"``) runs the maintenance
    policy after each commit: without it, MOR deltas accumulate forever —
    bucket pruning stays disabled for them and every ``read_state`` pays a
    growing LWW resolve. The policy's no-op path costs zero Spark jobs per
    batch (metadata checks only).
    """
    schema = event_schema or S.CHANGE_EVENT_SCHEMA
    # the WAL tail is a Source (the ingest seam — sources.py): swapping a
    # kafka/jdbc-backed implementation in changes nothing downstream
    src = FileSource(source_dir, source_format, schema=schema,
                     options=dict(options or {}))
    events = (src.read_stream(spark,
                              max_files_per_trigger=max_files_per_trigger)
              .withWatermark("event_ts", watermark))
    if dedup_in_stream:
        # optional stateful pre-dedup: drops exact at-least-once replays
        # before they reach the sink (state bounded by the watermark).
        # Purely a bandwidth optimization — apply_batch is idempotent by
        # LSN either way, which is what correctness rests on.
        events = events.dropDuplicatesWithinWatermark(["lsn"])

    sid = stream_id_for(checkpoint_dir)
    qdir = quarantine_dir or os.path.join(table.path, "quarantine")
    _apply = make_batch_applier(table, sid, qdir, write_salt=write_salt,
                                mode=mode, retries=retries,
                                dedupe_batch=dedupe_batch, metrics=metrics,
                                compaction=compaction, timings=timings)

    writer = (events.writeStream
              .foreachBatch(_apply)
              .option("checkpointLocation", checkpoint_dir)
              .queryName(sid))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(spark: SparkSession, source_dir: str, table: LakeTable,
          checkpoint_dir: str, **kwargs) -> None:
    """Run the stream until the source is exhausted, then stop — one
    checkpointed catch-up pass (used by tests and the bench)."""
    q = run_stream(spark, source_dir, table, checkpoint_dir,
                   available_now=True, **kwargs)
    q.awaitTermination()
