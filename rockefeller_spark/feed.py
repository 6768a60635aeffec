"""CDC *output* surface: consume the lake's own change history.

The apply path turns a change stream INTO table state; this module goes
the other way — downstream consumers (index builders, cache invalidation,
derived tables) read what changed between two snapshots, and operators
audit the ingested log for holes.

- :func:`changes_between` — row-level change feed between two snapshots
  (Delta CDF / Iceberg incremental-read analog), METADATA-PRUNED: data
  files are immutable, so a bucket whose file set is identical in both
  snapshots cannot have changed and is never read. The only data work is
  a key-join over the changed buckets' states.
- :func:`lsn_gaps` — missing-LSN ranges in an event log (the data-loss
  alarm for an at-least-once WAL tail). Block-partitioned so no single
  task ever sorts the whole log: in-block gaps come from a bounded
  window, cross-block gaps from a tiny per-block aggregate.

The reference has no change-consumption surface at all (its verify step
re-reads whole tables, ``/root/reference/scripts/verify.py``); these are
the standard operators a lake exposes downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rockefeller_spark import schema as S
from rockefeller_spark.lake import LakeTable, changed_buckets
from rockefeller_spark.merge import read_state


def changes_between(table: LakeTable, from_snapshot_id: int,
                    to_snapshot_id: int, *, prune: bool = True) -> DataFrame:
    """One row per key whose VISIBLE value differs between two snapshots:
    ``(key cols, _change ∈ insert|update|delete, new payload cols — null
    for deletes)``.

    Scale shape: both snapshots' metadata is compared at MANIFEST-SHARD
    granularity first (untouched shards share their manifest file by
    path — zero I/O to skip them), then changed shards' file-set diff
    yields the changed buckets; only those are read (immutable files ⇒
    identical bytes ⇒ identical state). A small CoW batch that touched 3
    of 4096 buckets yields a feed that reads 3 buckets twice, not the
    table twice. Bucket-spanning MOR delta files carry their touched-
    bucket set (stamped at append time), so pruning SURVIVES a pending
    delta trickle — only an unannotated delta (unknown reach) falls back
    to a full double read.

    ``prune=False`` disables the metadata pruning and diffs the full
    states (the benchmark reference; also the escape hatch if file
    immutability were ever violated out-of-band).
    """
    s_from = table.snapshot(from_snapshot_id)
    s_to = table.snapshot(to_snapshot_id)
    buckets = changed_buckets(s_from, s_to) if prune else None
    # note: an empty `buckets` set (identical file sets — metadata-only
    # commits) flows through read_state as a zero-file read → empty feed
    old = read_state(table, from_snapshot_id, buckets=buckets)
    new = read_state(table, to_snapshot_id, buckets=buckets)

    payload = [c for c in new.columns if c not in S.KEY_COLS]
    # rename/drop evolution between the snapshots: map the older state's
    # columns FORWARD through the name-log entries in (from, to] so a
    # pure rename is NOT reported as a change (same value, new name);
    # a dropped column leaves the comparison, and a name re-added after
    # a drop compares old=NULL (stale values never resurface)
    for entry in s_to.name_log:
        if s_from.snapshot_id < entry["v"] <= s_to.snapshot_id:
            if "rename" in entry:
                old = old.withColumnRenamed(*entry["rename"])
            elif "drop" in entry and entry["drop"] in old.columns:
                old = old.drop(entry["drop"])
    # additive schema evolution between the snapshots: the older state
    # simply lacks the new columns — null-fill them (same read semantics
    # the lake gives old FILES under the new schema); a column WIDENED
    # between the snapshots (int→long etc.) is cast up so the value
    # comparison runs in the newer type (42 == 42L ⇒ not a change)
    for c in payload:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        elif old.schema[c].dataType != new.schema[c].dataType:
            old = old.withColumn(c, F.col(c).cast(new.schema[c].dataType))
    o = old.select(*S.KEY_COLS,
                   F.struct(*[F.col(c) for c in payload]).alias("_old"),
                   F.lit(True).alias("_in_old"))
    n = new.select(*S.KEY_COLS,
                   F.struct(*[F.col(c) for c in payload]).alias("_new"),
                   F.lit(True).alias("_in_new"))
    j = o.join(n, S.KEY_COLS, "full_outer")
    change = (F.when(F.col("_in_old").isNull(), "insert")
              .when(F.col("_in_new").isNull(), "delete")
              .when(~F.col("_old").eqNullSafe(F.col("_new")), "update"))
    return (j.withColumn("_change", change)
            .filter(F.col("_change").isNotNull())
            .select(*S.KEY_COLS, "_change",
                    *[F.col(f"_new.{c}").alias(c) for c in payload]))


def changes_since(table: LakeTable,
                  last_snapshot_id: int | None = None, *,
                  timestamp: "int | float | None" = None
                  ) -> tuple[DataFrame, int]:
    """Cursor-style incremental consumption: the change feed from a
    downstream consumer's last-seen position to the table's CURRENT
    snapshot, plus the new cursor value. The position is either a
    snapshot id or (``timestamp=``, epoch millis/seconds — Delta's
    ``startingTimestamp`` analog) — a timestamp resolves to the snapshot
    current AT that moment via :meth:`LakeTable.snapshot_as_of`, so "give
    me everything since 14:00" needs no cursor bookkeeping. The consumer
    persists the returned cursor only after successfully processing the
    feed — re-running from the old cursor replays the same
    (deterministic) feed, so consumption is at-least-once with idempotent
    replays, matching the engine's own delivery contract. Expired cursors
    (older than ``expire_snapshots``'s retention) raise cleanly —
    re-bootstrap the consumer from a full read in that case."""
    if (last_snapshot_id is None) == (timestamp is None):
        raise ValueError("pass exactly one of last_snapshot_id, timestamp")
    if timestamp is not None:
        last_snapshot_id = table.snapshot_as_of(timestamp).snapshot_id
    current = table.current_version()
    return changes_between(table, last_snapshot_id, current), current


def lsn_gaps(events: DataFrame, lsn_col: str = "lsn",
             block: int = 1_000_000) -> DataFrame:
    """Missing-LSN ranges ``(gap_start, gap_end)`` in an event log — every
    maximal run of absent LSNs strictly between the observed min and max.

    Distributed shape (never one global sort task): distinct LSNs land in
    fixed-width blocks of ``block``; a window per block (bounded rows)
    finds in-block gaps, and cross-block gaps come from a per-block
    (min, max) aggregate that is ~n/block rows — tiny even at 10^10
    events (10^4 rows at the default width).
    """
    l = (events.select(F.col(lsn_col).cast("long").alias("lsn"))
         .distinct()
         .withColumn("_blk", F.floor(F.col("lsn") / block)))
    w = Window.partitionBy("_blk").orderBy("lsn")
    intra = (l.withColumn("_prev", F.lag("lsn").over(w))
             .filter(F.col("lsn") - F.col("_prev") > 1)
             .select((F.col("_prev") + 1).alias("gap_start"),
                     (F.col("lsn") - 1).alias("gap_end")))
    blk = l.groupBy("_blk").agg(F.min("lsn").alias("_mn"),
                                F.max("lsn").alias("_mx"))
    w2 = Window.orderBy("_blk")          # ~n/block rows: single tiny task
    inter = (blk.withColumn("_pmx", F.lag("_mx").over(w2))
             .filter(F.col("_mn") - F.col("_pmx") > 1)
             .select((F.col("_pmx") + 1).alias("gap_start"),
                     (F.col("_mn") - 1).alias("gap_end")))
    return intra.unionByName(inter)
