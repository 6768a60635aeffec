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
- :class:`FeedCursor` — durable consumer-group offsets over the feed
  (the Kafka-consumer-group analog over snapshots): CAS-acked positions
  via the table's own commit backend, multi-worker safe, stale-cursor
  detection against snapshot retention.
- :func:`lsn_gaps` — missing-LSN ranges in an event log (the data-loss
  alarm for an at-least-once WAL tail). Block-partitioned so no single
  task ever sorts the whole log: in-block gaps come from a bounded
  window, cross-block gaps from a tiny per-block aggregate.

The reference has no change-consumption surface at all (its verify step
re-reads whole tables, ``/root/reference/scripts/verify.py``); these are
the standard operators a lake exposes downstream.
"""

from __future__ import annotations

import json
import os

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


class StaleCursorError(RuntimeError):
    """The cursor's acked snapshot has been expired by retention: the
    incremental feed from it no longer exists. Re-base the consumer
    (full sync from ``read_state`` + :meth:`FeedCursor.reset`)."""


class CursorConflictError(RuntimeError):
    """Another worker of the same consumer group acked a DIFFERENT
    window at this sequence — re-poll from the advanced position."""


class FeedCursor:
    """Durable consumer-group offsets over the change feed — transactional
    position advancement for downstream consumers (index builders, derived
    tables, cache invalidation), the Kafka-consumer-group analog over
    snapshots.

    :func:`changes_since` leaves the position with the caller; this class
    makes it DURABLE and MULTI-WORKER SAFE by reusing the table's own
    commit primitives (``backends.CommitBackend``): each ack is a
    conditional PUT of an immutable state object (``c-{seq}.json``) —
    exactly one worker of a group can win a sequence number — followed by
    a monotonic pointer advance, the same two-step the table's snapshot
    publish uses, with the same crash recovery (an ack that crashed
    between PUT and pointer is completed by the next ack's idempotent
    re-adopt). Works unchanged on both the POSIX and the conditional-PUT
    object-store backend.

    Delivery contract: offsets advance transactionally; the window
    between ``poll`` and ``ack`` replays after a crash, so processing
    must be idempotent or transactional with its sink — the standard
    offsets-based contract. A cursor whose position fell behind snapshot
    retention raises :class:`StaleCursorError` (re-base via ``reset``).
    Cursor state is O(1) per group regardless of table size; polling
    cost is the metadata-pruned :func:`changes_between`.
    """

    def __init__(self, table: LakeTable, consumer_id: str):
        if "/" in consumer_id or not consumer_id:
            raise ValueError(f"bad consumer_id {consumer_id!r}")
        self.table = table
        self.consumer_id = consumer_id
        self._dir = os.path.join("metadata", "cursors", consumer_id)
        os.makedirs(os.path.join(table.path, self._dir), exist_ok=True)
        self._head = os.path.join(self._dir, "HEAD")

    # -- state ---------------------------------------------------------
    def _state_rel(self, seq: int) -> str:
        return os.path.join(self._dir, f"c-{seq:08d}.json")

    def _read_seq(self) -> int:
        try:
            return self.table.backend.read_pointer(self._head)
        except (FileNotFoundError, ValueError):
            return -1

    def position(self) -> int | None:
        """The last ACKED snapshot id, or None for a new consumer. Reads
        past the pointer first: an ack that crashed after its conditional
        PUT but before the pointer advance is still the group's latest
        state (the PUT is the commit point, the pointer is a hint — the
        exact recovery rule the table's own publish uses)."""
        seq = self._read_seq()
        probe = seq + 1
        if self.table.backend.exists(self._state_rel(probe)):
            self.table.backend.advance_pointer(self._head, probe)  # repair
            seq = probe
        if seq < 0:
            return None
        state = json.loads(self.table.backend.read(self._state_rel(seq)))
        return int(state["snapshot_id"])

    # -- consumption -----------------------------------------------------
    def poll(self, *, start_at: str = "current"
             ) -> "tuple[DataFrame | None, dict | None]":
        """The unconsumed change window and its ack token, or
        ``(None, None)`` when the consumer is up to date.

        A NEW consumer's base position is ``start_at``: ``"current"``
        (consume only future changes) or ``"oldest"`` (the oldest
        retained snapshot — everything retention still holds). Onboarding
        order for ``"current"``: establish the base FIRST (this call),
        then full-sync from exactly that snapshot
        (``read_state(table, snapshot_id=cursor.position())``) — syncing
        before the base ack would lose whatever lands in between."""
        cur = self.table.current_version()
        pos = self.position()
        if pos is None:
            if start_at == "current":
                self.ack({"from": None, "snapshot_id": cur,
                          "seq": self._read_seq() + 1})
                return None, None
            if start_at != "oldest":
                raise ValueError(f"start_at={start_at!r}")
            pos = self.table.history()[0].snapshot_id
        if pos >= cur:
            return None, None
        try:
            self.table.snapshot(pos)
        except Exception as e:
            raise StaleCursorError(
                f"cursor {self.consumer_id!r} at v{pos}, which retention "
                f"expired — full re-sync + reset() required") from e
        df = changes_between(self.table, pos, cur)
        return df, {"from": pos, "snapshot_id": cur,
                    "seq": self._read_seq() + 1}

    def ack(self, token: dict) -> None:
        """Advance the group position to ``token`` — atomic, exactly one
        winner per sequence. A replayed ack of the SAME window is
        adopted idempotently; a competing ack of a different window
        raises :class:`CursorConflictError`."""
        seq = int(token["seq"])
        blob = json.dumps({"snapshot_id": token["snapshot_id"],
                           "from": token.get("from"),
                           "consumer": self.consumer_id}).encode()
        try:
            self.table.backend.put_if_absent(self._state_rel(seq), blob)
        except FileExistsError:
            existing = json.loads(
                self.table.backend.read(self._state_rel(seq)))
            if existing.get("snapshot_id") != token["snapshot_id"]:
                raise CursorConflictError(
                    f"seq {seq} already acked at "
                    f"v{existing.get('snapshot_id')} (this worker wanted "
                    f"v{token['snapshot_id']}) — re-poll") from None
            # same window: idempotent re-ack (crash between PUT+pointer)
        self.table.backend.advance_pointer(self._head, seq)

    def lag(self) -> dict:
        """Consumer-lag snapshot (the Kafka consumer-lag analog), pure
        metadata: snapshots behind, commit-time lag in ms (current
        snapshot's timestamp minus the acked one's), and whether the
        acked position is still inside retention. The alerting number
        for a fleet of derived-table consumers."""
        cur = self.table.current()
        pos = self.position()
        if pos is None:
            return {"position": None, "snapshots_behind": None,
                    "lag_ms": None, "within_retention": True}
        behind = cur.snapshot_id - pos
        try:
            acked = self.table.snapshot(pos)
            within = True
            lag_ms = max(0, cur.timestamp_ms - acked.timestamp_ms) \
                if behind else 0
        except ValueError:
            within, lag_ms = False, None
        return {"position": pos, "snapshots_behind": behind,
                "lag_ms": lag_ms, "within_retention": within}

    def reset(self, snapshot_id: int | None = None) -> None:
        """Re-base a stale/new cursor at ``snapshot_id`` (default: the
        table's current snapshot) — pair with the consumer's full
        re-sync. Runs through the same CAS ack path, so concurrent
        workers cannot silently double-reset."""
        self.ack({"from": None,
                  "snapshot_id": (self.table.current_version()
                                  if snapshot_id is None else snapshot_id),
                  "seq": self._read_seq() + 1})


def sync_mirror(src: LakeTable, dst: LakeTable, consumer_id: str, *,
                mode: str = "cow", max_windows: int | None = None,
                start_at: str = "oldest") -> dict:
    """Keep a DERIVED LakeTable in sync with ``src``'s change feed — CDC
    chaining (the Delta-CDF → downstream-MERGE pattern): each unconsumed
    feed window becomes one change-event batch (window-end snapshot id as
    the LSN — strictly increasing per ack, one row per key per window, so
    LWW across windows is exact) applied to ``dst`` through the normal
    apply path, then the window is acked on the durable
    :class:`FeedCursor`.

    Exactly-once BOTH ways: a crash between apply and ack replays the
    window with the same cursor ``seq``, and the mirror apply stamps
    ``stream_id="mirror:{consumer}"``/``epoch=seq`` — ``dst``'s own epoch
    ledger turns the replay into a no-op before the cursor re-acks. The
    downstream table must be owned by the mirror (direct writes to it
    would interleave foreign LSNs with the window numbering).

    A new consumer with ``start_at="oldest"`` replays everything
    retention still holds; if ``src``'s early history already expired,
    bootstrap ``dst`` from a full ``read_state`` first and pass
    ``start_at="current"`` (the :class:`FeedCursor` onboarding order).
    Returns ``{"windows", "rows", "dst_version"}``."""
    from rockefeller_spark.merge import apply_batch
    cur = FeedCursor(src, consumer_id)
    windows = 0
    rows = 0
    while max_windows is None or windows < max_windows:
        df, tok = cur.poll(start_at=start_at)
        if df is None:
            break
        payload = [c for c in df.columns
                   if c not in S.KEY_COLS and c != "_change"]
        # source schema evolution mid-stream: the feed already projects
        # the window in the window-END schema (adds null-filled, widens
        # cast up, renames mapped forward); evolve the mirror additively
        # to match before the apply, same zero-rewrite commit the source
        # made. Renames/drops are metadata-only on the source and cannot
        # be replayed through a value feed — mirror consumers see the
        # new names with old values NULL, exactly like a late consumer
        # of the source's own feed.
        dst_cols = {f.name for f in dst.current().schema.fields}
        if any(c not in dst_cols for c in payload):
            dst.evolve(src.snapshot(tok["snapshot_id"]).schema)
        ev = df.select(
            F.lit(tok["snapshot_id"]).cast("long").alias("lsn"),
            F.when(F.col("_change") == "delete", F.lit("D"))
             .otherwise(F.lit("U")).alias("op"),
            *S.KEY_COLS, *payload,
            F.current_timestamp().alias("event_ts"))
        res = apply_batch(dst, ev, stream_id=f"mirror:{consumer_id}",
                          epoch=tok["seq"], mode=mode)
        rows += res.events_in or 0
        cur.ack(tok)
        windows += 1
    return {"windows": windows, "rows": rows,
            "dst_version": dst.current_version()}


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
