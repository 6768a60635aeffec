"""CDC reduction primitives: LSN dedup + last-writer-wins, skew-defended.

The reference applied changes one row at a time in arrival order
(``/root/reference/scripts/collector.py:103-141``); correct only
single-threaded. Here the same semantics are an order-insensitive
aggregation: the winner for a key is the event with the highest LSN, so
any partitioning/ordering of the log yields the same result (the property
the tests verify).

Skew note: ``groupBy(key).agg(max_by(...))`` already does map-side partial
aggregation (a built-in two-level reduce), which defuses duplicate-heavy
hot keys. ``dedupe_lww_salted`` additionally makes the two-level shape
explicit with a salt on ``pmod(xxhash64(lsn), S)`` — provably equivalent
(tested) — for the extreme case where one (conv_id, turn_idx) key receives
a pathological share of all updates. Never use a
``Window.partitionBy(conv_id)`` for this: one hot conversation at 10^10
events would pin a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rockefeller_spark.schema import KEY_COLS


def _winner_struct(df: DataFrame, key_cols: list[str], order_col: str) -> Column:
    rest = [c for c in df.columns if c not in key_cols]
    assert order_col in rest
    return F.struct(*[F.col(c) for c in rest])


def dedupe_lww(events: DataFrame, key_cols: list[str] | None = None,
               order_col: str = "lsn") -> DataFrame:
    """One winning event per key: max-LSN last-writer-wins.

    Duplicate-LSN events are bit-identical replays (at-least-once
    delivery), so the tie is semantics-free. Executes as a single hash
    aggregation with map-side combine — one shuffle, no window, no sort.
    """
    key_cols = key_cols or KEY_COLS
    w = _winner_struct(events, key_cols, order_col)
    out = (events.groupBy(*key_cols)
           .agg(F.max_by(w, F.col(order_col)).alias("_w")))
    rest = [c for c in events.columns if c not in key_cols]
    return out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in rest])


def dedupe_lww_salted(events: DataFrame, key_cols: list[str] | None = None,
                      order_col: str = "lsn", n_salts: int = 16) -> DataFrame:
    """Explicit two-level LWW: local max per (key, salt), then global max
    per key. Equivalent to ``dedupe_lww`` (max is associative/commutative);
    bounds any single reducer's input to ~1/n_salts of a hot key's events
    even if partial aggregation were disabled."""
    key_cols = key_cols or KEY_COLS
    rest = [c for c in events.columns if c not in key_cols]
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts)))
    w = F.struct(*[F.col(c) for c in rest])
    local = (salted.groupBy(*key_cols, "_salt")
             .agg(F.max_by(w, F.col(order_col)).alias("_w"),
                  F.max(order_col).alias("_m")))
    glob = (local.groupBy(*key_cols)
            .agg(F.max_by(F.col("_w"), F.col("_m")).alias("_w")))
    return glob.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in rest])


def winners_to_stored(winners: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Project deduped change events into the stored-row shape:
    payload columns + ``_lsn`` (the event's LSN) + ``_deleted`` (tombstone
    flag for op='D'; kept in place so a late lower-LSN event can never
    resurrect a deleted key)."""
    key_cols = key_cols or KEY_COLS
    payload = [c for c in winners.columns
               if c not in key_cols and c not in ("lsn", "op", "event_ts")]
    is_del = F.col("op") == "D"
    cols = [F.col(k) for k in key_cols]
    for c in payload:
        cols.append(F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c))
    cols.append(F.col("lsn").alias("_lsn"))
    cols.append(is_del.alias("_deleted"))
    return winners.select(*cols)


def filter_new_events(events: DataFrame, applied: DataFrame,
                      bucket_col: Column, key: str = "part_key", *,
                      assume_contiguous_lsn_prefix: bool = False) -> DataFrame:
    """Pre-filter events already covered by the per-bucket high-water mark
    (``applied_lsns``): a broadcast left join + filter.

    PRECONDITION (caller must opt in): the batches already applied to the
    table form an **LSN-contiguous prefix per bucket** — i.e. for every
    bucket, every event with lsn ≤ that bucket's high-water mark has been
    applied. That holds when batches are applied in LSN order (the
    streaming path over an LSN-ordered WAL, and bench.py's lsn-range
    batching), and it is what makes dropping ``lsn ≤ max_lsn`` safe: each
    dropped event is guaranteed to already be reflected in stored state.

    It does NOT hold for arbitrary out-of-order batch application (which
    apply_batch itself supports): a never-applied low-LSN event for key K
    would be silently dropped because a *different* key in K's bucket
    pushed the bucket HWM past it. Because the precondition is a property
    of the apply history — not checkable from the inputs — callers must
    assert it explicitly via ``assume_contiguous_lsn_prefix=True``; without
    it this function refuses to run rather than risk permanent data loss.
    When in doubt, skip the prefilter: apply is idempotent by ``_lsn``, so
    the prefilter is only ever a bandwidth optimization.
    """
    if not assume_contiguous_lsn_prefix:
        raise ValueError(
            "filter_new_events drops events at bucket granularity and is "
            "only lossless when applied batches form an LSN-contiguous "
            "prefix per bucket; pass assume_contiguous_lsn_prefix=True to "
            "assert that, or skip the prefilter (apply is idempotent)")
    a = F.broadcast(applied.select(F.col(key), F.col("max_lsn")))
    return (events.withColumn(key, bucket_col.cast("string"))
            .join(a, key, "left")
            .filter(F.col("max_lsn").isNull() | (F.col("lsn") > F.col("max_lsn")))
            .drop(key, "max_lsn"))
