"""Canonical schemas for the transcript lake and the CDC event log.

Succeeds the reference's twice-declared fixed column list
(``/root/reference/scripts/tools/df_manipulation.py:33-60`` and the INSERT
list at ``/root/reference/scripts/collector.py:55-59``): here the schema is
declared once, as Spark ``StructType``, and additive evolution is a
first-class operation (``evolve_additive``), not a silent drop.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Target lake table: multi-turn conversation / agent transcripts.
# Primary key (conv_id, turn_idx); stable turn ordering by turn_idx.
# ---------------------------------------------------------------------------

KEY_COLS = ["conv_id", "turn_idx"]

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

# Engine-managed columns carried on every stored row. `_lsn` is the LSN of
# the change that produced the row (last-writer-wins watermark); `_deleted`
# marks a tombstone kept in place so late, lower-LSN events can never
# resurrect a deleted key. Physical removal happens only at compaction.
META_FIELDS = [
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("_deleted", T.BooleanType(), False),
]
META_COLS = [f.name for f in META_FIELDS]

STORED_TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS + META_FIELDS)

# ---------------------------------------------------------------------------
# CDC change-event log (the WAL tail). op in {'I','U','D'}; payload columns
# null for deletes. event_ts is the watermark column for streaming.
# ---------------------------------------------------------------------------

CHANGE_EVENT_FIELDS = [
    T.StructField("lsn", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("event_ts", T.TimestampType(), False),
]
CHANGE_EVENT_SCHEMA = T.StructType(CHANGE_EVENT_FIELDS)

# Schema-evolution epoch: additive columns (BASELINE.json "new tool/metadata
# columns promoted without rewrite").
EVOLVED_EXTRA_FIELDS = [
    T.StructField("tool_call_id", T.StringType(), True),
    T.StructField("latency_ms", T.IntegerType(), True),
]
CHANGE_EVENT_SCHEMA_V2 = T.StructType(CHANGE_EVENT_FIELDS + EVOLVED_EXTRA_FIELDS)


def payload_cols(event_schema: T.StructType) -> list[str]:
    """Columns of a change event that form the target-row payload
    (everything except the envelope: lsn/op/event_ts)."""
    envelope = {"lsn", "op", "event_ts"}
    return [f.name for f in event_schema.fields if f.name not in envelope]


def evolve_additive(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Return ``base`` extended with any new nullable fields from
    ``incoming``. Raises on type conflicts — evolution is additive only.
    A base column absent from ``incoming`` is retained unchanged (columns
    can never be dropped or narrowed through this path; a batch simply not
    carrying a column is normal and its stored values are untouched). The
    reference silently dropped unknown incoming fields
    (``/root/reference/scripts/collector.py:55-59``); we promote them.
    """
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f in incoming.fields:
        old = by_name.get(f.name)
        if old is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif old.dataType != f.dataType:
            raise ValueError(
                f"non-additive schema change for column {f.name!r}: "
                f"{old.dataType} -> {f.dataType}")
    return T.StructType(out)
