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


# Lossless widening chains (Iceberg's type-promotion rules, which Spark's
# parquet readers natively honor at scan time since the type-widening work
# in Spark 4: an int32 file column reads as long under a long read schema,
# so widening is METADATA-ONLY — old files are never rewritten).
_WIDEN_CHAINS: list[list[T.DataType]] = [
    [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()],
    [T.FloatType(), T.DoubleType()],
]


def widens(old: T.DataType, new: T.DataType) -> bool:
    """True when ``old`` promotes LOSSLESSLY to ``new``: the integer
    chain byte→short→int→long, float→double, and decimal precision
    growth at unchanged scale. Everything else (narrowing, cross-family,
    string↔number, scale changes) is not a widening."""
    for chain in _WIDEN_CHAINS:
        if old in chain and new in chain:
            return chain.index(old) < chain.index(new)
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        return new.scale == old.scale and new.precision > old.precision
    return False


def evolve_additive(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Return ``base`` extended with any new nullable fields from
    ``incoming``, and with any field whose incoming type is a lossless
    WIDENING of the stored type promoted in place (int→long,
    float→double, decimal precision growth — metadata-only; old files
    read under the widened schema natively). A base column absent from
    ``incoming`` is retained unchanged, and an incoming column NARROWER
    than the stored type keeps the stored type (the batch's values
    up-cast on write). Everything else — cross-family changes, renames
    expressed as drop+add of the same data, scale changes — raises:
    evolution through this path never loses information. The reference
    silently dropped unknown incoming fields
    (``/root/reference/scripts/collector.py:55-59``); we promote them.
    """
    by_name = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f in incoming.fields:
        old = by_name.get(f.name)
        if old is None:
            out.append(T.StructField(f.name, f.dataType, True))
        elif old.dataType != f.dataType:
            if widens(old.dataType, f.dataType):
                out[out.index(old)] = T.StructField(
                    old.name, f.dataType, old.nullable)
            elif widens(f.dataType, old.dataType):
                pass              # batch narrower: stored type wins
            else:
                raise ValueError(
                    f"non-additive schema change for column {f.name!r}: "
                    f"{old.dataType} -> {f.dataType}")
    return T.StructType(out)
