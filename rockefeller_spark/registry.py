"""Operator registry: every public operator as a (spark_query, oracle_sql)
pair over the driver's testdata tables.

Each entry is one operator family from SURVEY.md §2 (CDC core, relational,
windows, set ops, text-pipeline, similarity search). The Spark callable
takes (spark, sf_dir) and returns a DataFrame; the oracle is ANSI-ish SQL
DuckDB runs over the same parquet (views pre-registered by the driver).
Column names and value types are aligned on both sides — aggregates are
summed as exact decimals and cast to double, similarity scores are computed
in sequential double precision and rounded — so the driver's
order-insensitive value hash matches bit-for-bit.

Every entry carries an oracle. The sketch families (MinHash-LSH, SimHash,
sign-LSH) run in portable-hash mode here — md5-derived hashes both engines
compute identically — so even the approximate operators are value-checked
end-to-end; the xxhash64 fast path of the same operators is covered by
pytest properties (tests/test_textops.py).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rockefeller_spark import dedup as D
from rockefeller_spark import simsearch as V
from rockefeller_spark import textops as X
from rockefeller_spark.cdc import dedupe_lww, dedupe_lww_salted
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, read_state
from rockefeller_spark.normalize import normalize_columns
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _spread(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the cluster when the source can't.

    The driver's testdata files are single-row-group parquet, so Spark's
    scan yields ONE partition and every downstream narrow op (regex
    shingling, 64-dim vector folds) runs on one core. At fleet scale the
    scan has thousands of row groups and this is a no-op (partitions ≥
    parallelism → returned unchanged); locally it restores the parallelism
    the scan would naturally have. Used only by the compute-heavy text /
    embedding queries — for cheap-per-row relational scans the shuffle
    wouldn't pay for itself."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)


def _dec_sum(col, scale: str = "decimal(18,2)"):
    """Exact decimal sum cast back to double — identical in Spark and
    DuckDB regardless of summation order (doubles would not be)."""
    return F.sum(F.col(col).cast(scale)).cast("double")


# =========================================================================
# CDC core (events as the change stream: event_id≈lsn, user_id≈entity)
# =========================================================================

def events_as_changes(ev: DataFrame) -> DataFrame:
    """Map the driver's events table onto the engine's change-event shape:
    lsn=event_id, key=(u<user_id>, event_id%20), 'error'→delete."""
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D")
         .when(F.col("event_type") == "click", "I")
         .otherwise("U").alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod(F.col("event_id"), F.lit(20)).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
         .otherwise(F.col("event_type")).alias("role"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
         .otherwise(F.col("props")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("timestamp"))
         .otherwise(F.col("ts")).alias("ts"),
        F.col("ts").alias("event_ts"),
    )


# One scratch table dir shared by every q_cdc_apply_full invocation: the
# returned DataFrame reads the committed files lazily, so the dir must
# outlive the call — but each new invocation (and interpreter exit) clears
# the previous one, so at most ONE copy ever exists on disk. The PID in the
# path keeps two harness processes on the same host from clobbering each
# other's live table mid-query.
_APPLY_SCRATCH = os.path.join(tempfile.gettempdir(),
                              f"rk-apply-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _APPLY_SCRATCH, True)


def q_cdc_apply_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: the ENTIRE engine path — change-event mapping, LWW
    dedup, MERGE into a fresh icelake table (atomic snapshot commits, file
    pruning, tombstones), final visible state. Oracle: the equivalent
    window-SQL over the raw events."""
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    shutil.rmtree(_APPLY_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_APPLY_SCRATCH, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev, stream_id="registry", epoch=0)
    return read_state(table)


_MOR_SCRATCH = os.path.join(tempfile.gettempdir(),
                            f"rk-mor-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _MOR_SCRATCH, True)


def q_cdc_apply_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship path in merge-on-read mode: the SAME change stream
    lands as three out-of-order delta appends (no target read, no bucket
    rewrite — O(batch) apply), and the read-time LWW resolution must
    produce the identical visible state the copy-on-write flagship and
    the window-SQL oracle produce."""
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    shutil.rmtree(_MOR_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_MOR_SCRATCH, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    for i, k in enumerate([2, 0, 1]):      # deliberately out of LSN order
        apply_batch(table, ev.filter(F.pmod(F.col("lsn"), F.lit(3)) == k),
                    stream_id="registry-mor", epoch=i, mode="mor")
    return read_state(table)


SQL_CDC_APPLY_FULL = """
WITH ch AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'click' THEN 'I' ELSE 'U' END AS op,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS role,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
         CAST(NULL AS VARCHAR) AS tool,
         CASE WHEN event_type = 'error' THEN NULL ELSE ts END AS ts
  FROM events),
w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                   ORDER BY lsn DESC) AS rn FROM ch)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM w WHERE rn = 1 AND op <> 'D'
"""


_FEED_SCRATCH = os.path.join(tempfile.gettempdir(),
                             f"rk-feed-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _FEED_SCRATCH, True)


def q_cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC OUTPUT: the row-level change feed between two snapshots (Delta
    CDF / Iceberg incremental-read analog) — the change stream is applied
    in two halves by LSN, and the feed reports exactly the keys whose
    visible value differs between snapshot 1 and snapshot 2, metadata-
    pruned to the buckets whose file sets changed. Oracle: FULL OUTER
    JOIN of the two window-SQL states."""
    from rockefeller_spark.feed import changes_between
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    cutoff = ev.agg(F.max("lsn")).collect()[0][0] // 2
    shutil.rmtree(_FEED_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_FEED_SCRATCH, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev.filter(F.col("lsn") <= cutoff),
                stream_id="feed", epoch=0)
    apply_batch(table, ev.filter(F.col("lsn") > cutoff),
                stream_id="feed", epoch=1)
    feed = changes_between(table, 1, 2)
    # ts as epoch micros: delete rows carry NULL timestamps, and a
    # nullable-timestamp column trips mixed-resolution NaT comparison
    # quirks in pandas-based comparators; int64 is unambiguous
    return feed.select("conv_id", "turn_idx", "_change", "role", "text",
                       "tool", F.unix_micros(F.col("ts")).alias("ts_us"))


SQL_CDC_CHANGE_FEED = """
WITH ch AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'click' THEN 'I' ELSE 'U' END AS op,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS role,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
         CAST(NULL AS VARCHAR) AS tool,
         CASE WHEN event_type = 'error' THEN NULL ELSE ts END AS ts
  FROM events),
cutoff AS (SELECT MAX(lsn) // 2 AS c FROM ch),
w1 AS (SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY lsn DESC) AS rn
       FROM ch, cutoff WHERE lsn <= cutoff.c),
s1 AS (SELECT conv_id, turn_idx, role, text, tool, ts
       FROM w1 WHERE rn = 1 AND op <> 'D'),
w2 AS (SELECT ch.*, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY lsn DESC) AS rn FROM ch),
s2 AS (SELECT conv_id, turn_idx, role, text, tool, ts
       FROM w2 WHERE rn = 1 AND op <> 'D')
SELECT COALESCE(s2.conv_id, s1.conv_id) AS conv_id,
       COALESCE(s2.turn_idx, s1.turn_idx) AS turn_idx,
       CASE WHEN s1.conv_id IS NULL THEN 'insert'
            WHEN s2.conv_id IS NULL THEN 'delete'
            ELSE 'update' END AS _change,
       s2.role AS role, s2.text AS text, s2.tool AS tool,
       epoch_us(s2.ts) AS ts_us
FROM s1 FULL OUTER JOIN s2
  ON s1.conv_id = s2.conv_id AND s1.turn_idx = s2.turn_idx
WHERE s1.conv_id IS NULL OR s2.conv_id IS NULL
   OR s1.role IS DISTINCT FROM s2.role
   OR s1.text IS DISTINCT FROM s2.text
   OR s1.tool IS DISTINCT FROM s2.tool
   OR s1.ts   IS DISTINCT FROM s2.ts
"""


_STATS_SCRATCH = os.path.join(tempfile.gettempdir(),
                              f"rk-stats-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _STATS_SCRATCH, True)


def q_cdc_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The METADATA surface under the oracle gate: apply the full change
    stream, then report table statistics derived ONLY from snapshot
    metadata (manifest entries + parquet-footer stats — zero data
    scanned), cross-checked IN-QUERY against a full recount from the
    data files: per-bucket row counts and max applied LSN must agree
    exactly or this raises. Oracle: the replay SQL — stored rows =
    distinct keys ever seen (the CoW table keeps tombstones as rows),
    max_lsn = the top applied LSN."""
    from rockefeller_spark.lake import bucket_expr
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    shutil.rmtree(_STATS_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_STATS_SCRATCH, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev, stream_id="stats", epoch=0)
    snap = table.current()
    meta: dict[int, tuple[int, int]] = {}
    for f in snap.files:
        r, m = meta.get(f.bucket, (0, -1))
        meta[f.bucket] = (r + f.rows,
                          max(m, f.max_lsn if f.max_lsn is not None else -1))
    actual = {
        r["b"]: (r["rows"], r["mx"])
        for r in (table.read()
                  .groupBy(bucket_expr(snap.bucket_col, snap.n_buckets)
                           .alias("b"))
                  .agg(F.count(F.lit(1)).alias("rows"),
                       F.max("_lsn").alias("mx"))
                  .collect())}
    if meta != actual:
        raise AssertionError(
            f"snapshot metadata stats diverge from the data: {meta} != {actual}")
    s = table.stats()
    return spark.createDataFrame(
        [(s["rows"], s["max_lsn"], s["n_buckets"])],
        "stored_rows bigint, max_lsn bigint, n_buckets int")


SQL_CDC_TABLE_STATS = """
WITH ch AS (SELECT event_id AS lsn,
                   'u' || CAST(user_id AS VARCHAR) AS conv_id,
                   CAST(event_id % 20 AS INTEGER) AS turn_idx
            FROM events)
SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT conv_id, turn_idx FROM ch)) AS stored_rows,
       (SELECT MAX(lsn) FROM ch) AS max_lsn,
       16 AS n_buckets
"""


_TSPRUNE_SCRATCH = os.path.join(tempfile.gettempdir(),
                                f"rk-tsprune-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _TSPRUNE_SCRATCH, True)


def q_cdc_time_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping reads (rounds 6+7): files carry per-column footer
    bounds in their manifests — dedicated event-time ``min_ts``/``max_ts``
    plus GENERALIZED per-column ``stats`` (Iceberg lower/upper bounds +
    null counts, round 7) — and bounded reads prune whole FILES before
    any scan. Two legs over two scratch layouts: (a) a time-sliced table
    read with ``read(ts_range=...)`` (the change-feed-by-timestamp
    shape); (b) a ``turn_idx``-sliced table read with
    ``read(where={"turn_idx": (5, 9)})`` — an arbitrary non-key,
    non-time column, pruned purely on the generalized stats. Both legs
    verify IN-QUERY from the physical plan: the scan's ``inputFiles()``
    must all overlap the window per their stamped bounds and be a strict
    subset of the table's files. Oracle: the same change mapping with
    the two row filters, UNION ALL, tagged by ``src``."""
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    from rockefeller_spark.cdc import winners_to_stored
    stored = winners_to_stored(ev).filter(F.col("ts").isNotNull())
    mn, mx = (stored.agg(F.min(F.unix_micros("ts")),
                         F.max(F.unix_micros("ts"))).collect()[0])
    q = [mn, mn + (mx - mn) // 4, mn + (mx - mn) // 2,
         mn + 3 * (mx - mn) // 4, mx + 1]
    shutil.rmtree(_TSPRUNE_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_TSPRUNE_SCRATCH, "t"),
                             stored.schema, n_buckets=4)
    for i in range(4):       # time-sliced appends => time-clustered files
        table.append(stored.filter(
            (F.unix_micros("ts") >= q[i]) & (F.unix_micros("ts") < q[i + 1])))
    lo, hi = q[1], q[2]      # the second quarter, closed window
    df = table.read(ts_range=(lo, hi))
    # --- in-query pruning asserts (metadata vs physical plan) ---
    snap = table.current()
    bounds = {os.path.basename(f.path): (f.min_ts, f.max_ts)
              for f in snap.files}          # file names are uuid-unique
    opened = {os.path.basename(p) for p in df.inputFiles()}
    assert opened, "time-bounded read planned no files"
    assert len(opened) < len(bounds), \
        "no file was pruned — the window should skip at least one slice"
    for p in opened:
        fmin, fmax = bounds[p]
        assert fmin is not None and fmin <= hi and fmax >= lo, \
            f"scan opened a file outside the ts window: {p}"
    # --- leg (b): generalized per-column stats pruning ------------------
    tb = LakeTable.create(spark, os.path.join(_TSPRUNE_SCRATCH, "t2"),
                          stored.schema, n_buckets=4)
    for tlo in (0, 5, 10, 15):    # turn-sliced appends => turn-clustered
        tb.append(stored.filter(F.col("turn_idx").between(tlo, tlo + 4)))
    df2 = tb.read(where={"turn_idx": (5, 9)})
    snap2 = tb.current()
    st = {os.path.basename(f.path): (f.stats or {}).get("turn_idx")
          for f in snap2.files}
    opened2 = {os.path.basename(p) for p in df2.inputFiles()}
    assert opened2, "column-bounded read planned no files"
    assert len(opened2) < len(st), \
        "no file was pruned — turn_idx bounds should skip other slices"
    for p in opened2:
        ent = st[p]
        assert ent is not None and ent[0] <= 9 and ent[1] >= 5, \
            f"scan opened a file outside the turn_idx window: {p}"

    def shape(d: DataFrame, tag: str) -> DataFrame:
        return d.select(F.lit(tag).alias("src"), "conv_id", "turn_idx",
                        "role", "text", "tool",
                        F.unix_micros("ts").alias("ts_us"),
                        F.col("_lsn").alias("lsn"))
    return shape(df, "ts").unionByName(shape(df2, "col"))


SQL_CDC_TIME_PRUNED_READ = """
WITH ch AS (
  SELECT event_id AS lsn,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         event_type AS role, props AS text,
         CAST(NULL AS VARCHAR) AS tool, epoch_us(ts) AS ts_us
  FROM events WHERE event_type <> 'error'),
b AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM ch)
SELECT 'ts' AS src, conv_id, turn_idx, role, text, tool, ts_us, lsn
FROM ch, b
WHERE ts_us >= mn + (mx - mn) // 4 AND ts_us <= mn + (mx - mn) // 2
UNION ALL
SELECT 'col' AS src, conv_id, turn_idx, role, text, tool, ts_us, lsn
FROM ch WHERE turn_idx BETWEEN 5 AND 9
"""


_WIDEN_SCRATCH = os.path.join(tempfile.gettempdir(),
                              f"rk-widen-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _WIDEN_SCRATCH, True)


def q_cdc_schema_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TYPE-WIDENING evolution under the oracle gate: the change stream
    carries an additive ``latency_ms`` column as int32; one conversation's
    events then arrive with the SAME column as int64. The second apply
    widens the stored schema in place — verified in-query: the schema
    must flip int→long, and at least one pre-widening int32 data file
    must survive un-rewritten into the post-widening snapshot (widening
    is metadata-only). The final visible state, with old int32 files read
    under the widened schema, must equal the full window-SQL replay
    computing latency as BIGINT throughout."""
    from pyspark.sql import types as T
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    lat = (F.when(F.col("op") == "D", F.lit(None).cast("int"))
           .otherwise(F.pmod(F.col("lsn"), F.lit(5000)).cast("int")))
    ev = ev.withColumn("latency_ms", lat)
    # the widened batch: exactly one conversation (one bucket), so most
    # buckets' int32 files must carry over un-rewritten
    widen_conv = ev.agg(F.min("conv_id")).collect()[0][0]
    shutil.rmtree(_WIDEN_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_WIDEN_SCRATCH, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev.filter(F.col("conv_id") != widen_conv),
                stream_id="widen", epoch=0)
    if not isinstance(table.current().schema["latency_ms"].dataType,
                      T.IntegerType):
        raise AssertionError("additive column should land as int32 first")
    files_v1 = {f.path for f in table.current().files}
    apply_batch(table,
                ev.filter(F.col("conv_id") == widen_conv)
                  .withColumn("latency_ms", F.col("latency_ms").cast("long")),
                stream_id="widen", epoch=1)
    snap = table.current()
    if not isinstance(snap.schema["latency_ms"].dataType, T.LongType):
        raise AssertionError("int64 batch should widen the stored schema")
    if not files_v1 & {f.path for f in snap.files}:
        raise AssertionError(
            "widening must be metadata-only: no pre-widening file survived")
    st = read_state(table)
    return st.select("conv_id", "turn_idx", "role", "text", "tool",
                     F.col("latency_ms").cast("long").alias("latency_ms"),
                     F.unix_micros(F.col("ts")).alias("ts_us"))


SQL_CDC_SCHEMA_WIDENING = """
WITH ch AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'click' THEN 'I' ELSE 'U' END AS op,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS role,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
         CAST(NULL AS VARCHAR) AS tool,
         CASE WHEN event_type = 'error' THEN NULL ELSE ts END AS ts,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE CAST(event_id % 5000 AS BIGINT) END AS latency_ms
  FROM events),
w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                   ORDER BY lsn DESC) AS rn FROM ch)
SELECT conv_id, turn_idx, role, text, tool, latency_ms,
       epoch_us(ts) AS ts_us
FROM w WHERE rn = 1 AND op <> 'D'
"""


_RENAME_SCRATCH = os.path.join(tempfile.gettempdir(),
                               f"rk-rename-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _RENAME_SCRATCH, True)


def q_cdc_column_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN RENAME without rewrite under the oracle gate (Iceberg
    renameColumn semantics via the name log): apply the full stream,
    rename ``role``→``speaker`` (metadata-only — asserted in-query:
    zero files rewritten), then apply one conversation's updates carrying
    the NEW name. The final state mixes pre-rename files (on-disk column
    ``role``, resolved per vintage) with post-rename files (on-disk
    ``speaker``) and must equal the window-SQL replay emitting
    ``role AS speaker`` throughout."""
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    upd_conv = ev.agg(F.min("conv_id")).collect()[0][0]
    max_lsn = ev.agg(F.max("lsn")).collect()[0][0]
    shutil.rmtree(_RENAME_SCRATCH, ignore_errors=True)
    table = LakeTable.create(spark, os.path.join(_RENAME_SCRATCH, "t"),
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev, stream_id="ren", epoch=0)
    files_v1 = {f.path for f in table.current().files}
    table.rename_column("role", "speaker")
    if {f.path for f in table.current().files} != files_v1:
        raise AssertionError("rename must not rewrite any data file")
    # post-rename wave: the SAME events of one conversation re-delivered
    # at higher LSNs under the new name (payload identical, so the oracle
    # needs no second event source — LWW picks the re-delivery)
    wave = (ev.filter(F.col("conv_id") == upd_conv)
            .withColumnRenamed("role", "speaker")
            .withColumn("lsn", F.col("lsn") + F.lit(max_lsn + 1)))
    apply_batch(table, wave, stream_id="ren", epoch=1)
    if not files_v1 & {f.path for f in table.current().files}:
        raise AssertionError("expected surviving pre-rename files")
    st = read_state(table)
    return st.select("conv_id", "turn_idx", "speaker", "text", "tool",
                     F.unix_micros(F.col("ts")).alias("ts_us"))


SQL_CDC_COLUMN_RENAME = """
WITH ch0 AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'click' THEN 'I' ELSE 'U' END AS op,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS speaker,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
         CAST(NULL AS VARCHAR) AS tool,
         CASE WHEN event_type = 'error' THEN NULL ELSE ts END AS ts
  FROM events),
mx AS (SELECT MAX(lsn) AS m FROM ch0),
uc AS (SELECT MIN(conv_id) AS c FROM ch0),
ch AS (SELECT * FROM ch0
       UNION ALL
       SELECT lsn + mx.m + 1, op, conv_id, turn_idx, speaker, text, tool, ts
       FROM ch0, mx, uc WHERE conv_id = uc.c),
w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                   ORDER BY lsn DESC) AS rn FROM ch)
SELECT conv_id, turn_idx, speaker, text, tool, epoch_us(ts) AS ts_us
FROM w WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_lsn_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC audit: missing-LSN ranges in an event log with holes punched
    in it (the at-least-once data-loss alarm). Small block width so the
    cross-block gap path is exercised at sf scale too."""
    from rockefeller_spark.feed import lsn_gaps
    ev = (_t(spark, sf_dir, "events")
          .filter(F.pmod(F.col("event_id"), F.lit(97)) >= 3)
          .select(F.col("event_id").alias("lsn")))
    return lsn_gaps(ev, block=512)


SQL_CDC_LSN_GAPS = """
WITH pres AS (SELECT DISTINCT event_id AS lsn FROM events
              WHERE event_id % 97 >= 3),
lagd AS (SELECT lsn, LAG(lsn) OVER (ORDER BY lsn) AS prev FROM pres)
SELECT prev + 1 AS gap_start, lsn - 1 AS gap_end
FROM lagd WHERE lsn - prev > 1
"""


_DML_SCRATCH = os.path.join(tempfile.gettempdir(),
                            f"rk-dml-scratch-{os.getpid()}")
atexit.register(shutil.rmtree, _DML_SCRATCH, True)


def q_cdc_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE through the apply path (tombstone events at
    HWM+1, touched-bucket rewrite only): final state after deleting every
    conversation whose id ends in '7'. Oracle: the flagship window SQL
    minus the predicate's rows."""
    from rockefeller_spark.dml import delete_where
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    scratch = os.path.join(_DML_SCRATCH, "t-del")   # own subdir: never
    shutil.rmtree(scratch, ignore_errors=True)      # clobber t-upd's table
    table = LakeTable.create(spark, scratch,
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev, stream_id="dml", epoch=0)
    delete_where(table, F.col("conv_id").endswith("7"))
    return read_state(table)


SQL_CDC_DELETE_WHERE = SQL_CDC_APPLY_FULL.rstrip() + """
  AND conv_id NOT LIKE '%7'
"""


def q_cdc_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE through the apply path (upsert events at HWM+1):
    archive the role of every late turn. Oracle: flagship state with the
    same CASE applied."""
    from rockefeller_spark.dml import update_where
    ev = events_as_changes(_t(spark, sf_dir, "events"))
    scratch = os.path.join(_DML_SCRATCH, "t-upd")
    shutil.rmtree(scratch, ignore_errors=True)
    table = LakeTable.create(spark, scratch,
                             STORED_TRANSCRIPT_SCHEMA, n_buckets=16)
    apply_batch(table, ev, stream_id="dml-upd", epoch=0)
    update_where(table, F.col("turn_idx") >= 15,
                 {"role": F.lit("archived")})
    return read_state(table)


SQL_CDC_UPDATE_WHERE = """
WITH ch AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'click' THEN 'I' ELSE 'U' END AS op,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS role,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
         CAST(NULL AS VARCHAR) AS tool,
         CASE WHEN event_type = 'error' THEN NULL ELSE ts END AS ts
  FROM events),
w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                   ORDER BY lsn DESC) AS rn FROM ch)
SELECT conv_id, turn_idx,
       CASE WHEN turn_idx >= 15 THEN 'archived' ELSE role END AS role,
       text, tool, ts
FROM w WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_lww_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both last-writer-wins reductions — the plain fused ``max_by`` and
    the two-stage SALTED variant (the hot-key defense) — in one
    oracle-gated result, each row tagged with its variant (consolidated
    round 6 to fit the driver's 50-query correctness window; the oracle
    produces both tagged copies, so each variant is still independently
    value-checked)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id",
                                            "event_type", "value")
    plain = dedupe_lww(ev, key_cols=["user_id"], order_col="event_id")
    salted = dedupe_lww_salted(ev, key_cols=["user_id"],
                               order_col="event_id", n_salts=8)

    def shape(w: DataFrame, variant: str) -> DataFrame:
        return w.select(F.lit(variant).alias("variant"), "user_id",
                        F.col("event_id").alias("last_event_id"),
                        F.col("event_type").alias("last_event_type"),
                        F.col("value").alias("last_value"))

    return shape(plain, "plain").unionByName(shape(salted, "salted"))


SQL_CDC_LWW = """
SELECT v.variant, user_id, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY event_id DESC) AS rn FROM events)
CROSS JOIN (VALUES ('plain'), ('salted')) v(variant)
WHERE rn = 1
"""


def q_cdc_high_water_marks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.max("event_id").alias("max_lsn"),
                 F.count(F.lit(1)).alias("n_events")))


SQL_CDC_HWM = """
SELECT user_id, MAX(event_id) AS max_lsn, COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def q_cdc_unapplied_after_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied-LSN prefilter shape: per-user purchase high-water mark
    (broadcast), keep only events newer than it."""
    ev = _t(spark, sf_dir, "events")
    hw = (ev.filter(F.col("event_type") == "purchase")
          .groupBy("user_id").agg(F.max("event_id").alias("max_lsn")))
    return (ev.join(F.broadcast(hw), "user_id", "left")
            .filter(F.col("max_lsn").isNull() | (F.col("event_id") > F.col("max_lsn")))
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_new")))


SQL_CDC_UNAPPLIED = """
WITH hw AS (SELECT user_id, MAX(event_id) AS max_lsn FROM events
            WHERE event_type = 'purchase' GROUP BY user_id)
SELECT e.user_id, COUNT(*) AS n_new
FROM events e LEFT JOIN hw ON e.user_id = hw.user_id
WHERE hw.max_lsn IS NULL OR e.event_id > hw.max_lsn
GROUP BY e.user_id
"""


def q_cdc_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter router over the change-event mapping: counts per
    classification reason ('valid' for clean rows)."""
    from rockefeller_spark.quarantine import classify
    ch = events_as_changes(_t(spark, sf_dir, "events"))
    # introduce synthetic corruption deterministically so every branch fires
    ch = ch.withColumn(
        "op", F.when(F.pmod(F.col("lsn"), F.lit(97)) == 0, F.lit("X"))
               .otherwise(F.col("op")))
    ch = ch.withColumn(
        "conv_id", F.when(F.pmod(F.col("lsn"), F.lit(101)) == 0,
                          F.lit(None).cast("string")).otherwise(F.col("conv_id")))
    # null-lsn corruption last so op/conv_id corruption keys off the original
    ch = ch.withColumn(
        "lsn", F.when(F.pmod(F.col("lsn"), F.lit(103)) == 0,
                      F.lit(None).cast("long")).otherwise(F.col("lsn")))
    reason = classify(ch)
    return (ch.groupBy(F.coalesce(reason, F.lit("valid")).alias("reason"))
            .agg(F.count(F.lit(1)).alias("n")))


SQL_CDC_QUARANTINE = """
WITH ch AS (
  SELECT CASE WHEN event_id % 103 = 0 THEN NULL ELSE event_id END AS lsn,
         CASE WHEN event_id % 97 = 0 THEN 'X'
              WHEN event_type = 'error' THEN 'D'
              WHEN event_type = 'click' THEN 'I' ELSE 'U' END AS op,
         CASE WHEN event_id % 101 = 0 THEN NULL
              ELSE 'u' || CAST(user_id AS VARCHAR) END AS conv_id,
         CAST(event_id % 20 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text
  FROM events),
cls AS (
  SELECT CASE WHEN lsn IS NULL THEN 'null_lsn'
              WHEN conv_id IS NULL OR turn_idx IS NULL THEN 'null_key'
              WHEN op NOT IN ('I','U','D') THEN 'bad_op'
              WHEN op <> 'D' AND text IS NULL THEN 'missing_payload'
              WHEN lsn < 0 THEN 'negative_lsn'
              ELSE 'valid' END AS reason
  FROM ch)
SELECT reason, COUNT(*) AS n FROM cls GROUP BY reason
"""


def q_cdc_verify_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rockefeller_spark.quarantine import verify_liveness
    return verify_liveness(_t(spark, sf_dir, "events"), key="user_id",
                           ts_col="ts", horizon="2024-01-15 00:00:00")


SQL_CDC_LIVENESS = """
SELECT user_id, MAX(ts) AS last_seen,
       MAX(ts) < TIMESTAMP '2024-01-15 00:00:00' AS delisted
FROM events GROUP BY user_id
"""


# =========================================================================
# Relational operators (TPC-H-ish)
# =========================================================================

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(_dec_sum("l_quantity").alias("sum_qty"),
                 _dec_sum("l_extendedprice").alias("sum_base_price"),
                 F.count(F.lit(1)).alias("count_order"))
            .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order")))


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 _dec_sum("o_totalprice").alias("total_price")))


SQL_REVENUE_BY_NATION = """
SELECT n_name AS nation, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(8,2)") - F.col("l_discount").cast("decimal(8,2)")))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(rev).cast("double").alias("revenue")))


SQL_BRAND_REVENUE = """
SELECT p_brand, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_orderpriority", "o_orderkey", "o_totalprice"))


SQL_TOPK_ORDERS = """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 3
"""


def q_building_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE c_mktsegment = 'BUILDING'
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 300000)
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts reads back as TIMESTAMP_NTZ; session tz is pinned UTC so the
    # ltz cast is exact and epoch seconds match DuckDB's epoch(ts)
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = secs - F.lag(secs).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (ev.withColumn("is_new", is_new)
            .groupBy("user_id")
            .agg(F.sum("is_new").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events)
SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dec_sum("value").alias("sum_value")))


SQL_HOURLY_ROLLUP = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select("user_id", "event_id",
                     F.count(F.lit(1)).over(w).alias("running_n"))


SQL_RUNNING_COUNT = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT)
           AS running_n
FROM events WHERE user_id < 10
"""


def q_scd_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-attribute fan-out (the reference's per-row spread of
    `ticker.info` onto every history row,
    /root/reference/scripts/collector.py:99,116-132): carry the last seen
    non-null 'purchase value' forward onto every later event of the user."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    attr = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select("user_id", "event_id",
                     F.last(attr, ignorenulls=True).over(w)
                     .alias("last_purchase_value"))


SQL_SCD_FANOUT = """
SELECT user_id, event_id,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_value
FROM events WHERE user_id < 20
"""


def q_collect_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG analog (/root/reference/scripts/collector.py:29): the
    distinct event types per user as one sorted, joined string (portable
    array representation across engines)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.array_join(F.array_sort(F.collect_set("event_type")), ",")
                 .alias("event_types")))


SQL_COLLECT_TYPES = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types
FROM events GROUP BY user_id
"""


def q_rollup_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE over (priority, status) in one oracle-gated result
    (consolidated round 6 so every registry entry fits the driver's
    50-query correctness window): both grouping-set families compute over
    the same orders table and union with a ``grouping_mode`` marker, so
    each keeps an independent value check."""
    o = _t(spark, sf_dir, "orders")

    def grouped(g, mode: str) -> DataFrame:
        return (g.agg(F.count(F.lit(1)).alias("n"),
                      _dec_sum("o_totalprice").alias("total"))
                .select(F.lit(mode).alias("grouping_mode"),
                        F.coalesce("o_orderpriority",
                                   F.lit("ALL")).alias("priority"),
                        F.coalesce("o_orderstatus",
                                   F.lit("ALL")).alias("status"),
                        "n", "total"))

    return (grouped(o.rollup("o_orderpriority", "o_orderstatus"), "rollup")
            .unionByName(
                grouped(o.cube("o_orderpriority", "o_orderstatus"), "cube")))


SQL_ROLLUP_CUBE_ORDERS = """
SELECT 'rollup' AS grouping_mode,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
UNION ALL
SELECT 'cube' AS grouping_mode,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable pivot via conditional aggregation (identical SQL shape)."""
    ev = _t(spark, sf_dir, "events")
    aggs = [F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in ["click", "view", "purchase", "signup", "error"]]
    return ev.groupBy("user_id").agg(*aggs)


SQL_PIVOT_COUNTS = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
FROM events GROUP BY user_id
"""


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function battery (the P2/P3 cast & null-safe layer of the
    reference, /root/reference/scripts/collector.py:104-133): string, date,
    math, conditional — one row per event, every expression mirrored in
    the oracle."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.substring("props", 1, 5).alias("props_head"),
        F.length("props").alias("props_len"),
        F.regexp_replace("props", "[0-9]+", "#").alias("props_masked"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("UNK"))
         .alias("etype_or_unk"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour_str"),
        F.dayofweek("ts").alias("dow"),
        F.round(F.sqrt(F.col("value")), 6).alias("sqrt_value"),
        F.abs(F.col("value") - 100).cast("double").alias("abs_centered"),
        F.when(F.col("value") > 100, "high").otherwise("low").alias("band"),
    )


SQL_SCALAR_FUNCTIONS = """
SELECT event_id,
       upper(event_type) AS etype_upper,
       substr(props, 1, 5) AS props_head,
       CAST(len(props) AS INTEGER) AS props_len,
       regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
       COALESCE(NULLIF(event_type, 'error'), 'UNK') AS etype_or_unk,
       strftime(ts, '%Y-%m-%d %H') AS hour_str,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       ROUND(sqrt(value), 6) AS sqrt_value,
       abs(value - 100) AS abs_centered,
       CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS band
FROM events WHERE user_id < 5
"""


def q_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution aggregates (the OLAP percentile family): p25 /
    median / p90 of value per event type, linear interpolation — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the definition, so
    the oracle checks values exactly. At scale this is one hash
    aggregation; swap in approx_percentile (t-digest) when a sketch
    suffices — semantics then diverge by engine, which is why the checked
    entry uses the exact form."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
                 F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
                 F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
                 F.count(F.lit(1)).alias("n")))


SQL_EVENT_QUANTILES = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 6) AS p25,
       ROUND(quantile_cont(value, 0.50), 6) AS p50,
       ROUND(quantile_cont(value, 0.90), 6) AS p90,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_moving_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding window (event-time, not row-count): per user,
    the decimal-exact sum of value over the trailing hour. The range
    frame is the shape rows-frames can't express (irregular event
    spacing); partitions are per-user so no global sort task."""
    ev = _t(spark, sf_dir, "events")
    # MICROSECOND-precision frame key on both engines (unix_micros here,
    # epoch_us in the oracle): a whole-second key would silently widen the
    # frame boundary for sub-second timestamps even though the fixture
    # happens to emit whole seconds
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts").cast("timestamp_ltz")))
         .rangeBetween(-3_600_000_000, 0))
    return (ev.select("user_id", "event_id",
                      F.sum(F.col("value").cast("decimal(18,2)")).over(w)
                      .cast("double").alias("mov_sum_1h")))


SQL_MOVING_VALUE_SUM = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS mov_sum_1h
FROM events
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join in the SKEW-SAFE chunked shape (per-(key,
    time-chunk) carry-forward + tiny per-key boundary window — a hot key
    spreads over its chunks; the single-window default is property-tested
    equal in test_joins). Every event gets the value of the user's most
    recent purchase at or before it. Oracle: DuckDB's native ASOF LEFT
    JOIN."""
    from rockefeller_spark.joins import asof_join
    ev = _t(spark, sf_dir, "events")
    left = ev.select("user_id", "event_id", "ts")
    right = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts", "value"))
    out = asof_join(left, right, on=["user_id"], value_cols=["value"],
                    chunk_sec=6 * 3600)
    return out.select("user_id", "event_id",
                      F.col("value_asof").alias("last_purchase_value"))


SQL_ASOF_JOIN = """
WITH p AS (SELECT user_id, ts, MAX(value) AS value
           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT e.user_id, e.event_id, p.value AS last_purchase_value
FROM events e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join via bucketing (equi join on (key, bucket±1), exact
    predicate inside — constant 3x replication instead of a non-equi
    blowup): for each purchase, how many events of the same user fall
    within ±30 minutes. Timestamps truncate to whole seconds on both
    engines so the boundary predicate agrees bit-for-bit."""
    from rockefeller_spark.joins import time_range_join
    ev = _t(spark, sf_dir, "events")
    left = (ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("purchase_id"), "ts"))
    right = ev.select("user_id", "ts", "event_id")
    out = time_range_join(left, right, on=["user_id"], window_sec=1800)
    return (out.groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n_nearby")))


SQL_RANGE_JOIN = """
SELECT p.event_id AS purchase_id, COUNT(*) AS n_nearby
FROM events p JOIN events e
  ON p.user_id = e.user_id
 AND abs(CAST(floor(epoch(e.ts)) AS BIGINT)
         - CAST(floor(epoch(p.ts)) AS BIGINT)) <= 1800
WHERE p.event_type = 'purchase'
GROUP BY 1
"""


def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: two overlapping slices, unionByName + distinct (the
    reference's retry-list extend, /root/reference/scripts/collector.py:199-201)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 400).select("event_id", "user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id")
    return a.unionByName(b).distinct()


SQL_UNION_DEDUP = """
SELECT DISTINCT event_id, user_id FROM (
  SELECT event_id, user_id FROM events WHERE value > 400
  UNION ALL
  SELECT event_id, user_id FROM events WHERE event_type = 'purchase')
"""


def q_normalized_colnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 column normalization: ugly upstream names → snake_case, then a
    normal aggregate over the renamed frame."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("Return Flag!"),
        F.col("l_quantity").alias("  Quantity (units) "))
    norm = normalize_columns(li)  # -> return_flag, quantity_units
    return (norm.groupBy("return_flag")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dec_sum("quantity_units").alias("total_units")))


SQL_NORMALIZED = """
SELECT l_returnflag AS return_flag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_units
FROM lineitem GROUP BY 1
"""


# =========================================================================
# Text / training-data pipeline (documents)
# =========================================================================

_CANON_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(_spread(_t(spark, sf_dir, "documents")))


SQL_DOC_EXACT_DEDUP = f"""
SELECT md5({_CANON_SQL}) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    return d.select("doc_id",
                    X.token_count("text").alias("n_tokens"),
                    X.bpe_ish_token_count("text").alias("n_subword_tokens"),
                    F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
                    X.fingerprint("text").alias("fp"))


SQL_DOC_TOKENS = f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
       CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                            x -> x <> ''))
            + len(regexp_replace(text, '[A-Za-z]+|[0-9]+|\\s+', '', 'g'))
            AS INTEGER) AS n_subword_tokens,
       ROUND(CAST(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / greatest(len(text), 1), 6) AS punct_ratio,
       md5({_CANON_SQL}) AS fp
FROM documents
"""


_SW_SQL = {
    "en": "['the','and','of','to','a','in','is','it','that','for']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','auf','zu']",
    "fr": "['le','la','les','et','est','un','une','des','que','pour']",
    "es": "['el','la','los','las','y','es','un','una','que','por']",
}
_TOKS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"


def _sw_hits_sql(lang: str) -> str:
    return (f"len(list_filter({_TOKS_SQL}, "
            f"x -> list_contains({_SW_SQL[lang]}, x)))")


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    return d.select("doc_id", "lang",
                    X.lang_id("text").alias("lang_pred"))


SQL_DOC_LANG_ID = f"""
SELECT doc_id, lang,
  CASE WHEN greatest({_sw_hits_sql('de')}, {_sw_hits_sql('en')},
                     {_sw_hits_sql('es')}, {_sw_hits_sql('fr')}) = 0 THEN 'und'
       WHEN {_sw_hits_sql('de')} = greatest({_sw_hits_sql('de')}, {_sw_hits_sql('en')},
                     {_sw_hits_sql('es')}, {_sw_hits_sql('fr')}) THEN 'de'
       WHEN {_sw_hits_sql('en')} = greatest({_sw_hits_sql('de')}, {_sw_hits_sql('en')},
                     {_sw_hits_sql('es')}, {_sw_hits_sql('fr')}) THEN 'en'
       WHEN {_sw_hits_sql('es')} = greatest({_sw_hits_sql('de')}, {_sw_hits_sql('en')},
                     {_sw_hits_sql('es')}, {_sw_hits_sql('fr')}) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM documents
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(_t(spark, sf_dir, "documents"))
    return d.select("doc_id",
                    F.round(X.stopword_ratio("text"), 6).alias("stopword_ratio"),
                    X.quality_score("text").alias("quality"))


SQL_DOC_QUALITY = f"""
WITH s AS (
  SELECT doc_id,
         CAST({_sw_hits_sql('en')} AS DOUBLE)
           / greatest(len({_TOKS_SQL}), 1) AS swr,
         CAST(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
           / greatest(len(text), 1) AS pr,
         CASE WHEN len(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.3 END AS lok
  FROM documents)
SELECT doc_id, ROUND(swr, 6) AS stopword_ratio,
       ROUND(0.4 * lok + 0.4 * least(swr * 4.0, 1.0)
             + 0.2 * (1.0 - least(pr * 5.0, 1.0)), 6) AS quality
FROM s
"""


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(_spread(_t(spark, sf_dir, "documents")),
                                 k=3, threshold=0.2)


SQL_DOC_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array({_CANON_SQL}, ' ') AS t FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         md5(CASE WHEN len(t) >= 3
                  THEN array_to_string(t[i:i+2], ' ')
                  ELSE array_to_string(t, ' ') END) AS h
  FROM toks,
       UNNEST(range(1, CASE WHEN len(t) >= 3 THEN len(t) - 1 ELSE 2 END)) AS u(i)),
-- degenerate-posting-list cap: same max_df the Spark operator defaults to
sh AS (
  SELECT * FROM sh0 WHERE h NOT IN (
    SELECT h FROM sh0 GROUP BY h HAVING COUNT(*) > {D.DEFAULT_MAX_GROUP})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
FROM common JOIN sizes na ON na.doc_id = id_a
            JOIN sizes nb ON nb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.2
"""


def q_doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: pairwise Jaccard hits grouped into connected
    components by iterative min-label propagation (the keep/drop decision
    layer on top of pairwise dedup). Oracle: the same pairs closed under
    a recursive transitive-closure CTE."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.2)
    return D.dedup_clusters(docs, pairs)


SQL_DOC_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
toksj AS (
  SELECT doc_id, regexp_split_to_array({_CANON_SQL}, ' ') AS t FROM documents),
shj0 AS (
  SELECT DISTINCT doc_id,
         md5(CASE WHEN len(t) >= 3
                  THEN array_to_string(t[i:i+2], ' ')
                  ELSE array_to_string(t, ' ') END) AS h
  FROM toksj,
       UNNEST(range(1, CASE WHEN len(t) >= 3 THEN len(t) - 1 ELSE 2 END)) AS u(i)),
shj AS (
  SELECT * FROM shj0 WHERE h NOT IN (
    SELECT h FROM shj0 GROUP BY h HAVING COUNT(*) > {D.DEFAULT_MAX_GROUP})),
sizesj AS (SELECT doc_id, COUNT(*) AS n FROM shj GROUP BY doc_id),
commonj AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM shj a JOIN shj b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b
  FROM commonj JOIN sizesj na ON na.doc_id = id_a
               JOIN sizesj nb ON nb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.2),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
seed AS (SELECT doc_id AS a, doc_id AS b FROM documents
         UNION SELECT a, b FROM edges),
reach(a, b) AS (
  SELECT a, b FROM seed
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
"""


def q_doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH in portable-hash mode: the DuckDB oracle reproduces the
    EXACT sketch (same md5-derived permutations, same band buckets), so
    the full pipeline — signatures → banding → candidate join → estimated
    Jaccard — is value-checked end-to-end, not just row-counted."""
    return D.minhash_dedup_pairs(_spread(_t(spark, sf_dir, "documents")),
                                 n_hashes=32, n_bands=8, threshold=0.5,
                                 portable=True)


def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs in portable-hash mode (oracle-reproducible)."""
    return D.simhash_near_pairs(_spread(_t(spark, sf_dir, "documents")), max_hamming=3,
                                portable=True)


def _md5long_sql(expr: str, salt) -> str:
    """DuckDB twin of dedup._md5_long: 60-bit positive int from md5."""
    return f"(('0x' || substr(md5({expr} || '#{salt}'), 1, 15))::BIGINT)"


# Raw distinct k=3 word shingles — same construction the (value-verified)
# jaccard oracle uses, keeping the shingle string instead of hashing it.
_SHINGLES_SQL = f"""
toks AS (
  SELECT doc_id, regexp_split_to_array({_CANON_SQL}, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(t) >= 3
              THEN array_to_string(t[i:i+2], ' ')
              ELSE array_to_string(t, ' ') END AS s
  FROM toks,
       UNNEST(range(1, CASE WHEN len(t) >= 3 THEN len(t) - 1 ELSE 2 END)) AS u(i))
"""

# The exact portable MinHash pipeline: md5 base hash per shingle → 32
# universal-hash permutation minima (same literal (a,b) constants the
# Spark plan bakes) → 8 bands of 4 → md5 band buckets → candidate pairs →
# estimated Jaccard ≥ 0.5.
_MINHASH_MINS = ",\n".join(
    f"    MIN(({a} * h + {b}) % {D.MERSENNE31}) AS m{i}"
    for i, (a, b) in enumerate(D.minhash_perm_constants(32)))
_MINHASH_SIG = "[" + ", ".join(f"m{i}" for i in range(32)) + "]"

SQL_DOC_MINHASH_PAIRS = f"""
WITH {_SHINGLES_SQL},
hh AS (
  SELECT doc_id,
         (('0x' || substr(md5(s || '#0'), 1, 15))::BIGINT) % {D.MERSENNE31} AS h
  FROM sh),
mins AS (
  SELECT doc_id,
{_MINHASH_MINS}
  FROM hh GROUP BY doc_id),
sig AS (SELECT doc_id, {_MINHASH_SIG} AS sig FROM mins),
mh AS (SELECT doc_id, i, sig[CAST(i AS INTEGER)] AS m
       FROM sig, UNNEST(range(1, 33)) AS u2(i)),
bands0 AS (
  SELECT doc_id, bi,
         md5(array_to_string(sig[bi*4+1 : bi*4+4], ',')) AS bucket
  FROM sig, UNNEST(range(0, 8)) AS u3(bi)),
-- degenerate-band-bucket cap: same max_bucket the Spark operator defaults to
heavyb AS (SELECT bi, bucket FROM bands0 GROUP BY bi, bucket
           HAVING COUNT(*) > {D.DEFAULT_MAX_GROUP}),
bands AS (
  SELECT b0.* FROM bands0 b0 ANTI JOIN heavyb h USING (bi, bucket)),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
est AS (
  SELECT c.id_a, c.id_b,
         ROUND(SUM(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / 32.0, 6)
           AS est_jaccard
  FROM cands c
  JOIN mh ma ON ma.doc_id = c.id_a
  JOIN mh mb ON mb.doc_id = c.id_b AND mb.i = ma.i
  GROUP BY 1, 2)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
"""

def q_doc_lev_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance VERIFY tier on LSH candidates — the tiered shape
    every scale dedup pipeline uses: cheap banded candidate generation
    (never all-pairs), expensive exact scoring (levenshtein is O(len²)
    per pair) only on survivors. Oracle: the identical portable MinHash
    banding + DuckDB's levenshtein (same classic edit distance)."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = D.minhash_dedup_pairs(docs, n_hashes=32, n_bands=8,
                                  threshold=0.5, portable=True)
    ta = docs.select(F.col("doc_id").alias("id_a"),
                     F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"),
                     F.col("text").alias("_tb"))
    return (pairs.join(ta, "id_a").join(tb, "id_b")
            .select("id_a", "id_b",
                    F.levenshtein("_ta", "_tb").alias("edit_distance")))


# same CTE pipeline as the minhash oracle, with a levenshtein verify leaf
SQL_DOC_LEV_VERIFY = SQL_DOC_MINHASH_PAIRS.replace(
    "SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5",
    """, pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5)
SELECT p.id_a, p.id_b, levenshtein(a.text, b.text) AS edit_distance
FROM pairs p JOIN documents a ON a.doc_id = p.id_a
             JOIN documents b ON b.doc_id = p.id_b""")
assert "levenshtein" in SQL_DOC_LEV_VERIFY


_SIMHASH_BIT_SUMS = ",\n".join(
    f"    SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(60))
_SIMHASH_VALUE = " + ".join(
    f"CASE WHEN b{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END"
    for b in range(60))

# The exact portable SimHash pipeline: md5 token hash → 60 sign-sums →
# 4×15-bit pigeonhole bands → Hamming ≤ 3 pairs.
SQL_DOC_SIMHASH_PAIRS = f"""
WITH tok AS (
  SELECT doc_id, {_md5long_sql('t', 0)} AS h
  FROM (SELECT doc_id,
               UNNEST(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
        FROM documents)),
bits AS (
  SELECT doc_id,
{_SIMHASH_BIT_SUMS}
  FROM tok GROUP BY doc_id),
sim AS (SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM bits),
banded0 AS (
  SELECT doc_id, simhash, i AS band, (simhash >> (15 * i)) & 32767 AS chunk
  FROM sim, UNNEST(range(0, 4)) AS u(i)),
heavyc AS (SELECT band, chunk FROM banded0 GROUP BY band, chunk
           HAVING COUNT(*) > {D.DEFAULT_MAX_GROUP}),
banded AS (
  SELECT b0.* FROM banded0 b0 ANTI JOIN heavyc h USING (band, chunk))
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# =========================================================================
# Similarity search (embeddings)
# =========================================================================

def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _t(spark, sf_dir, "embeddings")
    # corpus side spread for the per-row vector math; the one-row query
    # lookup reads the raw scan (no repartition for a single row)
    return V.cosine_topk(_spread(raw), query_id=0, k=10, query_df=raw)


SQL_EMB_COSINE_TOPK = """
WITH q AS (SELECT unnest(embedding) AS y, generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id = 0),
v AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id <> 0),
dots AS (
  SELECT vec_id,
         SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
         SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nx,
         SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS ny
  FROM v JOIN q USING (i) GROUP BY vec_id)
SELECT vec_id AS neighbor_id,
       ROUND(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine_sim
FROM dots ORDER BY cosine_sim DESC, neighbor_id LIMIT 10
"""


def q_emb_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spread(_t(spark, sf_dir, "embeddings"))
    cents = (e.filter(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    out = V.assign_centroids(e, cents)
    return out.select("vec_id", "centroid_id")


SQL_EMB_CENTROID_ASSIGN = """
WITH c AS (SELECT vec_id AS centroid_id, unnest(embedding) AS y,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS i FROM embeddings),
sims AS (
  SELECT v.vec_id, c.centroid_id,
         SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
           / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
              * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS sim
  FROM v JOIN c USING (i) GROUP BY 1, 2),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, centroid_id) AS rn
           FROM sims)
SELECT vec_id, centroid_id FROM ranked WHERE rn = 1
"""


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF in its real usage shape: the cell assignment is BUILT ONCE
    (persisted — the single-session stand-in for a stored index table
    partitioned by centroid_id) and searched; query cost is one broadcast
    probe-list semi-join + a pruned top-k."""
    raw = _t(spark, sf_dir, "embeddings")
    # centroids from the raw scan (8 rows — spreading it would add a
    # query-time repartition to a broadcast-build side for nothing)
    cents = (raw.filter(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    index = V.ivf_build(_spread(raw), cents).persist()
    return V.ivf_topk(index, cents, query_id=0, k=10, n_probe=3)


SQL_EMB_IVF_TOPK = """
WITH c AS (SELECT vec_id AS centroid_id, unnest(embedding) AS y,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS i FROM embeddings),
sims AS (
  SELECT v.vec_id, c.centroid_id,
         SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
           / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
              * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS sim
  FROM v JOIN c USING (i) GROUP BY 1, 2),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, centroid_id) AS rn
           FROM sims),
assigned AS (SELECT vec_id, centroid_id FROM ranked WHERE rn = 1),
qprobe AS (SELECT centroid_id FROM ranked WHERE vec_id = 0 AND rn <= 3),
cand AS (SELECT a.vec_id FROM assigned a
         WHERE a.centroid_id IN (SELECT centroid_id FROM qprobe)
           AND a.vec_id <> 0),
q AS (SELECT unnest(embedding) AS qy, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0),
dots AS (
  SELECT v.vec_id,
         SUM(CAST(v.x AS DOUBLE) * CAST(q.qy AS DOUBLE)) AS dot,
         SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS nx,
         SUM(CAST(q.qy AS DOUBLE) * CAST(q.qy AS DOUBLE)) AS ny
  FROM v JOIN q USING (i)
  WHERE v.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY v.vec_id)
SELECT vec_id AS neighbor_id,
       ROUND(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine_sim
FROM dots ORDER BY cosine_sim DESC, neighbor_id LIMIT 10
"""


_EMB_DIM = 64  # the driver's embeddings.parquet vector width

def q_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.lsh_topk(_spread(_t(spark, sf_dir, "embeddings")), query_id=0,
                      dim=_EMB_DIM, k=10, n_planes=16, max_hamming=6)


# The identical hyperplane sign table (driver-side constants) embedded as
# literal VALUES rows — both engines compute the same sketch.
_PLANES_VALUES = ",".join(
    f"({p},{j + 1},{int(s)})"
    for p, row in enumerate(V.hyperplane_signs(_EMB_DIM, 16, 7))
    for j, s in enumerate(row))

SQL_EMB_LSH_TOPK = f"""
WITH planes(p, i, s) AS (VALUES {_PLANES_VALUES}),
v AS (SELECT vec_id, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS i FROM embeddings),
pd AS (SELECT v.vec_id, planes.p, SUM(CAST(v.x AS DOUBLE) * planes.s) AS d
       FROM v JOIN planes USING (i) GROUP BY v.vec_id, planes.p),
sb AS (SELECT vec_id,
              CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << p)
                            ELSE 0::BIGINT END) AS BIGINT) AS signbits
       FROM pd GROUP BY vec_id),
qs AS (SELECT signbits AS qsig FROM sb WHERE vec_id = 0),
cand AS (SELECT sb.vec_id FROM sb, qs
         WHERE bit_count(xor(sb.signbits, qs.qsig)) <= 6 AND sb.vec_id <> 0),
q AS (SELECT unnest(embedding) AS qy, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0),
dots AS (
  SELECT v.vec_id,
         SUM(CAST(v.x AS DOUBLE) * CAST(q.qy AS DOUBLE)) AS dot,
         SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS nx,
         SUM(CAST(q.qy AS DOUBLE) * CAST(q.qy AS DOUBLE)) AS ny
  FROM v JOIN q USING (i)
  WHERE v.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY v.vec_id)
SELECT vec_id AS neighbor_id,
       ROUND(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine_sim
FROM dots ORDER BY cosine_sim DESC, neighbor_id LIMIT 10
"""


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection (the vector member of the dedup
    family). The driver's embeddings are random (max pairwise cosine 0.51),
    so the corpus is augmented with DETERMINISTIC perturbed copies of the
    first 50 vectors (id+10000, component i scaled by 1+0.002·((i%7)−3) —
    an expression both engines evaluate bit-identically): the operator must
    recover exactly those 50 planted pairs through LSH banding + exact
    cosine verify, and the oracle checks the full pipeline by value."""
    raw = (_t(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    pert = raw.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding",
                    lambda x, i: x * (F.lit(1.0) + F.lit(0.002)
                                      * (((i + 1) % 7) - 3)))
        .alias("embedding"))
    corpus = _spread(raw.unionByName(pert))
    return V.embedding_near_dup_pairs(corpus, dim=_EMB_DIM, threshold=0.98,
                                      n_planes=16, seed=7, max_hamming=3)


SQL_EMB_NEAR_DUP = f"""
WITH planes(p, i, s) AS (VALUES {_PLANES_VALUES}),
v0 AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
              generate_subscripts(embedding, 1) AS i FROM embeddings),
corp AS (SELECT vec_id, x, i FROM v0
         UNION ALL
         SELECT vec_id + 10000, x * (1 + 0.002 * ((i % 7) - 3)), i
         FROM v0 WHERE vec_id < 50),
pd AS (SELECT corp.vec_id, planes.p, SUM(corp.x * planes.s) AS d
       FROM corp JOIN planes USING (i) GROUP BY corp.vec_id, planes.p),
sb AS (SELECT vec_id,
              CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << p)
                            ELSE 0::BIGINT END) AS BIGINT) AS signbits
       FROM pd GROUP BY vec_id),
banded0 AS (SELECT vec_id, signbits, b AS band,
                   (signbits >> (4 * b)) & 15 AS chunk
            FROM sb, UNNEST(range(0, 4)) AS u(b)),
heavyc AS (SELECT band, chunk FROM banded0 GROUP BY band, chunk
           HAVING COUNT(*) > 1000),
banded AS (
  SELECT b0.* FROM banded0 b0 ANTI JOIN heavyc h USING (band, chunk)),
cands AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.chunk = b.chunk AND a.vec_id < b.vec_id
          WHERE bit_count(xor(a.signbits, b.signbits)) <= 3),
pc AS (SELECT c.id_a, c.id_b,
              ROUND(SUM(va.x * vb.x)
                    / (sqrt(SUM(va.x * va.x)) * sqrt(SUM(vb.x * vb.x))), 6)
                AS cosine_sim
       FROM cands c JOIN corp va ON va.vec_id = c.id_a
                    JOIN corp vb ON vb.vec_id = c.id_b AND vb.i = va.i
       GROUP BY 1, 2)
SELECT id_a, id_b, cosine_sim FROM pc WHERE cosine_sim >= 0.98
"""


# =========================================================================
# Multimodal (deterministic generated media; decode is stubbed — see
# rockefeller_spark/multimodal.py)
# =========================================================================

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the REAL Arrow mapInPandas plumbing (payload bytes cross
    into Python in bounded batches; n_bytes measured from the decoded
    buffer) — while the oracle regenerates the same metadata arithmetic
    from range(n), since gen_media is a pure md5 function of media_id.
    Each row additionally carries its kind/codec ROLLUP aggregates
    (``media_summary``, a metadata-only groupBy that never reads the
    payload column — broadcast-joined back per row), folding the former
    ``media_rollup`` entry's value check into this one (round-6 window
    consolidation)."""
    from rockefeller_spark import multimodal as M
    media = M.gen_media(spark, n=200, seed=7)
    feats = (M.extract_features(media)
             .select("media_id", "kind", "n_bytes"))
    summ = M.media_summary(media).withColumnRenamed("n", "kind_n")
    return (feats.join(F.broadcast(summ.drop("codec")), "kind")
            .select("media_id", "kind", "n_bytes", "kind_n",
                    "avg_duration_ms", "max_width"))


def _media_h_sql(k: int, seed: int = 7) -> str:
    """DuckDB twin of gen_media's field hash: md5 of 'id:seed:k'."""
    return ("(('0x' || substr(md5(CAST(media_id AS VARCHAR) || "
            f"':{seed}:{k}'), 1, 15))::BIGINT)")


SQL_MEDIA_FEATURES = f"""
WITH r AS (SELECT range AS media_id FROM range(200)),
m AS (
  SELECT media_id,
         CASE {_media_h_sql(0)} % 3 WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(({_media_h_sql(1)} % 8 + 1) * 1024 AS INTEGER) AS n_bytes,
         CAST({_media_h_sql(2)} % 8 * 160 + 320 AS INTEGER) AS width0,
         CAST({_media_h_sql(4)} % 120000 + 500 AS INTEGER) AS duration0
  FROM r),
t AS (
  SELECT media_id, kind, n_bytes,
         CASE WHEN kind IN ('image', 'video') THEN width0 END AS width,
         CASE WHEN kind <> 'image' THEN duration0 END AS duration_ms
  FROM m)
SELECT media_id, kind, n_bytes,
       COUNT(*) OVER (PARTITION BY kind) AS kind_n,
       ROUND(AVG(duration_ms) OVER (PARTITION BY kind), 6) AS avg_duration_ms,
       MAX(width) OVER (PARTITION BY kind) AS max_width
FROM t
"""


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the REAL Arrow mapInPandas pipeline —
    the payload bytes cross into Python, get sliced per frame index, and
    come back as binary. Value-checked end-to-end: the oracle rebuilds the
    md5-keystream payload from range(n) and compares per-frame md5 + size,
    so a wrong slice boundary or batch handling bug fails the hash."""
    from rockefeller_spark import multimodal as M
    media = M.gen_media(spark, n=200, seed=7)
    frames = M.sample_frames(media, every_ms=10_000)
    return frames.select("media_id", "frame_idx",
                         F.md5("frame").alias("frame_md5"),
                         F.octet_length("frame").alias("frame_bytes"))


SQL_MEDIA_FRAMES = f"""
WITH r AS (SELECT range AS media_id FROM range(200)),
v AS (
  SELECT media_id,
         substr(repeat(md5(CAST(media_id AS VARCHAR)), 512), 1,
                CAST(({_media_h_sql(1)} % 8 + 1) * 1024 AS INTEGER)) AS payload,
         greatest(CAST(({_media_h_sql(4)} % 120000 + 500) AS BIGINT) // 10000,
                  1) AS n_frames
  FROM r
  WHERE {_media_h_sql(0)} % 3 = 2),
f AS (
  SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
         substr(payload,
                CAST(i * greatest(len(payload) // n_frames, 1) AS INTEGER) + 1,
                64) AS frame
  FROM v, UNNEST(range(0, n_frames)) AS u(i))
SELECT media_id, frame_idx, md5(frame) AS frame_md5,
       CAST(len(frame) AS INTEGER) AS frame_bytes
FROM f
"""


# (media_summary's rollup is oracle-gated INSIDE q_media_features since
# round 6 — kind-level aggregates joined back per row — so the registry
# fits the driver's 50-query correctness window with no silent rotation.)


# =========================================================================
# Registry
# =========================================================================

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # CDC core
    "cdc_apply_full": q_cdc_apply_full,
    "cdc_apply_mor": q_cdc_apply_mor,
    "cdc_lww_latest": q_cdc_lww_latest,        # plain + salted variants
    "cdc_high_water_marks": q_cdc_high_water_marks,
    "cdc_unapplied_after_hwm": q_cdc_unapplied_after_hwm,
    "cdc_quarantine_split": q_cdc_quarantine_split,
    "cdc_verify_liveness": q_cdc_verify_liveness,
    # relational
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "brand_revenue": q_brand_revenue,
    "topk_orders_per_priority": q_topk_orders_per_priority,
    "building_customers_without_orders": q_building_customers_without_orders,
    "sessionize": q_sessionize,
    "hourly_rollup": q_hourly_rollup,
    "running_count": q_running_count,
    "normalized_colnames": q_normalized_colnames,
    "scd_fanout": q_scd_fanout,
    "collect_event_types": q_collect_event_types,
    "rollup_cube_orders": q_rollup_cube_orders,
    "pivot_event_counts": q_pivot_event_counts,
    "scalar_functions": q_scalar_functions,
    "union_dedup": q_union_dedup,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "event_quantiles": q_event_quantiles,
    "moving_value_sum": q_moving_value_sum,
    # CDC output surface + predicate DML + metadata surface
    "cdc_change_feed": q_cdc_change_feed,
    "cdc_lsn_gaps": q_cdc_lsn_gaps,
    "cdc_table_stats": q_cdc_table_stats,
    "cdc_time_pruned_read": q_cdc_time_pruned_read,
    "cdc_schema_widening": q_cdc_schema_widening,
    "cdc_column_rename": q_cdc_column_rename,
    "cdc_delete_where": q_cdc_delete_where,
    "cdc_update_where": q_cdc_update_where,
    # text pipeline
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_tokens": q_doc_tokens,
    "doc_lang_id": q_doc_lang_id,
    "doc_quality": q_doc_quality,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_minhash_pairs": q_doc_minhash_pairs,
    "doc_simhash_pairs": q_doc_simhash_pairs,
    "doc_lev_verify": q_doc_lev_verify,
    # similarity search
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_centroid_assign": q_emb_centroid_assign,
    "emb_ivf_topk": q_emb_ivf_topk,
    "emb_lsh_topk": q_emb_lsh_topk,
    "emb_near_dup": q_emb_near_dup,
    # multimodal (stubbed decode; plumbing real)
    "media_features": q_media_features,       # features + kind rollup
    "media_frames": q_media_frames,
}

ORACLES: dict[str, str] = {
    "cdc_apply_full": SQL_CDC_APPLY_FULL,
    "cdc_apply_mor": SQL_CDC_APPLY_FULL,
    "cdc_lww_latest": SQL_CDC_LWW,
    "cdc_high_water_marks": SQL_CDC_HWM,
    "cdc_unapplied_after_hwm": SQL_CDC_UNAPPLIED,
    "cdc_quarantine_split": SQL_CDC_QUARANTINE,
    "cdc_verify_liveness": SQL_CDC_LIVENESS,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "brand_revenue": SQL_BRAND_REVENUE,
    "topk_orders_per_priority": SQL_TOPK_ORDERS,
    "building_customers_without_orders": SQL_ANTI_JOIN,
    "sessionize": SQL_SESSIONIZE,
    "hourly_rollup": SQL_HOURLY_ROLLUP,
    "running_count": SQL_RUNNING_COUNT,
    "normalized_colnames": SQL_NORMALIZED,
    "scd_fanout": SQL_SCD_FANOUT,
    "collect_event_types": SQL_COLLECT_TYPES,
    "rollup_cube_orders": SQL_ROLLUP_CUBE_ORDERS,
    "pivot_event_counts": SQL_PIVOT_COUNTS,
    "scalar_functions": SQL_SCALAR_FUNCTIONS,
    "union_dedup": SQL_UNION_DEDUP,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "event_quantiles": SQL_EVENT_QUANTILES,
    "moving_value_sum": SQL_MOVING_VALUE_SUM,
    "cdc_change_feed": SQL_CDC_CHANGE_FEED,
    "cdc_lsn_gaps": SQL_CDC_LSN_GAPS,
    "cdc_table_stats": SQL_CDC_TABLE_STATS,
    "cdc_time_pruned_read": SQL_CDC_TIME_PRUNED_READ,
    "cdc_schema_widening": SQL_CDC_SCHEMA_WIDENING,
    "cdc_column_rename": SQL_CDC_COLUMN_RENAME,
    "cdc_delete_where": SQL_CDC_DELETE_WHERE,
    "cdc_update_where": SQL_CDC_UPDATE_WHERE,
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_tokens": SQL_DOC_TOKENS,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_ngram_jaccard": SQL_DOC_NGRAM_JACCARD,
    "doc_dedup_clusters": SQL_DOC_DEDUP_CLUSTERS,
    "doc_minhash_pairs": SQL_DOC_MINHASH_PAIRS,
    "doc_simhash_pairs": SQL_DOC_SIMHASH_PAIRS,
    "doc_lev_verify": SQL_DOC_LEV_VERIFY,
    "emb_cosine_topk": SQL_EMB_COSINE_TOPK,
    "emb_centroid_assign": SQL_EMB_CENTROID_ASSIGN,
    "emb_ivf_topk": SQL_EMB_IVF_TOPK,
    "emb_lsh_topk": SQL_EMB_LSH_TOPK,
    "emb_near_dup": SQL_EMB_NEAR_DUP,
    "media_features": SQL_MEDIA_FEATURES,
    "media_frames": SQL_MEDIA_FRAMES,
}
