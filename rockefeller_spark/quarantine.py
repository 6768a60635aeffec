"""Dead-letter routing + liveness verification.

Two control-plane operators re-expressed from the reference:

- **validate_events / split_quarantine** — the error-classification router
  (``/root/reference/scripts/collector.py:143-153``: parse the failure,
  route to retry-1y / retry-5d / drop) becomes a declarative
  ``F.when``-chain over the batch: every event is classified once, bad
  rows split off to a quarantine table with a reason, good rows proceed to
  apply. No exceptions in the data path — a malformed row can never abort
  a batch (the reference rolled back per row,
  ``/root/reference/scripts/collector.py:68``; our commits are
  all-or-nothing so bad rows must be excluded *before* the write).

- **verify_liveness** — the two-pass liveness upsert
  (``/root/reference/scripts/verify.py:42-94``: probe each tracker, set
  ``delisted`` true/false) becomes one anti-join-shaped aggregation: a key
  is delisted iff it has no recent activity. MERGE-ready output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

# classification reasons, in evaluation order
REASONS = ["null_lsn", "null_key", "bad_op", "missing_payload", "negative_lsn"]


def classify(df: DataFrame) -> Column:
    """One reason per row; null = valid. Mirrors the reference's
    substring-match ladder, as a single vectorized expression.

    ``null_lsn`` is checked first: an event without an LSN cannot be
    ordered at all (max_by over a null order key is undefined, and the
    file-stat high-water marks would silently skip it), so it must never
    reach apply. Note ``lsn < 0`` alone would NOT catch null — the
    comparison evaluates to null and falls through to valid."""
    return (
        F.when(F.col("lsn").isNull(), F.lit("null_lsn"))
        .when(F.col("conv_id").isNull() | F.col("turn_idx").isNull(),
              F.lit("null_key"))
        .when(~F.col("op").isin("I", "U", "D"), F.lit("bad_op"))
        .when((F.col("op") != "D") & F.col("text").isNull(),
              F.lit("missing_payload"))
        .when(F.col("lsn") < 0, F.lit("negative_lsn"))
        .otherwise(F.lit(None).cast("string")))


def split_quarantine(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined). One classification expression, two filters —
    Catalyst shares the scan; no data passes through Python."""
    tagged = events.withColumn("_reason", classify(events))
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    bad = (tagged.filter(F.col("_reason").isNotNull())
           .withColumn("quarantined_at", F.current_timestamp()))
    return valid, bad


def split_quarantine_observed(
        events: DataFrame) -> tuple[DataFrame, DataFrame, Observation]:
    """:func:`split_quarantine` plus a bad-row counter riding whatever
    action first runs over either branch — typically the apply's own
    census/staging job over the VALID side, so the caller learns whether
    any rows were quarantined without a second scan of the batch. The
    dead-letter write is the expensive part of a healthy stream's batch
    loop (a full-width scan of the batch to write zero rows — measured
    24% of a drain's wall, BENCH/BASELINE.md round 7); gating it on
    ``obs.get["n_bad"] == 0`` makes the clean-batch path scan-free.

    Only read ``obs.get`` after an action is KNOWN to have run over the
    returned frames (it blocks until the metrics exist)."""
    tagged = events.withColumn("_reason", classify(events))
    obs = Observation()
    tagged = tagged.observe(
        obs, F.count(F.when(F.col("_reason").isNotNull(), True))
              .alias("n_bad"))
    valid = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    bad = (tagged.filter(F.col("_reason").isNotNull())
           .withColumn("quarantined_at", F.current_timestamp()))
    return valid, bad, obs


def observed_bad_count(obs: Observation) -> int | None:
    """``obs.get["n_bad"]``, tolerating a vanished metrics row. When the
    batch is empty the optimizer can collapse the observed subtree to an
    empty relation — the CollectMetrics node goes with it and ``get``
    raises instead of answering. ``None`` means "unknown: pay the scan",
    which on the empty batch that triggers this is free anyway."""
    try:
        return obs.get["n_bad"]
    except Exception:
        return None


# engine columns the quarantine writer attaches; stripped before re-drive
_QUARANTINE_META = ["_reason", "quarantined_at", "_stream_id", "_epoch"]


def requeue_quarantine(table, quarantined: DataFrame, *,
                       repair=None, stream_id: str | None = None,
                       epoch: int | None = None):
    """Re-drive quarantined rows after the upstream defect is fixed — the
    engine's retry ladder (the reference re-ran failed keys at decreasing
    periods, ``/root/reference/scripts/collector.py:222-233``; here a
    re-drive is one idempotent batch apply instead of a scheduled re-scrape).

    ``repair`` (optional) is a DataFrame→DataFrame transform that fixes the
    rows (e.g. remap a bad op code, backfill a key). The repaired rows are
    re-CLASSIFIED from scratch — a repair that didn't actually fix a row
    sends it straight back to quarantine, never into the lake — and the
    clean rows go through the normal ``apply_batch`` (LWW-idempotent, so
    re-driving rows that somehow already applied is harmless).

    Returns ``(apply_result, still_bad)``: the MERGE result for the
    repaired rows and the rows that remain quarantined (with fresh
    ``_reason`` / ``quarantined_at``) for the next rung of the ladder.
    """
    from rockefeller_spark.merge import apply_batch
    rows = quarantined.drop(*[c for c in _QUARANTINE_META
                              if c in quarantined.columns])
    if repair is not None:
        rows = repair(rows)
    good, still_bad = split_quarantine(rows)
    result = apply_batch(table, good, stream_id=stream_id, epoch=epoch)
    return result, still_bad


def verify_liveness(events: DataFrame, key: str = "conv_id",
                    ts_col: str = "event_ts",
                    horizon: str = "2024-01-15 00:00:00") -> DataFrame:
    """Liveness flags: a key is delisted iff it has no event at/after the
    horizon. Output (key, delisted, last_seen) — the MERGE source for a
    registry table, replacing the reference's per-key UPDATE loop
    (``/root/reference/scripts/verify.py:60-87``) with one aggregation."""
    h = F.lit(horizon).cast("timestamp")
    return (events.groupBy(key)
            .agg(F.max(ts_col).alias("last_seen"))
            .withColumn("delisted", F.col("last_seen") < h))
