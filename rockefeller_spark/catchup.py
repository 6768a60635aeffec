"""Chunked catch-up ingestion with a degrading request ladder.

Reference parity: the collector degrades the REQUESTED window when the
remote refuses or times out a large request — period ``5y`` → ``1y`` →
``5d`` (``/root/reference/scripts/collector.py:222-233``). This module
reproduces that transport-level semantics over the :class:`~rockefeller_
spark.sources.Source` protocol, and adds the scale behavior it implies:

A restarted ingest whose backlog is 10^10 events must NOT apply it as one
batch — a single merge over the whole backlog shuffles the entire backlog
at once, holds one giant commit open, and loses all progress on any
failure. :func:`catch_up` instead walks the LSN axis in bounded spans::

    (hwm, hwm+span] → apply as one epoch → hwm += span → repeat

Each chunk is an ordinary :func:`~rockefeller_spark.merge.apply_batch`
(epoch-gated, LWW-idempotent, atomically committed), so

- progress is durable per chunk: a crash resumes from the table's own
  metadata (``stats()["max_lsn"]`` + ``committed_epochs``), re-reading at
  most one span — no side checkpoint files;
- the shuffle working set is bounded by the span, not the backlog;
- a transient source failure (timeout on a too-large scan, connection
  reset) SHRINKS the span by ``ladder_factor`` down to
  ``min_chunk_lsns`` — the reference's 5y→1y→5d ladder — and regrows it
  on success, so one flaky window does not tax the rest of the backlog.

Correctness note: ``stats()["max_lsn"]`` can REGRESS when a delete
removes the highest-LSN row under copy-on-write (the winner row vanishes,
its file bound with it). The loop therefore over-reads at most the events
a re-read span covers — safe, because apply is idempotent by LSN: the
source contract is at-least-once, the sink exactly-once.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from rockefeller_spark.merge import apply_batch
from rockefeller_spark.sources import Source

log = logging.getLogger(__name__)


class SourceReadError(RuntimeError):
    """A chunk read kept failing after the ladder bottomed out at
    ``min_chunk_lsns`` and ``read_retries`` was exhausted."""


@dataclass
class CatchUpResult:
    chunks_read: int = 0            # bounded chunk reads attempted
    chunks_committed: int = 0       # chunks that produced a snapshot
    events: int = 0                 # change events applied (sum events_in)
    rows_written: int = 0
    degradations: int = 0           # ladder steps (span shrinks)
    failures: int = 0               # transient read failures absorbed
    final_hwm: int | None = None    # LSN high-water mark after the walk
    final_span: int = 0             # span in effect when the walk ended
    spans: list[int] = field(default_factory=list)  # span used per chunk
    snapshots: list[int] = field(default_factory=list)
    walls: dict[str, float] = field(default_factory=dict)


def _read_bounded(source: Source, spark: SparkSession,
                  since_lsn: int, max_lsn: int):
    """One bounded read. Sources that predate the ``max_lsn`` kwarg get
    the post-read filter fallback (pushdown-capable sources implement the
    kwarg natively — see sources.py)."""
    import inspect
    try:
        takes_max = "max_lsn" in inspect.signature(
            source.read_batch).parameters
    except (TypeError, ValueError):    # builtins/c-impls: assume modern
        takes_max = True
    if takes_max:
        return source.read_batch(spark, since_lsn=since_lsn, max_lsn=max_lsn)
    from pyspark.sql import functions as F
    return (source.read_batch(spark, since_lsn=since_lsn)
            .filter(F.col("lsn") <= F.lit(int(max_lsn))))


def recorded_base_lsn(table) -> int | None:
    """The WAL position the table was bootstrapped at, from the bootstrap
    commit's lineage (newest bootstrap wins — a re-onboarded table records
    the latest). ``None`` when no retained snapshot is a bootstrap."""
    for snap in reversed(table.history()):
        if snap.lineage.get("op") == "bootstrap":
            lsn = snap.lineage.get("base_lsn")
            return None if lsn is None else int(lsn)
    return None


def onboard(spark: SparkSession, base, base_lsn: int, source: Source,
            table, stream_id: str, **catch_up_kwargs) -> CatchUpResult:
    """The CDC onboarding flow: initial snapshot load, then chunked
    catch-up over the backlog that accumulated while the snapshot was
    taken/loaded — after which the caller hands the source to the
    streaming tail (:func:`rockefeller_spark.stream.run_stream`).

    ``base`` is the consistent snapshot DataFrame, ``base_lsn`` the WAL
    position it reflects (the Debezium snapshot-at-binlog-position
    contract). Base rows are stamped ``_lsn = base_lsn``, which makes the
    handoff stateless: the table's own ``stats()["max_lsn"]`` IS the
    resume point, so :func:`catch_up` starts exactly at the snapshot
    position — and a crash anywhere in the walk resumes from committed
    metadata alone. Pre-snapshot events replayed by an overshooting
    at-least-once source lose LWW against the base rows instead of
    clobbering them; a full-prefix replay (the whole WAL from LSN 0)
    converges to the same state. The one shape that cannot be repaired
    is the classic snapshot-onboarding caveat: a snapshot carries no
    tombstones, so a PARTIAL pre-snapshot replay that includes an insert
    but not the later delete would resurrect the key — which is exactly
    why catch_up never reads below the recorded position.

    Idempotent: re-running onboard on a table that already holds a
    bootstrap at the same position just re-walks the (empty) backlog —
    the epoch gate and LWW make duplicate applies no-ops."""
    if recorded_base_lsn(table) != base_lsn:
        from rockefeller_spark.merge import bootstrap
        bootstrap(table, base, base_lsn=base_lsn)
    return catch_up(spark, source, table, stream_id, **catch_up_kwargs)


def catch_up(spark: SparkSession, source: Source, table,
             stream_id: str, *,
             chunk_lsns: int = 1_000_000,
             min_chunk_lsns: int = 10_000,
             ladder_factor: int = 5,
             read_retries: int = 6,
             max_chunk_rows: "int | None" = 20_000_000,
             span_growth: int = 16,
             mode: str = "cow",
             write_salt: int = 4,
             retries: int = 0,
             max_chunks: int | None = None,
             quarantine_dir: str | None = None,
             apply_kwargs: dict[str, Any] | None = None) -> CatchUpResult:
    """Apply everything the source holds beyond the table's LSN
    high-water mark, in bounded spans — starting at ``chunk_lsns`` LSNs
    and AUTO-SIZING from there (``max_chunk_rows`` is not None, the
    default): each chunk pays a fixed Spark stage-launch floor (~1.6 s
    on this box), so fixed small spans on a dense WAL are almost pure
    overhead (measured 11.4x at 1M-LSN spans over a 10M-event backlog —
    BENCH/BASELINE.md round 7). After each chunk the span grows by up to
    ``span_growth``x, bounded by the ROW budget: the measured row
    density (rows per LSN, EWMA over committed chunks) projects the span
    onto ``max_chunk_rows``, so the shuffle working set stays bounded no
    matter how dense the WAL — on a dense backlog the span converges to
    ~``max_chunk_rows`` rows per chunk, on a sparse one it widens until
    rows bound it. ``max_chunk_rows=None`` disables auto-sizing (fixed
    ``chunk_lsns`` spans, the pre-round-8 behavior).

    Transport safety is AIMD: a chunk that needed ladder shrinks records
    a span CEILING at 2x the span that finally succeeded (the server
    told us its limit; do not re-ask for 16x that), and each clean chunk
    at the ceiling doubles it — gentle additive probing up, multiplicative
    decrease on failure, exactly the reference collector's behavior
    generalized (``/root/reference/scripts/collector.py:222-233``).

    ``read_retries`` bounds the CONSECUTIVE failures absorbed for one
    chunk; each failure shrinks the span by ``ladder_factor`` until
    ``min_chunk_lsns``, after which remaining retries re-try the floor
    span. Exhausting them raises :class:`SourceReadError` — progress up
    to the failing chunk is already committed and a later call resumes
    there.

    Termination: when a bounded chunk comes back empty, a LIMIT-1 probe
    beyond the current HWM decides "backlog drained" vs "sparse LSN gap"
    (gaps advance the HWM without consuming an epoch — empty applies are
    short-circuited by ``apply_batch`` and commit nothing).

    ``quarantine_dir`` routes malformed rows (null key/LSN, unknown op)
    through the same gated dead-letter split the streaming path uses —
    the bad-row count rides the apply's own scan, so a clean chunk pays
    no second pass. Without it, a bad row aborts the walk (progress up
    to that chunk is committed).
    """
    if chunk_lsns < 1 or min_chunk_lsns < 1:
        raise ValueError("chunk_lsns and min_chunk_lsns must be >= 1")
    if ladder_factor < 2:
        raise ValueError("ladder_factor must be >= 2")
    auto = max_chunk_rows is not None
    if auto and max_chunk_rows < 1:
        raise ValueError("max_chunk_rows must be >= 1 (or None to disable)")
    if auto and span_growth < 2:
        raise ValueError("span_growth must be >= 2")
    min_chunk_lsns = min(min_chunk_lsns, chunk_lsns)

    res = CatchUpResult()
    t0 = time.time()
    hwm = table.stats().get("max_lsn")
    hwm = -1 if hwm is None else int(hwm)
    epoch = table.current().committed_epochs.get(stream_id, -1) + 1
    span = chunk_lsns
    ceiling: int | None = None   # AIMD transport ceiling (None = unprobed)
    density = 0.0                # rows per LSN, EWMA over committed chunks
    t_read = t_apply = 0.0

    def _grow(cur: int) -> int:
        """Next span: up to ``span_growth``x the current one, projected
        onto the row budget by the measured density, never past the AIMD
        transport ceiling, never below the ladder floor."""
        target = cur * span_growth
        if density > 0.0:
            target = min(target, int(max_chunk_rows / density))
        if ceiling is not None:
            target = min(target, ceiling)
        return max(min_chunk_lsns, target)

    while max_chunks is None or res.chunks_read < max_chunks:
        # -- one bounded chunk, with the degrading ladder ---------------
        fails_this_chunk = 0
        while True:
            _t = time.time()
            try:
                chunk = _read_bounded(source, spark, hwm, hwm + span)
                break
            except Exception as e:
                t_read += time.time() - _t
                res.failures += 1
                fails_this_chunk += 1
                if fails_this_chunk >= read_retries:
                    raise SourceReadError(
                        f"chunk ({hwm}, {hwm + span}] failed "
                        f"{fails_this_chunk}x (span {span}, ladder floor "
                        f"{min_chunk_lsns}, {res.degradations} shrinks); "
                        f"progress through lsn {hwm} is committed. "
                        f"Last error: {type(e).__name__}: {e}") from e
                if span > min_chunk_lsns:
                    span = max(min_chunk_lsns, span // ladder_factor)
                    res.degradations += 1
                    log.warning("catch_up %s: read failed (%s); degrading "
                                "span to %d lsns", stream_id, e, span)
        t_read += time.time() - _t
        res.chunks_read += 1
        res.spans.append(span)
        if auto:
            if fails_this_chunk:
                # the ladder just probed the transport's limit: remember a
                # ceiling at 2x the span that finally succeeded (the server
                # told us what it can serve; do not re-ask for 16x that)
                ceiling = max(min_chunk_lsns, span * 2)
            elif ceiling is not None and span >= ceiling:
                # a clean chunk at the ceiling: probe gently upward
                ceiling *= 2

        _t = time.time()
        if quarantine_dir is not None:
            from rockefeller_spark.quarantine import (
                observed_bad_count, split_quarantine_observed)
            good, bad, qobs = split_quarantine_observed(chunk)
            r = apply_batch(table, good, stream_id=stream_id, epoch=epoch,
                            write_salt=write_salt, mode=mode,
                            retries=retries, **(apply_kwargs or {}))
            # gate on the count that rode the apply's scan (stream.py has
            # the full rationale); epoch-keyed overwrite keeps replays
            # idempotent here too
            n_bad = (None if r.events_in is None
                     else observed_bad_count(qobs))
            if n_bad is None or n_bad:
                from pyspark.sql import functions as F
                import os as _os
                # the dead-letter subdir is keyed by the chunk's START
                # LSN, not the epoch: epoch only advances when a chunk
                # COMMITS, so an all-quarantined chunk (which commits
                # nothing) would otherwise share its epoch with the next
                # chunk and the mode('overwrite') write would silently
                # erase its dead-letter rows. The start LSN advances
                # every chunk and is replay-stable (a rerun resumes from
                # the committed HWM and re-reads the same span), so the
                # overwrite stays idempotent without ever colliding.
                (bad.withColumn("_stream_id", F.lit(stream_id))
                    .withColumn("_epoch", F.lit(epoch))
                    .write.mode("overwrite")
                    .parquet(_os.path.join(quarantine_dir,
                                           f"{stream_id}-lsn{hwm:016d}")))
        else:
            r = apply_batch(table, chunk, stream_id=stream_id, epoch=epoch,
                            write_salt=write_salt, mode=mode,
                            retries=retries, **(apply_kwargs or {}))
        t_apply += time.time() - _t

        if r.snapshot is not None:
            res.chunks_committed += 1
            res.snapshots.append(r.snapshot.snapshot_id)
            res.events += r.events_in or 0
            res.rows_written += r.rows_written
            epoch += 1
            hwm += span
            if auto:
                if r.events_in:
                    d = r.events_in / span
                    density = d if density <= 0.0 \
                        else 0.5 * density + 0.5 * d
                span = _grow(span)
            elif span < chunk_lsns:
                # fixed-span mode: recover the span after a clean chunk
                # (gentler than the shrink: one bad window shouldn't tax
                # the whole backlog, but flapping between extremes is worse)
                span = min(chunk_lsns, span * 2)
            continue

        # empty span: drained, or a sparse-LSN gap? LIMIT-1 probe beyond
        # the CURRENT hwm decides (cheap under pushdown; retried like any
        # other read but without shrinking — probe cost is span-free)
        probe_fails = 0
        while True:
            try:
                drained = source.read_batch(
                    spark, since_lsn=hwm + span).limit(1).isEmpty()
                break
            except Exception as e:
                res.failures += 1
                probe_fails += 1
                if probe_fails >= read_retries:
                    raise SourceReadError(
                        f"drain probe beyond lsn {hwm + span} failed "
                        f"{probe_fails}x; progress through lsn {hwm} is "
                        f"committed. Last error: "
                        f"{type(e).__name__}: {e}") from e
        hwm += span
        if drained:
            break
        if auto:
            # a sparse-LSN gap: widen so the gap is crossed in O(log gap)
            # empty chunks instead of gap/span of them (density is left
            # untouched — an empty span says nothing about row density)
            span = _grow(span)

    res.final_hwm = hwm
    res.final_span = span
    res.walls = {"total_s": round(time.time() - t0, 4),
                 "read_s": round(t_read, 4),
                 "apply_s": round(t_apply, 4)}
    return res
