"""Chunked catch-up with the degrading request ladder (catchup.py).

Reference parity: the collector shrinks the requested window when the
remote fails a large request (``/root/reference/scripts/collector.py:
222-233``, period 5y → 1y → 5d); ``catch_up`` reproduces that over the
Source protocol and bounds a restarted ingest's working set by walking
the LSN axis in spans — per-chunk durable progress, resume from table
metadata alone."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pytest
from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.catchup import SourceReadError, catch_up
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, read_state
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
from rockefeller_spark.sources import FileSource, GeneratorSource


@dataclass
class FlakySource:
    """Transport-failure fake: ``max_span`` simulates a server that times
    out scans wider than it can serve (what the reference's 5y request
    hits); ``fail_first`` simulates an outage window hitting any call."""

    inner: Any
    max_span: int | None = None
    fail_first: int = 0
    calls: int = 0
    ok_spans: list = field(default_factory=list)

    seen: list = field(default_factory=list)   # (since_lsn, max_lsn) asked

    def read_batch(self, spark, *, since_lsn=None, max_lsn=None):
        self.calls += 1
        self.seen.append((since_lsn, max_lsn))
        if self.calls <= self.fail_first:
            raise TimeoutError("transient outage")
        if (self.max_span is not None and max_lsn is not None
                and since_lsn is not None
                and max_lsn - since_lsn > self.max_span):
            raise TimeoutError(f"scan too large ({max_lsn - since_lsn} lsns)")
        self.ok_spans.append(None if max_lsn is None
                             else max_lsn - (since_lsn or 0))
        return self.inner.read_batch(spark, since_lsn=since_lsn,
                                     max_lsn=max_lsn)

    def read_stream(self, spark):
        raise NotImplementedError


def _mk_table(spark, tmp_path, name="cu"):
    return LakeTable.create(spark, str(tmp_path / name),
                            STORED_TRANSCRIPT_SCHEMA, n_buckets=8)


def _state(table):
    # read_state strips engine columns (_lsn): compare full visible rows —
    # LWW means text/role/tool pin which writer won, so this is as strong
    df = read_state(table)
    return sorted(tuple(r) for r in
                  df.select(*sorted(df.columns)).collect())


N, CONVS, SEED = 20_000, 60, 977


@pytest.fixture(scope="module")
def oneshot_state(spark, tmp_path_factory):
    """Oracle: the same events applied as ONE batch."""
    t = _mk_table(spark, tmp_path_factory.mktemp("oneshot"), "one")
    ev = gen.gen_change_events(spark, n_events=N, n_convs=CONVS, seed=SEED)
    apply_batch(t, ev, stream_id="one", epoch=0)
    return _state(t)


def test_chunked_catch_up_matches_one_shot(spark, tmp_path, oneshot_state):
    t = _mk_table(spark, tmp_path)
    src = GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED)
    # max_chunk_rows bounds the auto-sizer to ~3000-row chunks (density is
    # ~1 row/LSN here), so the walk genuinely happens in spans
    res = catch_up(spark, src, t, "cu", chunk_lsns=3000,
                   max_chunk_rows=3000)
    assert res.chunks_committed >= 6              # actually walked in spans
    assert res.degradations == 0 and res.failures == 0
    assert _state(t) == oneshot_state
    # per-chunk durability: each chunk is its own epoch-gated commit
    assert t.current().committed_epochs["cu"] == res.chunks_committed - 1
    assert res.events == N
    # a second walk over a drained source commits nothing (resume no-op)
    res2 = catch_up(spark, src, t, "cu", chunk_lsns=3000,
                    max_chunk_rows=3000)
    assert res2.chunks_committed == 0 and res2.events == 0
    assert _state(t) == oneshot_state


def test_degrading_ladder_finds_servable_span(spark, tmp_path, oneshot_state):
    t = _mk_table(spark, tmp_path)
    src = FlakySource(GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED),
                      max_span=800)
    res = catch_up(spark, src, t, "cu", chunk_lsns=20_000,
                   min_chunk_lsns=250, ladder_factor=5)
    # 20000 -> 4000 -> 800: two ladder steps before the first chunk lands
    assert res.degradations >= 2
    assert res.failures >= res.degradations
    # every read the server accepted was within its limit
    assert all(s is None or s <= 800 for s in src.ok_spans)
    assert _state(t) == oneshot_state


def test_transient_outage_absorbed(spark, tmp_path, oneshot_state):
    t = _mk_table(spark, tmp_path)
    src = FlakySource(GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED),
                      fail_first=3)
    res = catch_up(spark, src, t, "cu", chunk_lsns=6000, read_retries=6)
    assert res.failures == 3
    assert _state(t) == oneshot_state


def test_persistent_failure_raises_then_resume_completes(
        spark, tmp_path, oneshot_state):
    t = _mk_table(spark, tmp_path)
    # the floor span is still wider than the server serves: the ladder
    # bottoms out and the walk raises instead of spinning forever
    src = FlakySource(GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED),
                      max_span=100)
    with pytest.raises(SourceReadError):
        catch_up(spark, src, t, "cu", chunk_lsns=10_000,
                 min_chunk_lsns=1000, read_retries=4)
    # recovery run (healthy transport) RESUMES from table metadata alone
    res = catch_up(spark, GeneratorSource(n_events=N, n_convs=CONVS,
                                          seed=SEED), t, "cu",
                   chunk_lsns=5000)
    assert res.chunks_committed >= 1
    assert _state(t) == oneshot_state


def test_partial_walk_resumes_without_rereading(spark, tmp_path,
                                                oneshot_state):
    t = _mk_table(spark, tmp_path)
    src = GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED)
    res1 = catch_up(spark, src, t, "cu", chunk_lsns=3000, max_chunks=2,
                    max_chunk_rows=3000)
    assert res1.chunks_committed == 2
    hwm_after_1 = t.stats()["max_lsn"]
    res2 = catch_up(spark, src, t, "cu", chunk_lsns=3000,
                    max_chunk_rows=3000)
    # resumed beyond the committed HWM, from the NEXT epoch
    assert res2.snapshots[0] > res1.snapshots[-1]
    assert t.current().committed_epochs["cu"] == (res1.chunks_committed +
                                                  res2.chunks_committed - 1)
    assert res2.events + res1.events >= N  # >= : HWM re-read overlap is ok
    assert hwm_after_1 is not None
    assert _state(t) == oneshot_state


def test_sparse_lsn_gap_is_walked_not_mistaken_for_drain(spark, tmp_path):
    # WAL holds lsn <= 2000 and lsn > 18000 only: the bounded chunks in
    # between come back empty, and the LIMIT-1 probe must distinguish
    # "gap, keep walking" from "backlog drained"
    ev = gen.gen_change_events(spark, n_events=N, n_convs=CONVS, seed=SEED)
    wal = str(tmp_path / "wal")
    ev.filter((F.col("lsn") <= 2000) | (F.col("lsn") > 18_000)) \
      .write.parquet(wal)
    t = _mk_table(spark, tmp_path)
    # fixed-span mode (max_chunk_rows=None) keeps the empty-gap chunks
    # observable; the auto-sizer's gap behavior has its own test below
    res = catch_up(spark, FileSource(wal), t, "cu", chunk_lsns=1000,
                   max_chunk_rows=None)
    assert res.chunks_read > res.chunks_committed  # empty gap spans read
    got = {r[0] for r in t.read().select("_lsn").collect()}
    assert got and all(l <= 2000 or l > 18_000 for l in got)
    # everything present in the WAL landed
    t2 = _mk_table(spark, tmp_path, "one")
    apply_batch(t2, spark.read.parquet(wal), stream_id="o", epoch=0)
    assert _state(t) == _state(t2)


def test_catch_up_quarantines_bad_rows(spark, tmp_path):
    """A malformed row in the backlog must not abort the walk: with
    ``quarantine_dir`` set, catch_up routes it through the same gated
    dead-letter split the streaming path uses."""
    ev = gen.gen_change_events(spark, n_events=5000, n_convs=20, seed=31)
    bad = ev.limit(3).withColumn("conv_id", F.lit(None).cast("string"))
    wal = str(tmp_path / "wal")
    ev.unionByName(bad).write.parquet(wal)
    t = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "q")
    res = catch_up(spark, FileSource(wal), t, "cu", chunk_lsns=2000,
                   quarantine_dir=qdir)
    assert res.chunks_committed >= 2
    assert spark.read.parquet(qdir + "/*").count() == 3
    assert read_state(t).count() > 0


def test_auto_span_grows_then_row_budget_bounds(spark, tmp_path,
                                                oneshot_state):
    """The auto-sizer (the default) must escape the stage-floor regime:
    spans grow by up to span_growth x per committed chunk, but the
    measured row density projects them onto max_chunk_rows so the shuffle
    working set stays bounded on a dense WAL."""
    t = _mk_table(spark, tmp_path)
    src = GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED)
    res = catch_up(spark, src, t, "cu", chunk_lsns=500,
                   max_chunk_rows=4000, span_growth=16)
    assert _state(t) == oneshot_state
    # grew from the seed span...
    assert res.spans[0] == 500
    assert max(res.spans) > 500
    # ...but the row budget bound it: density is ~1 row/LSN, so no span
    # may exceed ~max_chunk_rows (2x slack for EWMA settling)
    assert max(res.spans) <= 8000
    # and the walk is far off the fixed-span chunk count (40 at 500 LSNs)
    assert res.chunks_committed <= 10


def test_auto_span_aimd_ceiling_respects_transport_limit(spark, tmp_path,
                                                         oneshot_state):
    """After the ladder shrinks to a span the server can serve, the
    auto-sizer must NOT re-ask for span_growth x that: the ceiling is 2x
    the span that succeeded (AIMD), probing up gently."""
    t = _mk_table(spark, tmp_path)
    src = FlakySource(GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED),
                      max_span=800)
    res = catch_up(spark, src, t, "cu", chunk_lsns=20_000,
                   min_chunk_lsns=250, ladder_factor=5, span_growth=16)
    assert _state(t) == oneshot_state
    assert res.degradations >= 2       # ladder found the servable span
    # every request after the first SUCCESS stays within 2x the largest
    # span the server had accepted so far — never a 16x re-ask
    max_ok = None
    for since, mx in src.seen:
        span = None if mx is None else mx - since
        if span is None:
            continue
        if max_ok is not None:
            assert span <= 2 * max_ok, (span, max_ok)
        if span <= 800:                # the server serves it
            max_ok = max(max_ok or 0, span)


def test_auto_span_crosses_sparse_gap_fast(spark, tmp_path):
    """In auto mode an empty chunk widens the span too, so a sparse-LSN
    gap is crossed in O(log gap) chunks instead of gap/span of them."""
    ev = gen.gen_change_events(spark, n_events=N, n_convs=CONVS, seed=SEED)
    wal = str(tmp_path / "wal")
    ev.filter((F.col("lsn") <= 1000) | (F.col("lsn") > 18_000)) \
      .write.parquet(wal)
    t = _mk_table(spark, tmp_path)
    res = catch_up(spark, FileSource(wal), t, "cu", chunk_lsns=1000)
    # fixed spans would read ~20 chunks (17 of them empty); the widening
    # walk crosses the 17k-LSN gap in a handful
    assert res.chunks_read <= 5
    got = {r[0] for r in t.read().select("_lsn").collect()}
    assert got and all(l <= 1000 or l > 18_000 for l in got)
    t2 = _mk_table(spark, tmp_path, "one")
    apply_batch(t2, spark.read.parquet(wal), stream_id="o", epoch=0)
    assert _state(t) == _state(t2)


SNAP_LSN = 8000   # the onboarding tests' snapshot-at-WAL-position


@pytest.fixture(scope="module")
def snapshot_base(spark):
    """A consistent snapshot of the source at SNAP_LSN: the oracle replay
    of every event up to it (what a real initial load would SELECT)."""
    import pyspark.sql.types as T

    from rockefeller_spark import schema as S
    from rockefeller_spark.oracle import replay
    ev = gen.gen_change_events(spark, n_events=N, n_convs=CONVS, seed=SEED)
    pdf = replay(ev.filter(F.col("lsn") <= SNAP_LSN).toPandas())
    user = T.StructType([f for f in STORED_TRANSCRIPT_SCHEMA.fields
                         if f.name not in S.META_COLS])
    return spark.createDataFrame(pdf[[f.name for f in user.fields]], user)


def test_onboard_resumes_at_snapshot_position(spark, tmp_path,
                                              snapshot_base, oneshot_state):
    from rockefeller_spark.catchup import onboard, recorded_base_lsn
    t = _mk_table(spark, tmp_path)
    src = FlakySource(GeneratorSource(n_events=N, n_convs=CONVS, seed=SEED))
    res = onboard(spark, snapshot_base, SNAP_LSN, src, t, "cu",
                  chunk_lsns=4000)
    # the walk started AT the snapshot position — nothing below re-read
    assert src.seen[0][0] == SNAP_LSN
    assert all(s is None or s >= SNAP_LSN for s, _ in src.seen)
    assert recorded_base_lsn(t) == SNAP_LSN
    # snapshot + post-position catch-up == replaying the whole WAL
    assert _state(t) == oneshot_state
    # re-running onboard is a no-op: same bootstrap, drained backlog
    res2 = onboard(spark, snapshot_base, SNAP_LSN, src, t, "cu",
                   chunk_lsns=4000)
    assert res2.chunks_committed == 0
    assert _state(t) == oneshot_state
    assert res.chunks_committed >= 1


def test_full_prefix_replay_converges_over_bootstrap(spark, tmp_path,
                                                     snapshot_base,
                                                     oneshot_state):
    """An at-least-once source that overshoots all the way back to LSN 0:
    pre-snapshot events lose LWW against the base rows (stamped at the
    snapshot position) and the later events still win — the full replay
    converges instead of letting stale events clobber newer base rows."""
    from rockefeller_spark.merge import bootstrap
    t = _mk_table(spark, tmp_path)
    bootstrap(t, snapshot_base, base_lsn=SNAP_LSN)
    assert t.stats()["max_lsn"] == SNAP_LSN   # the stateless resume point
    ev = gen.gen_change_events(spark, n_events=N, n_convs=CONVS, seed=SEED)
    apply_batch(t, ev, stream_id="replay", epoch=0)
    assert _state(t) == oneshot_state


def test_jdbc_span_bound_reaches_the_subquery():
    from rockefeller_spark.sources import JdbcSource
    src = JdbcSource("jdbc:postgresql://db/cdc", "wal", num_partitions=8)
    opts = src.reader_options(since_lsn=100, max_lsn=4100)
    assert "lsn > 100" in opts["dbtable"]
    assert "lsn <= 4100" in opts["dbtable"]
    # the chunk bound doubles as the partitioning upper bound: no extra
    # bounds-discovery round-trip for a span-bounded read
    assert opts["upperBound"] == "4100"
    assert opts["lowerBound"] == "101"


def test_all_bad_chunk_does_not_erase_prior_dead_letters(spark, tmp_path):
    """The dead-letter subdir must be keyed by a value that advances
    every CHUNK, not by epoch: an all-quarantined chunk commits nothing,
    so epoch does not advance, and an epoch-keyed mode('overwrite')
    write from the next chunk would silently erase its rows."""
    import os

    ev = gen.gen_change_events(spark, n_events=3000, n_convs=20, seed=33)
    good = ev.filter((F.col("lsn") <= 999) | (F.col("lsn") > 1999))
    bads = None
    for l in (500, 1500, 2500):                 # one bad row per chunk;
        b = (ev.limit(1)                        # chunk 2 is ENTIRELY bad
             .withColumn("lsn", F.lit(l).cast("long"))
             .withColumn("conv_id", F.lit(None).cast("string")))
        bads = b if bads is None else bads.unionByName(b)
    wal = str(tmp_path / "wal")
    good.unionByName(bads).write.parquet(wal)

    t = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "q")
    res = catch_up(spark, FileSource(wal), t, "cu", chunk_lsns=1000,
                   max_chunk_rows=None, quarantine_dir=qdir)
    assert res.chunks_read >= 3
    q = spark.read.parquet(qdir + "/*")
    assert sorted(r["lsn"] for r in q.select("lsn").collect()) \
        == [500, 1500, 2500]
    # one subdir per chunk that held bad rows (an empty trailing dir from
    # the drain-probe chunk is fine — its observation never materializes)
    assert len(os.listdir(qdir)) >= 3
    # the walk itself stayed correct: no bad row reached the table
    assert read_state(t).filter(F.col("conv_id").isNull()).count() == 0
