"""CDC output surface (change feed, LSN gap audit) and predicate DML."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.dml import delete_where, update_where
from rockefeller_spark.feed import changes_between, lsn_gaps
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, read_state
from rockefeller_spark.oracle import replay
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"),
                            STORED_TRANSCRIPT_SCHEMA, n_buckets=4)


def _state(pdf_events):
    return replay(pdf_events).set_index(["conv_id", "turn_idx"]).sort_index()


def test_changes_between_matches_state_diff(spark, table):
    ev = gen.gen_change_events(spark, n_events=1500, n_convs=12, seed=201,
                               p_delete=0.2)
    pdf = ev.toPandas()
    half = int(pdf.lsn.max()) // 2
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn <= half], ev.schema))
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn > half], ev.schema))
    got = changes_between(table, 1, 2).toPandas() \
        .set_index(["conv_id", "turn_idx"]).sort_index()

    s1, s2 = _state(pdf[pdf.lsn <= half]), _state(pdf)
    want = {}
    for k in s2.index.difference(s1.index):
        want[k] = "insert"
    for k in s1.index.difference(s2.index):
        want[k] = "delete"
    for k in s1.index.intersection(s2.index):
        a, b = s1.loc[k], s2.loc[k]
        if not a.equals(b):
            want[k] = "update"
    assert got["_change"].to_dict() == want
    # new values carried for insert/update, nulls for delete
    ins = got[got._change == "insert"]
    if len(ins):
        pd.testing.assert_frame_equal(
            ins[s2.columns.tolist()], s2.loc[ins.index],
            check_dtype=False, check_index_type=False)
    dels = got[got._change == "delete"]
    assert dels[["role", "text"]].isna().all().all()


def test_changes_between_prunes_untouched_buckets(spark, table):
    """A second batch touching ONE conversation must produce a feed whose
    scan reads only that conversation's bucket at each snapshot — not the
    whole table twice (file-level metadata diff)."""
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=20, seed=203)
    pdf = ev.toPandas()
    apply_batch(table, ev)
    conv = pdf.conv_id.iloc[0]
    upd = pdf[pdf.conv_id == conv].copy()
    upd["lsn"] += 10_000_000
    upd["text"] = "changed"
    apply_batch(table, spark.createDataFrame(upd, ev.schema))
    feed = changes_between(table, 1, 2)
    out = feed.toPandas()
    assert set(out.conv_id) == {conv}
    assert (out._change == "update").any()
    n_read = len(feed.inputFiles())
    n_total = len(table.snapshot(1).files) + len(table.snapshot(2).files)
    assert n_read < n_total / 2          # bucket pruning really happened


def test_changes_between_metadata_only_commit_is_empty(spark, table):
    ev = gen.gen_change_events(spark, n_events=300, n_convs=5, seed=207)
    apply_batch(table, ev)
    from pyspark.sql import types as T
    table.evolve(T.StructType([T.StructField("extra", T.StringType(), True)]))
    assert changes_between(table, 1, 2).count() == 0


def test_lsn_gaps_exact_ranges(spark):
    present = [0, 1, 2, 5, 6, 10, 995, 996, 1000, 1001, 1002, 2500, 3001]
    df = spark.createDataFrame([(x,) for x in present], ["lsn"])
    got = {(r.gap_start, r.gap_end)
           for r in lsn_gaps(df, block=1000).collect()}
    want = set()
    for a, b in zip(present, present[1:]):
        if b - a > 1:
            want.add((a + 1, b - 1))
    assert got == want                    # incl. cross-block + whole-block


def test_delete_where_tombstones_and_resurrection_guard(spark, table):
    ev = gen.gen_change_events(spark, n_events=1200, n_convs=10, seed=211)
    pdf = ev.toPandas()
    apply_batch(table, ev)
    before = read_state(table).toPandas()
    victims = {c for c in before.conv_id.unique() if c.endswith("3")}
    res = delete_where(table, F.col("conv_id").endswith("3"))
    assert not res.skipped
    after = read_state(table).toPandas()
    assert set(after.conv_id) == set(before.conv_id) - victims
    assert len(after) == len(before[~before.conv_id.isin(victims)])
    # late LOWER-LSN event for a deleted key must NOT resurrect it
    late = pdf[pdf.conv_id.isin(victims)].head(5)
    apply_batch(table, spark.createDataFrame(late, ev.schema))
    assert not set(read_state(table).toPandas().conv_id) & victims
    # the DML shows up in the change feed like any other change
    feed = changes_between(table, 1, 2).toPandas()
    assert set(feed._change) == {"delete"}
    assert set(feed.conv_id) == victims


def test_delete_where_prunes_buckets(spark, table):
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=20, seed=213)
    apply_batch(table, ev)
    one = read_state(table).limit(1).collect()[0]["conv_id"]
    res = delete_where(table, F.col("conv_id") == one)
    assert len(res.buckets_touched) < table.current().n_buckets


def test_update_where_matches_pandas(spark, table):
    ev = gen.gen_change_events(spark, n_events=1000, n_convs=8, seed=217)
    apply_batch(table, ev)
    before = read_state(table).toPandas()
    update_where(table, F.col("turn_idx") >= 15,
                 {"role": F.lit("archived"),
                  "text": F.upper(F.col("text"))})
    after = read_state(table).toPandas() \
        .set_index(["conv_id", "turn_idx"]).sort_index()
    want = before.set_index(["conv_id", "turn_idx"]).sort_index()
    hit = want.index.get_level_values("turn_idx") >= 15
    want.loc[hit, "role"] = "archived"
    want.loc[hit, "text"] = want.loc[hit, "text"].str.upper()
    pd.testing.assert_frame_equal(after[want.columns.tolist()], want,
                                  check_dtype=False)


def test_update_where_rejects_key_and_unknown_columns(spark, table):
    ev = gen.gen_change_events(spark, n_events=200, n_convs=3, seed=219)
    apply_batch(table, ev)
    with pytest.raises(ValueError, match="key columns"):
        update_where(table, F.lit(True), {"conv_id": F.lit("x")})
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(table, F.lit(True), {"nope": F.lit("x")})


def test_dml_on_multiversion_mor_table(spark, table):
    """DML rides the apply path, so it works with pending MOR deltas too."""
    ev = gen.gen_change_events(spark, n_events=900, n_convs=9, seed=223)
    apply_batch(table, ev, mode="mor")
    assert table.current().multi_version
    delete_where(table, F.col("conv_id").endswith("1"), mode="mor")
    after = read_state(table).toPandas()
    assert not any(c.endswith("1") for c in after.conv_id.unique())
    table.compact()
    after2 = read_state(table).toPandas()
    assert sorted(after2.conv_id.unique()) == sorted(after.conv_id.unique())


def test_changes_since_cursor_loop(spark, table):
    """A downstream consumer tails the table with changes_since: each
    cycle sees exactly the delta since its cursor; an identical re-run
    from the old cursor replays the same feed; an expired cursor raises."""
    ev = gen.gen_change_events(spark, n_events=900, n_convs=9, seed=257)
    pdf = ev.toPandas()
    from rockefeller_spark.feed import changes_since
    cursor = table.current_version()                # 0, empty table
    seen = []
    for k in range(3):
        apply_batch(table, spark.createDataFrame(pdf[pdf.lsn % 3 == k],
                                                 ev.schema))
        feed, new_cursor = changes_since(table, cursor)
        out = feed.toPandas()
        assert new_cursor == cursor + 1
        # replay from the stale cursor yields the identical feed
        replay_out = changes_since(table, cursor)[0].toPandas()
        assert len(out) == len(replay_out)
        seen.append(out)
        cursor = new_cursor
    # no-op cycle: no new snapshot → empty feed, cursor unchanged
    feed, c2 = changes_since(table, cursor)
    assert c2 == cursor and feed.count() == 0
    # first cycle of a fresh table is pure inserts
    assert set(seen[0]._change) == {"insert"}
    # an expired cursor fails loudly
    table.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    with pytest.raises(ValueError, match="expired"):
        changes_since(table, 0)[0].count()


# ---------------------------------------------------------------- cursors

def _apply_half(spark, table, pdf, ev_schema, lo, hi, **kw):
    from rockefeller_spark.merge import apply_batch as ab
    ab(table, spark.createDataFrame(
        pdf[(pdf.lsn > lo) & (pdf.lsn <= hi)], ev_schema), **kw)


def test_feed_cursor_transactional_consumption(spark, table):
    from rockefeller_spark.feed import (CursorConflictError, FeedCursor,
                                        changes_between)
    ev = gen.gen_change_events(spark, n_events=1200, n_convs=10, seed=31)
    pdf = ev.toPandas()
    cur = FeedCursor(table, "indexer")
    # a NEW consumer based at current sees nothing until the table moves
    df, tok = cur.poll()
    assert df is None and tok is None
    assert cur.position() == table.current_version()

    _apply_half(spark, table, pdf, ev.schema, -1, 600)
    base = cur.position()
    df, tok = cur.poll()
    want = changes_between(table, base, table.current_version()).toPandas()
    assert len(df.toPandas()) == len(want) > 0
    # window replays identically until acked (crash between poll and ack)
    df2, tok2 = cur.poll()
    assert tok2 == tok and df2.count() == df.count()
    cur.ack(tok)
    assert cur.position() == tok["snapshot_id"]
    # idempotent re-ack of the SAME window (retry after a crash) is fine
    cur.ack(tok)
    # up to date now
    assert cur.poll() == (None, None)

    # second window; a COMPETING worker of the same group wins the seq
    _apply_half(spark, table, pdf, ev.schema, 600, 1200)
    worker_a = FeedCursor(table, "indexer")
    worker_b = FeedCursor(table, "indexer")
    dfa, toka = worker_a.poll()
    dfb, tokb = worker_b.poll()
    worker_a.ack(toka)
    if tokb == toka:    # same window: B's ack is the idempotent replay
        worker_b.ack(tokb)
    assert worker_b.position() == table.current_version()
    # a stale token for the SAME seq but different window conflicts
    with pytest.raises(CursorConflictError):
        worker_b.ack({"from": None, "snapshot_id": toka["snapshot_id"] - 1,
                      "seq": toka["seq"]})

    # groups are independent
    other = FeedCursor(table, "cache-invalidator")
    assert other.position() is None


def test_feed_cursor_full_pipeline_converges(spark, table):
    """Consume every window into a downstream dict; after N commits the
    downstream equals the oracle replay (exactly-once effect with an
    idempotent sink)."""
    from rockefeller_spark.feed import FeedCursor
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=15, seed=37,
                               p_delete=0.2)
    pdf = ev.toPandas()
    cur = FeedCursor(table, "derived")
    cur.poll()                                   # base at empty table
    downstream: dict = {}
    edges = [-1, 400, 900, 1300, 2000]
    for lo, hi in zip(edges, edges[1:]):
        _apply_half(spark, table, pdf, ev.schema, lo, hi)
        df, tok = cur.poll()
        for r in df.collect():
            k = (r["conv_id"], r["turn_idx"])
            if r["_change"] == "delete":
                downstream.pop(k, None)
            else:
                downstream[k] = r["text"]
        cur.ack(tok)
    want = replay(pdf)
    assert downstream == {(r.conv_id, r.turn_idx): r.text
                          for r in want.itertuples()}


def test_feed_cursor_stale_after_retention(spark, table):
    from rockefeller_spark.feed import FeedCursor, StaleCursorError
    ev = gen.gen_change_events(spark, n_events=1500, n_convs=10, seed=41)
    pdf = ev.toPandas()
    cur = FeedCursor(table, "slow")
    cur.poll()                                   # base at v0
    for lo, hi in [(-1, 300), (300, 600), (600, 900), (900, 1200),
                   (1200, 1500)]:
        _apply_half(spark, table, pdf, ev.schema, lo, hi)
    table.expire_snapshots(keep_last=2)
    with pytest.raises(StaleCursorError):
        cur.poll()
    cur.reset()                                  # re-base after full sync
    assert cur.poll() == (None, None)


# ------------------------------------------------------------- MERGE INTO

def test_merge_into_all_clauses_equal_oracle(spark, table):
    from rockefeller_spark.dml import merge_into
    ev = gen.gen_change_events(spark, n_events=1200, n_convs=10, seed=61)
    pdf = ev.toPandas()
    apply_batch(table, ev)
    state = replay(pdf)

    # source: updates for half the existing keys, inserts for new keys,
    # and a delete predicate on one conv
    existing = state.iloc[: len(state) // 2].copy()
    existing["text"] = "merged:" + existing["text"]
    new = state.iloc[:5].copy()
    new["conv_id"] = "brand-new"
    new["turn_idx"] = range(5)
    new["text"] = "inserted"
    src_pdf = pd.concat([existing, new], ignore_index=True)
    src = spark.createDataFrame(src_pdf)
    del_conv = existing.conv_id.iloc[0]

    res = merge_into(table, src,
                     when_matched_delete=F.col("conv_id") == del_conv)
    assert res.snapshot is not None

    got = read_state(table).toPandas().set_index(
        ["conv_id", "turn_idx"]).sort_index()
    want = state.set_index(["conv_id", "turn_idx"]).sort_index()
    # oracle: apply the clauses in pandas
    want = want.drop(index=[i for i in want.index
                            if i in existing.set_index(
                                ["conv_id", "turn_idx"]).index
                            and i[0] == del_conv])
    upd = existing[existing.conv_id != del_conv] \
        .set_index(["conv_id", "turn_idx"])
    want.loc[upd.index, "text"] = upd["text"]
    for i, r in new.set_index(["conv_id", "turn_idx"]).iterrows():
        want.loc[i, :] = r
    want = want.sort_index()
    assert list(got.index) == list(want.index)
    assert (got["text"].values == want["text"].values).all()


def test_merge_into_update_dict_and_validation(spark, table):
    from rockefeller_spark.dml import merge_into
    ev = gen.gen_change_events(spark, n_events=600, n_convs=6, seed=62)
    apply_batch(table, ev)
    state = read_state(table).toPandas()
    src = spark.createDataFrame(state)          # source == current state

    # dict update referencing BOTH source and t_ target columns
    merge_into(table, src,
               when_matched_update={
                   "text": F.concat(F.lit("v2:"), F.col("t_text"))},
               when_not_matched_insert=False)
    got = read_state(table).toPandas()
    assert (got.text.str.startswith("v2:")).all()
    assert len(got) == len(state)

    with pytest.raises(ValueError, match="key columns"):
        merge_into(table, src, when_matched_update={"conv_id": F.lit("x")})
    with pytest.raises(ValueError, match="lacks key columns"):
        merge_into(table, src.drop("conv_id"))
    with pytest.raises(ValueError, match="no-op"):
        merge_into(table, src, when_matched_update=None,
                   when_not_matched_insert=False)


# ------------------------------------------------------------ CDC chaining

def test_sync_mirror_downstream_equals_source(spark, table, tmp_path):
    """A derived table pumped by sync_mirror converges to the source's
    visible state across multiple windows with deletes, and a crashed
    window (applied but unacked) replays as a no-op via the downstream
    epoch ledger."""
    from rockefeller_spark.feed import FeedCursor, sync_mirror
    from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA

    dst = LakeTable.create(spark, str(tmp_path / "mirror"),
                           STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=1800, n_convs=12, seed=71,
                               p_delete=0.25)
    pdf = ev.toPandas()

    def states_equal():
        a = read_state(table).toPandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        b = read_state(dst).toPandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(a) == len(b) and (a.text.values == b.text.values).all()

    # window 1: initial load
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn <= 600], ev.schema))
    out = sync_mirror(table, dst, "mirror-a")
    assert out["windows"] == 1
    states_equal()

    # windows 2+3 (two src commits, ONE poll window) incl deletes
    apply_batch(table, spark.createDataFrame(
        pdf[(pdf.lsn > 600) & (pdf.lsn <= 1200)], ev.schema))
    apply_batch(table, spark.createDataFrame(pdf[pdf.lsn > 1200], ev.schema))
    sync_mirror(table, dst, "mirror-a")
    states_equal()
    # downstream visible state == oracle replay of the full log
    want = replay(pdf)
    got = read_state(dst).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got.text.values == want.sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True).text.values).all()

    # crash between apply and ack: re-pump replays the window — the
    # epoch ledger skips it and the mirror still converges
    delete_where(table, F.col("turn_idx") == 0)
    cur = FeedCursor(table, "mirror-a")
    df, tok = cur.poll()
    from rockefeller_spark.merge import apply_batch as ab
    payload = [c for c in df.columns if c not in ("conv_id", "turn_idx",
                                                  "_change")]
    ev2 = df.select(
        F.lit(tok["snapshot_id"]).cast("long").alias("lsn"),
        F.when(F.col("_change") == "delete", F.lit("D"))
         .otherwise(F.lit("U")).alias("op"),
        "conv_id", "turn_idx", *payload,
        F.current_timestamp().alias("event_ts"))
    ab(dst, ev2, stream_id="mirror:mirror-a", epoch=tok["seq"])  # applied...
    # ...but NOT acked (crash). The pump replays and must not double-apply.
    out = sync_mirror(table, dst, "mirror-a")
    assert out["windows"] == 1
    states_equal()


def test_sync_mirror_survives_source_schema_evolution(spark, table,
                                                      tmp_path):
    """The source gains a column mid-stream; the mirror auto-evolves
    additively (zero rewrite) and keeps converging."""
    from rockefeller_spark.feed import sync_mirror
    from rockefeller_spark.schema import (CHANGE_EVENT_SCHEMA_V2,
                                          STORED_TRANSCRIPT_SCHEMA)
    dst = LakeTable.create(spark, str(tmp_path / "m2"),
                           STORED_TRANSCRIPT_SCHEMA, n_buckets=4)
    ev = gen.gen_change_events(spark, n_events=600, n_convs=6, seed=72)
    apply_batch(table, ev)
    sync_mirror(table, dst, "m")

    ev2 = gen.gen_change_events(spark, n_events=400, n_convs=6, seed=73,
                                evolved=True)
    pdf2 = ev2.toPandas()
    pdf2["lsn"] = pdf2["lsn"] + 10_000
    apply_batch(table, spark.createDataFrame(pdf2, CHANGE_EVENT_SCHEMA_V2))
    sync_mirror(table, dst, "m")

    a = read_state(table).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = read_state(dst).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)   # evolved col mirrored
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].isna() == b[c].isna()).all()
        assert (a[c].dropna().values == b[c].dropna().values).all()


def test_feed_cursor_lag(spark, table):
    from rockefeller_spark.feed import FeedCursor
    ev = gen.gen_change_events(spark, n_events=900, n_convs=6, seed=81)
    pdf = ev.toPandas()
    cur = FeedCursor(table, "lagged")
    assert cur.lag()["position"] is None
    cur.poll()                                   # base at current
    assert cur.lag() == {"position": table.current_version(),
                         "snapshots_behind": 0, "lag_ms": 0,
                         "within_retention": True}
    for lo, hi in [(-1, 300), (300, 600), (600, 900)]:
        _apply_half(spark, table, pdf, ev.schema, lo, hi)
    lag = cur.lag()
    assert lag["snapshots_behind"] == 3 and lag["lag_ms"] >= 0
    df, tok = cur.poll()
    cur.ack(tok)
    assert cur.lag()["snapshots_behind"] == 0
    # falls out of retention -> flagged
    for lo, hi in [(0, 300), (300, 900)]:
        _apply_half(spark, table, pdf.assign(lsn=pdf.lsn + 10_000),
                    ev.schema, lo + 10_000, hi + 10_000)
    table.expire_snapshots(keep_last=1)
    lag = cur.lag()
    assert lag["within_retention"] is False and lag["lag_ms"] is None


def test_merge_into_rejects_duplicate_source_keys(spark, table):
    """Delta/Iceberg MERGE raise when several source rows match one
    target key; duplicates would compile to multiple events at the one
    shared LSN and an arbitrary LWW tie-break — nondeterministic MERGE."""
    from rockefeller_spark.dml import merge_into
    ev = gen.gen_change_events(spark, n_events=300, n_convs=4, seed=63)
    apply_batch(table, ev)
    state = read_state(table).toPandas()
    src = spark.createDataFrame(state)
    dup = src.limit(1).withColumn("text", F.lit("other-payload"))
    with pytest.raises(ValueError, match="at most once"):
        merge_into(table, src.unionByName(dup))
    # the table is untouched — the guard fires before any event compiles
    assert read_state(table).count() == len(state)
