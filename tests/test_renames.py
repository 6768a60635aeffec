"""Column RENAME / DROP without rewrite (round-5 stretch): the name-log
analog of Iceberg field ids. Old files keep their on-disk names; readers
resolve each file's columns from its schema vintage; a name freed by a
rename/drop and later re-used never resurfaces the dead field's values."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rockefeller_spark import gen
from rockefeller_spark.feed import changes_between
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import apply_batch, bootstrap, read_state
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"),
                            STORED_TRANSCRIPT_SCHEMA, n_buckets=4)


def test_rename_is_metadata_only_and_reads_old_files(spark, table):
    ev = gen.gen_change_events(spark, n_events=400, n_convs=20, seed=41)
    apply_batch(table, ev)
    before_files = {f.path for f in table.current().files}
    want = (read_state(table).select("conv_id", "turn_idx", "role")
            .toPandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))

    table.rename_column("role", "speaker")
    snap = table.current()
    assert {f.path for f in snap.files} == before_files      # zero rewrite
    st = read_state(table)
    assert "speaker" in st.columns and "role" not in st.columns
    got = (st.select("conv_id", "turn_idx",
                     F.col("speaker").alias("role"))
           .toPandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # time travel to the pre-rename snapshot keeps the OLD name
    old = read_state(table, snapshot_id=snap.snapshot_id - 1)
    assert "role" in old.columns and "speaker" not in old.columns


def test_apply_after_rename_mixes_vintages(spark, table):
    """Post-rename batches (carrying the new name) merge against
    pre-rename files; LWW across the two vintages is value-exact."""
    ev = gen.gen_change_events(spark, n_events=300, n_convs=15, seed=42)
    apply_batch(table, ev)
    table.rename_column("text", "body")
    # updates to every key, carrying the NEW name, higher LSNs
    upd = (ev.withColumnRenamed("text", "body")
           .withColumn("lsn", F.col("lsn") + 1000)
           .withColumn("op", F.lit("U"))
           .withColumn("body", F.concat(F.lit("v2:"), F.col("body"))))
    apply_batch(table, upd)
    st = read_state(table)
    assert "body" in st.columns
    # every surviving row is a v2 row (all keys updated at higher LSN)
    assert st.filter(~F.col("body").startswith("v2:")
                     & F.col("body").isNotNull()).count() == 0
    assert st.count() > 0
    # lookup (pruned read) works across vintages too
    key = st.select("conv_id").first()[0]
    assert table.lookup(key).count() > 0


def test_drop_then_readd_never_resurfaces(spark, table):
    """The re-add trap: drop 'tool', later batches carry a NEW 'tool'
    column — pre-drop files must read NULL for it, never the dead
    field's stale bytes."""
    ev = gen.gen_change_events(spark, n_events=300, n_convs=15, seed=43)
    apply_batch(table, ev)
    had_tool = (read_state(table)
                .filter(F.col("tool").isNotNull()).count())
    assert had_tool > 0                       # the trap has teeth

    table.drop_column("tool")
    assert "tool" not in read_state(table).columns

    # re-add: one conversation's events carry a fresh 'tool' column
    one = (gen.gen_change_events(spark, n_events=10, n_convs=1, seed=44)
           .withColumn("lsn", F.col("lsn") + 10_000)
           .withColumn("tool", F.lit("new-field")))
    apply_batch(table, one)
    st = read_state(table)
    assert "tool" in st.columns
    # only the re-added batch's keys may have non-null tool
    new_keys = {(r["conv_id"], r["turn_idx"])
                for r in one.select("conv_id", "turn_idx").distinct()
                .collect()}
    bad = [(r["conv_id"], r["turn_idx"], r["tool"])
           for r in st.filter(F.col("tool").isNotNull()).collect()
           if (r["conv_id"], r["turn_idx"]) not in new_keys]
    assert bad == [], f"stale dropped values resurfaced: {bad[:5]}"
    assert st.filter(F.col("tool") == "new-field").count() > 0


def test_rename_frees_name_for_new_field(spark, table):
    """role -> speaker, then a NEW 'role' column arrives: old files'
    on-disk 'role' maps to speaker, and the new 'role' is NULL for them."""
    ev = gen.gen_change_events(spark, n_events=200, n_convs=10, seed=45)
    apply_batch(table, ev)
    table.rename_column("role", "speaker")
    one = (gen.gen_change_events(spark, n_events=8, n_convs=1, seed=46)
           .withColumn("lsn", F.col("lsn") + 10_000)
           .withColumnRenamed("role", "speaker")
           .withColumn("role", F.lit("brand-new")))
    apply_batch(table, one)
    st = read_state(table)
    assert {"speaker", "role"} <= set(st.columns)
    new_keys = {(r["conv_id"], r["turn_idx"])
                for r in one.select("conv_id", "turn_idx").distinct()
                .collect()}
    for r in st.filter(F.col("role").isNotNull()).collect():
        assert (r["conv_id"], r["turn_idx"]) in new_keys
    # old rows still carry their speaker values
    assert st.filter(F.col("speaker").isNotNull()).count() > 0


def test_feed_across_rename_reports_no_phantom_changes(spark, table):
    ev = gen.gen_change_events(spark, n_events=300, n_convs=15, seed=47)
    apply_batch(table, ev)
    v1 = table.current_version()
    table.rename_column("role", "speaker")
    v2 = table.current_version()
    # a pure rename changes NO values: the feed between the snapshots
    # must be empty (and carry the new name if it weren't)
    assert changes_between(table, v1, v2).count() == 0

    # rename + one real update: the feed reports exactly that key
    one = (gen.gen_change_events(spark, n_events=1, n_convs=1, seed=48)
           .withColumn("lsn", F.col("lsn") + 10_000)
           .withColumn("op", F.lit("U"))
           .withColumnRenamed("role", "speaker"))
    apply_batch(table, one)
    v3 = table.current_version()
    feed = changes_between(table, v1, v3)
    assert "speaker" in feed.columns
    assert feed.count() == one.select("conv_id", "turn_idx").distinct().count()


def test_rename_drop_guards(table):
    with pytest.raises(ValueError, match="engine column"):
        table.rename_column("conv_id", "cid")
    with pytest.raises(ValueError, match="engine column"):
        table.rename_column("_lsn", "x")
    with pytest.raises(ValueError, match="no such column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("role", "text")
    with pytest.raises(ValueError, match="engine column"):
        table.drop_column("turn_idx")
    with pytest.raises(ValueError, match="no such column"):
        table.drop_column("nope")


def test_vintage_name_resolution_unit():
    from rockefeller_spark.lake import Snapshot
    from pyspark.sql import types as T
    s = Snapshot(9, 8, T.StructType([]), 4, "conv_id", [],
                 name_log=[{"v": 3, "rename": ["a", "b"]},
                           {"v": 5, "drop": "c"},
                           {"v": 7, "rename": ["b", "d"]}])
    # current d: file v6 -> b; file v2 -> a; file v4 -> b
    assert s.vintage_name("d", 6) == "b"
    assert s.vintage_name("d", 2) == "a"
    assert s.vintage_name("d", 4) == "b"
    # current c (re-added after the drop): files older than v5 -> dead
    assert s.vintage_name("c", 4) is None
    assert s.vintage_name("c", 5) == "c"
    # current a (re-added after the rename freed it): pre-v3 files -> dead
    assert s.vintage_name("a", 2) is None
    assert s.vintage_name("a", 3) == "a"
    # untouched column maps identically at any vintage
    assert s.vintage_name("z", None) == "z"
    # eras: v>=7 -> 0 newer entries; v in [5,7) -> 1; [3,5) -> 2; else 3
    assert [s.file_era(v) for v in (8, 6, 4, 2, None)] == [0, 1, 2, 3, 3]


def test_rename_with_pending_mor_deltas(spark, table):
    """Era mapping must cover bucket-spanning MOR delta files too: rename
    while deltas are pending, append more deltas under the new name, and
    the read-time LWW resolve sees one consistent column."""
    ev = gen.gen_change_events(spark, n_events=200, n_convs=10, seed=49)
    apply_batch(table, ev)                                   # CoW base
    d1 = (gen.gen_change_events(spark, n_events=20, n_convs=2, seed=50)
          .withColumn("lsn", F.col("lsn") + 10_000))
    apply_batch(table, d1, mode="mor")                       # pre-rename delta
    table.rename_column("text", "body")
    d2 = (gen.gen_change_events(spark, n_events=20, n_convs=2, seed=51)
          .withColumn("lsn", F.col("lsn") + 20_000)
          .withColumnRenamed("text", "body"))
    apply_batch(table, d2, mode="mor")                       # post-rename delta
    st = read_state(table)
    assert "body" in st.columns and "text" not in st.columns
    assert st.filter(F.col("body").isNotNull()).count() > 0
    # compaction folds all vintages into current-name files; state stable
    before = st.toPandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    table.compact()
    after = (read_state(table).toPandas()
             .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(after, before, check_dtype=False)
    assert table.current().file_era(
        table.current().files[0].schema_v) == 0   # all files current-era


def test_never_renamed_table_reads_single_scan(spark, table):
    """VERDICT r5: a table with an empty name log must take the one-scan
    fast path — no era grouping, no Union in the read plan — so the
    rename machinery costs nothing on the overwhelmingly common
    never-renamed table (the MOR resolve path reads through this)."""
    ev = gen.gen_change_events(spark, n_events=400, n_convs=10, seed=61)
    apply_batch(table, ev, mode="mor")
    apply_batch(table, gen.gen_change_events(spark, n_events=200, n_convs=10,
                                             seed=62), mode="mor")
    snap = table.current()
    assert snap.name_log == []
    plan = (table.read()._jdf.queryExecution().optimizedPlan().toString())
    assert "Union" not in plan
    # and with a rename the era union appears only when vintages differ
    table.rename_column("tool", "tool_name")
    apply_batch(table, gen.gen_change_events(spark, n_events=200, n_convs=10,
                                             seed=63).withColumnRenamed("tool", "tool_name"))
    plan2 = (table.read()._jdf.queryExecution().optimizedPlan().toString())
    assert "Union" in plan2
