"""Source-protocol contract (the ingest seam, sources.py): every
implementation satisfies the same batch/stream surface, incremental
``since_lsn`` reads agree across sources, and the JDBC-shaped stub
builds the production reader plan (pushdown subquery, LSN-range
partitioning) while failing offline with a clear error."""

from __future__ import annotations

import pytest

from rockefeller_spark import gen
from rockefeller_spark.sources import (FileSource, GeneratorSource,
                                       JdbcSource, OfflineSourceError,
                                       Source)


def test_all_sources_satisfy_protocol():
    for s in (FileSource("/tmp/x"), GeneratorSource(),
              JdbcSource("jdbc:postgresql://db/x", "events")):
        assert isinstance(s, Source)


def test_file_and_generator_agree_incrementally(spark, tmp_path):
    ev = gen.gen_change_events(spark, n_events=2000, n_convs=20, seed=311)
    path = str(tmp_path / "wal")
    ev.write.parquet(path)
    fsrc = FileSource(path)
    gsrc = GeneratorSource(n_events=2000, n_convs=20, seed=311)
    hwm = 1500
    got_f = fsrc.read_batch(spark, since_lsn=hwm)
    got_g = gsrc.read_batch(spark, since_lsn=hwm)
    assert got_f.count() == got_g.count() > 0
    assert got_f.agg({"lsn": "min"}).collect()[0][0] > hwm
    # predicate reaches the parquet scan (data skipping, not post-filter)
    plan = got_f._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(lsn" in plan


def test_file_source_streams(spark, tmp_path):
    ev = gen.gen_change_events(spark, n_events=100, n_convs=5, seed=313)
    path = str(tmp_path / "wal")
    ev.write.parquet(path)
    sdf = FileSource(path).read_stream(spark, max_files_per_trigger=1)
    assert sdf.isStreaming
    assert set(ev.columns) <= set(sdf.columns)


def test_generator_source_has_no_native_stream(spark):
    with pytest.raises(NotImplementedError):
        GeneratorSource().read_stream(spark)


def test_jdbc_reader_plan_shape():
    src = JdbcSource("jdbc:postgresql://db:5432/cdc", "public.wal",
                     user="etl", num_partitions=16, upper_bound=10_000_000)
    opts = src.reader_options(since_lsn=54321)
    # incremental catch-up pushes the HWM predicate into the database
    assert "WHERE lsn > 54321" in opts["dbtable"]
    # and the parallel pull splits the remaining LSN range
    assert opts["partitionColumn"] == "lsn"
    assert opts["numPartitions"] == "16"
    assert int(opts["lowerBound"]) == 54322
    assert opts["upperBound"] == "10000000"
    # full-scan form: plain table name, configured lower bound
    full = src.reader_options()
    assert full["dbtable"] == "public.wal"
    assert full["lowerBound"] == "0"


def test_jdbc_offline_raises_clear_error(spark):
    src = JdbcSource("jdbc:postgresql://nowhere:5432/cdc", "wal",
                     upper_bound=100, retries=1, backoff_s=0.0)
    with pytest.raises(OfflineSourceError, match="jdbc.*unreachable"):
        src.read_batch(spark, since_lsn=0)


def test_jdbc_stream_points_at_cdc_log(spark):
    with pytest.raises(NotImplementedError, match="kafka|CDC"):
        JdbcSource("jdbc:postgresql://db/x", "wal").read_stream(spark)
