"""Source protocol: the engine's ingest seam (batch + stream).

The reference's entire extract side is a live connection — a psycopg2
engine dispatched from env config (``/root/reference/scripts/tools/
db_connect.py:141-174``) and a network collector with a degrading retry
ladder (``/root/reference/scripts/collector.py:222-233``). This sandbox
has no network or database, so the engine reads files and synthetic
generators — but the SEAM those deployments plug into is defined here:

- :class:`Source` — the protocol every ingest implementation satisfies:
  ``read_batch(spark, since_lsn=...)`` for bounded reads (incremental by
  LSN high-water mark, the CDC catch-up shape) and ``read_stream(spark)``
  for an unbounded Structured Streaming DataFrame.
- :class:`FileSource` — parquet/csv/json WAL directories (what
  ``stream.run_stream`` tails today).
- :class:`GeneratorSource` — the deterministic synthetic change feed
  (``gen.gen_change_events``), the test/bench source.
- :class:`JdbcSource` — the production-shaped stub: builds the exact
  ``spark.read.format("jdbc")`` plan a real deployment runs — incremental
  ``WHERE lsn > hwm`` pushdown as a dbtable subquery, LSN-range
  ``partitionColumn`` parallelism (N executors each pull a slice, the
  100-TB ingest shape), transport retries with exponential backoff — and
  raises :class:`OfflineSourceError` in this container where no JDBC
  driver/database exists. A real deployment supplies ``url`` and driver
  jars; nothing else changes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rockefeller_spark import schema as S


class OfflineSourceError(RuntimeError):
    """Raised when a network-backed source is used in an offline
    environment (no JDBC driver / no reachable database)."""


@runtime_checkable
class Source(Protocol):
    """Anything the apply/stream machinery can ingest from."""

    def read_batch(self, spark: SparkSession, *,
                   since_lsn: int | None = None,
                   max_lsn: int | None = None) -> DataFrame:
        """Bounded read of change events; ``since_lsn`` asks only for
        events with ``lsn > since_lsn`` (the applied-LSN high-water mark
        — incremental catch-up), ``max_lsn`` caps the read at
        ``lsn <= max_lsn`` (the chunked-catch-up span bound —
        :func:`rockefeller_spark.catchup.catch_up`). Sources that can
        push the predicates to the store MUST (a JDBC subquery, a
        parquet filter); others may filter post-read."""
        ...

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """Unbounded Structured Streaming read of the same events.
        Sources with no native stream raise ``NotImplementedError`` —
        callers fall back to polling ``read_batch`` with the HWM."""
        ...


@dataclass
class FileSource:
    """A WAL directory of change-event files (parquet/csv/json)."""

    path: str
    format: str = "parquet"
    schema: Any = None
    options: dict[str, str] = field(default_factory=dict)

    def _schema(self):
        return self.schema or S.CHANGE_EVENT_SCHEMA

    def read_batch(self, spark: SparkSession, *,
                   since_lsn: int | None = None,
                   max_lsn: int | None = None) -> DataFrame:
        reader = spark.read.format(self.format).schema(self._schema())
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.load(self.path)
        if since_lsn is not None:
            # pushed to the parquet scan (footer stats prune row groups)
            df = df.filter(F.col("lsn") > F.lit(int(since_lsn)))
        if max_lsn is not None:
            df = df.filter(F.col("lsn") <= F.lit(int(max_lsn)))
        return df

    def read_stream(self, spark: SparkSession, *,
                    max_files_per_trigger: int | None = None) -> DataFrame:
        reader = spark.readStream.format(self.format).schema(self._schema())
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger",
                                   str(max_files_per_trigger))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.path)


@dataclass
class GeneratorSource:
    """The deterministic synthetic change feed (tests and benches).
    Same args → bit-identical events, so replays and A/B runs compare."""

    n_events: int = 10_000
    n_convs: int = 100
    seed: int = 42
    kwargs: dict[str, Any] = field(default_factory=dict)

    def read_batch(self, spark: SparkSession, *,
                   since_lsn: int | None = None,
                   max_lsn: int | None = None) -> DataFrame:
        from rockefeller_spark import gen
        df = gen.gen_change_events(spark, n_events=self.n_events,
                                   n_convs=self.n_convs, seed=self.seed,
                                   **self.kwargs)
        if since_lsn is not None:
            df = df.filter(F.col("lsn") > F.lit(int(since_lsn)))
        if max_lsn is not None:
            df = df.filter(F.col("lsn") <= F.lit(int(max_lsn)))
        return df

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(
            "GeneratorSource is bounded; stream tests use a rate source "
            "with a transform (see tests/test_stream_advanced.py)")


@dataclass
class JdbcSource:
    """Production-shaped JDBC/Postgres source (reference
    ``db_connect.py:141-174`` succeeded by a Spark-parallel read).

    ``read_batch`` builds the real reader plan; in this offline sandbox
    the load step raises :class:`OfflineSourceError` with a clear
    message. ``reader_options`` is pure (no I/O) so the plan itself is
    contract-tested offline:

    - incremental pushdown: ``since_lsn`` becomes a dbtable SUBQUERY
      (``(SELECT ... WHERE lsn > hwm) src``) so the database's own index
      on lsn serves the catch-up, not a full table scan shipped to Spark;
    - parallel pull: ``partitionColumn=lsn`` with ``num_partitions``
      bounds-split slices, one JDBC cursor per task — the only way a
      100-TB backfill saturates a cluster instead of one connection;
    - transport retry ladder (reference ``collector.py:222-233``):
      ``retries`` attempts with doubling backoff around the load.
    """

    url: str
    table: str
    user: str | None = None
    password: str | None = None
    partition_column: str = "lsn"
    num_partitions: int = 8
    lower_bound: int = 0
    upper_bound: int | None = None
    fetch_size: int = 10_000
    retries: int = 3
    backoff_s: float = 1.0
    options: dict[str, str] = field(default_factory=dict)

    def reader_options(self, since_lsn: int | None = None,
                       max_lsn: int | None = None) -> dict[str, str]:
        """The exact option map handed to ``spark.read.format("jdbc")``."""
        preds = []
        if since_lsn is not None:
            preds.append(f"{self.partition_column} > {int(since_lsn)}")
        if max_lsn is not None:
            preds.append(f"{self.partition_column} <= {int(max_lsn)}")
        if preds:
            dbtable = (f"(SELECT * FROM {self.table} "
                       f"WHERE {' AND '.join(preds)}) AS rk_src")
        else:
            dbtable = self.table
        lower = self.lower_bound
        if since_lsn is not None:
            lower = max(lower, int(since_lsn) + 1)
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": dbtable,
            "fetchsize": str(self.fetch_size),
            "partitionColumn": self.partition_column,
            "numPartitions": str(self.num_partitions),
            "lowerBound": str(lower),
        }
        # a span-bounded read (catch_up chunk) carries its own exact
        # upper bound — the bounds-discovery round-trip is unnecessary
        upper = max_lsn if max_lsn is not None else self.upper_bound
        if upper is not None:
            opts["upperBound"] = str(upper)
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        opts.update(self.options)
        return opts

    def read_batch(self, spark: SparkSession, *,
                   since_lsn: int | None = None,
                   max_lsn: int | None = None) -> DataFrame:
        opts = self.reader_options(since_lsn, max_lsn)
        if "upperBound" not in opts:
            # a real deployment fills bounds with one scalar round-trip
            # (SELECT max(lsn)); bounds-less partitioned reads are refused
            # rather than silently single-partition
            opts.pop("partitionColumn", None)
            opts.pop("numPartitions", None)
            opts.pop("lowerBound", None)
        reader = spark.read.format("jdbc")
        for k, v in opts.items():
            reader = reader.option(k, v)
        delay = self.backoff_s
        last: Exception | None = None
        for attempt in range(max(1, self.retries)):
            try:
                return reader.load()
            except Exception as e:          # driver missing / conn refused
                last = e
                if attempt + 1 < max(1, self.retries):
                    time.sleep(delay)
                    delay *= 2
        raise OfflineSourceError(
            f"jdbc source {self.url!r} is unreachable from this "
            f"environment (no JDBC driver/database); a real deployment "
            f"supplies driver jars via spark.jars and a reachable url. "
            f"Last error: {type(last).__name__}: {last}") from last

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(
            "JDBC has no native stream; poll read_batch(since_lsn=hwm) "
            "on a trigger (see stream.make_batch_applier) or front the "
            "database with a CDC log (Debezium→Kafka) and use a kafka "
            "FileSource-shaped reader")
