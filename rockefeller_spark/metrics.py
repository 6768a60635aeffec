"""Per-partition lineage + metrics, emitted each micro-batch.

Succeeds the reference's per-process log lines
(``/root/reference/scripts/collector.py:10-15,90,141``) with structured,
queryable records: every applied batch appends one JSON record carrying
the batch envelope (stream_id, epoch, snapshot id) and per-bucket
(= per key-partition) row/file/LSN stats — the data a lineage system needs
to answer "which partitions did epoch 17 touch and what did it write".

Records are tiny (bounded by n_buckets) and written driver-side next to the
table; ``read_metrics`` exposes them as a DataFrame for SQL. At cluster
scale this would be an append to a metrics topic/table — the record shape
is the contract, the transport is swappable.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from rockefeller_spark.merge import ApplyResult


class MetricsLog:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def record(self, res: "ApplyResult", *, stream_id: str | None = None,
               epoch: int | None = None) -> dict[str, Any] | None:
        rec: dict[str, Any] = {
            "ts_ms": int(time.time() * 1000),
            "stream_id": stream_id,
            "epoch": epoch,
            "skipped": res.skipped,
            "snapshot_id": None if res.snapshot is None else res.snapshot.snapshot_id,
            "events_in": res.events_in,
            "rows_written": res.rows_written,
            "buckets_touched": res.buckets_touched,
            "per_bucket": (res.snapshot.lineage.get("per_bucket", {})
                           if res.snapshot is not None else {}),
        }
        tmp = os.path.join(self.path, f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.rename(tmp, os.path.join(
            self.path, f"metrics-{epoch if epoch is not None else 'adhoc'}-{uuid.uuid4().hex}.json"))
        return rec

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(os.path.join(self.path, "metrics-*.json"))


def read_metrics(spark: SparkSession, path: str) -> DataFrame:
    return MetricsLog(path).read(spark)


class ProgressRecorder:
    """StreamingQueryListener adapter: persists each micro-batch's progress
    JSON (source offsets, rows/sec, duration breakdown) next to the
    metrics log — the stream-side half of the lineage story (the batch
    side is MetricsLog.record). Attach/detach around a query:

        rec = ProgressRecorder(spark, path); rec.attach()
        ... run query ...
        rec.detach()
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._listener = None

    def attach(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                rec = {"query_id": str(p.id), "batch_id": p.batchId,
                       "timestamp": p.timestamp,
                       "num_input_rows": p.numInputRows,
                       "duration_ms": dict(p.durationMs or {}),
                       "sources": [s.description for s in p.sources]}
                tmp = os.path.join(outer.path, f".{uuid.uuid4().hex}.tmp")
                with open(tmp, "w") as fh:
                    json.dump(rec, fh)
                os.rename(tmp, os.path.join(
                    outer.path, f"progress-{p.batchId}-{uuid.uuid4().hex}.json"))

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        self._listener = _L()
        self.spark.streams.addListener(self._listener)

    def detach(self) -> None:
        if self._listener is not None:
            self.spark.streams.removeListener(self._listener)
            self._listener = None

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(os.path.join(self.path, "progress-*.json"))


def partition_profile(df: DataFrame) -> DataFrame:
    """Runtime skew profile of any DataFrame: rows per physical Spark
    partition. The observability hook for 'is this stage skewed?'."""
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .orderBy(F.col("rows").desc()))


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-N hottest keys — the report that justifies the salt factor."""
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("rows"))
            .orderBy(F.col("rows").desc()).limit(top_n))
