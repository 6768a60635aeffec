"""rockefeller_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference
(`Dicammmmm/rockefeller`, a Postgres extract/transform/load script) as an
idiomatic Spark lake-ingest pipeline:

- a binlog/WAL-style change stream (insert/update/delete events keyed by
  ``(conv_id, turn_idx)``) applied to an Iceberg-semantics lake table of
  multi-turn conversation transcripts,
- exactly-once apply via per-event LSN dedup + epoch-idempotent snapshot
  commits,
- last-writer-wins conflict resolution under stable turn ordering,
- additive schema evolution without rewrite,
- salted repartitioning for hot-conversation skew,
- checkpointed streaming resume with per-partition lineage/metrics.

All transforms are ``pyspark.sql`` DataFrame ops plus vectorized
pandas/Arrow UDFs — no per-row Python anywhere in the apply path
(the reference's ``history.iterrows()`` loop,
``/root/reference/scripts/collector.py:103``, is the anti-pattern this
engine replaces).
"""

__version__ = "0.1.0"

from rockefeller_spark.session import get_spark  # noqa: F401
