"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the full CDC apply path) on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 with DuckDB twins (see rockefeller_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rockefeller_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the entire CDC engine path — change-event mapping, LWW
    dedup, MERGE-upsert into an icelake table, final visible state —
    over /root/testdata/sf0.001."""
    return registry.q_cdc_apply_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
