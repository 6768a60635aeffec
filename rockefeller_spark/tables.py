"""Canonical table-name/path registry.

Succeeds the reference's ``standards.py`` name registry
(``/root/reference/scripts/tools/standards.py:8-21``: ``dim_trackers`` /
``fct_trackers`` exposed via functions + a DEFAULT_TABLES dict). Here the
registry maps logical names to lake paths under a warehouse root and can
register them in the Spark catalog for SQL access.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# logical name -> subdirectory under the warehouse root
DEFAULT_TABLES: dict[str, str] = {
    "transcripts": "transcripts",       # the target lake table (fct analog)
    "quarantine": "quarantine",         # dead-letter table for bad events
    "conv_registry": "conv_registry",   # liveness registry (dim analog)
    "metrics": "metrics",               # per-batch lineage records
}


def warehouse_root(default: str = "/tmp/rockefeller-warehouse") -> str:
    return os.environ.get("ROCKEFELLER_WAREHOUSE", default)


def table_path(name: str, root: str | None = None) -> str:
    if name not in DEFAULT_TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(DEFAULT_TABLES)}")
    return os.path.join(root or warehouse_root(), DEFAULT_TABLES[name])


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register the driver's parquet testdata as SQL views (the engine's
    `spark.sql` entry point over the shared tables)."""
    names = names or ["region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents", "embeddings"]
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(n)
