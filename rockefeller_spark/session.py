"""SparkSession construction with engine defaults.

Succeeds the reference's env/config dispatch
(``/root/reference/scripts/tools/db_connect.py:103-139``): there are no DB
credentials here — configuration is Spark configs, and the only knobs are
parallelism and shuffle sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Timezone is pinned to UTC so timestamps round-trip bit-identically
# between Spark, Parquet, pandas and the DuckDB oracle.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Persisted intermediates (sketch signatures, band tables, IVF index)
    # otherwise compile WITHOUT adaptive execution: every shuffle under an
    # InMemoryRelation runs at the static spark.sql.shuffle.partitions
    # fan-out regardless of data size. Letting AQE re-plan cached subtrees
    # coalesces those exchanges like any other (measured 2x on the
    # MinHash/SimHash pair queries; scale-neutral — on a big corpus the
    # partitions stay large and nothing coalesces).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # Timestamps written as INT64 micros so DuckDB/pandas read them exactly.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    # local mode runs everything in the driver JVM; the 1g default heap is
    # far too small for multi-million-row shuffles. Overridable via env.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "rockefeller_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. At cluster scale the same code ships via
    ``spark-submit --py-files`` and ``master`` is left to the submitter.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(ENGINE_CONFS)
    # Shuffle/spill scratch: in LOCAL mode route to tmpfs when present —
    # this box's virtual disk throttles the first heavy write burst
    # (measured ~10% on the apply wall's best runs, interleaved A/B);
    # RAM-backed shuffle is safe at local-mode working-set sizes and the
    # dirs are removed on session stop. NEVER defaulted on a cluster:
    # executors there get real local disks from the cluster manager, and
    # a 100-TB shuffle must not land in RAM. Override with
    # SPARK_GRAFT_LOCAL_DIR (or an explicit spark.local.dir conf).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        confs["spark.local.dir"] = local_dir
    elif master.startswith("local") and os.path.isdir("/dev/shm"):
        confs.setdefault("spark.local.dir", "/dev/shm/rk-spark-local")
        try:
            os.makedirs("/dev/shm/rk-spark-local", exist_ok=True)
        except OSError:
            confs.pop("spark.local.dir", None)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
