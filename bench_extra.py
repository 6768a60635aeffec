"""Extra benchmarks for optimization work (guide §1): per-query noop-sink
timing with Spark-REST job attribution, apply-leg phase breakdowns, and
gen-cost isolation. bench.py stays frozen; numbers cited in
OPTIMIZATION_r09.md come from here unless noted.

Usage:
  python bench_extra.py queries   [names...]   # headline queries, best-of-2
  python bench_extra.py apply     [n_events]   # CoW+MOR apply phase split
  python bench_extra.py gen       [n_events]   # generator cost alone
  python bench_extra.py plans     [names...]   # explain(formatted) capture

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

from rockefeller_spark import gen, registry
from rockefeller_spark.session import get_spark

HEADLINE = [
    "cdc_apply_full", "cdc_lww_latest", "cdc_high_water_marks",
    "cdc_change_feed", "asof_join",
    "pricing_summary", "revenue_by_nation", "brand_revenue",
    "topk_orders_per_priority", "sessionize", "hourly_rollup",
    "doc_exact_dedup", "doc_minhash_pairs", "doc_simhash_pairs",
    "doc_tokens", "emb_cosine_topk", "emb_centroid_assign",
    "emb_ivf_topk", "emb_lsh_topk", "emb_near_dup",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _spark(cpus: int):
    return get_spark("rockefeller-bench-extra", master=f"local[{cpus}]",
                     shuffle_partitions=cpus * 4,
                     extra_confs={"spark.driver.memory":
                                  os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
                                  "spark.sql.files.maxPartitionBytes": "64m",
                                  "spark.driver.extraJavaOptions":
                                  "-XX:+UseParallelGC"})


def _rest_jobs(spark) -> list[dict]:
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs",
                                    timeout=10) as r:
            return json.load(r)
    except Exception:
        return []


def run_queries(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        walls = []
        for i in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            _force(fn(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = walls
        print(f"{name}: {walls}", flush=True)
    jobs = _rest_jobs(spark)
    agg: dict[str, dict] = {}
    for j in jobs:
        d = (j.get("description") or j.get("name") or "?").split("#")[0]
        a = agg.setdefault(d, {"jobs": 0, "ms": 0, "tasks": 0, "stages": 0})
        a["jobs"] += 1
        a["stages"] += len(j.get("stageIds", []))
        a["tasks"] += j.get("numTasks", 0)
        try:
            from datetime import datetime
            st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
            ct = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
            a["ms"] += int((ct - st).total_seconds() * 1000)
        except Exception:
            pass
    print(json.dumps({"walls": out, "jobs_by_query": agg}, indent=1))
    spark.stop()


def run_apply(n_events: int) -> None:
    from rockefeller_spark.lake import LakeTable
    from rockefeller_spark.merge import apply_batch
    from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="rk-bx-")
    t0 = time.time()
    ev = gen.gen_change_events(spark, n_events=n_events,
                               n_convs=max(1000, n_events // 200),
                               max_turns=50, seed=42, num_partitions=32)
    ev.write.mode("overwrite").parquet(os.path.join(work, "events"))
    print(f"gen+write: {time.time()-t0:.2f}s", flush=True)
    log = spark.read.parquet(os.path.join(work, "events"))
    n_batches = 4
    span = n_events // n_batches + 1
    for mode in ("cow", "mor"):
        for rep in range(2):
            tdir = os.path.join(work, f"t-{mode}-{rep}")
            table = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                                     n_buckets=256)
            t0 = time.time()
            phases = []
            for b in range(n_batches):
                batch = log.filter((log.lsn >= b * span) & (log.lsn < (b + 1) * span))
                r = apply_batch(table, batch, stream_id="bx", epoch=b,
                                collect_metrics=False, mode=mode)
                phases.append(r.timings)
            wall = round(time.time() - t0, 3)
            print(f"{mode} rep{rep}: wall={wall} phases={json.dumps(phases)}",
                  flush=True)
            shutil.rmtree(tdir, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def run_gen(n_events: int) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="rk-bxgen-")
    for rep in range(2):
        t0 = time.time()
        ev = gen.gen_change_events(spark, n_events=n_events,
                                   n_convs=max(1000, n_events // 200),
                                   max_turns=50, seed=42, num_partitions=32)
        ev.write.mode("overwrite").parquet(os.path.join(work, f"e{rep}"))
        print(f"gen+write rep{rep}: {time.time()-t0:.2f}s", flush=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def run_plans(names: list[str], outdir: str) -> None:
    import io
    from contextlib import redirect_stdout
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    for name in names:
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {name}_{suffix}.txt", flush=True)
        except Exception as e:
            print(f"{name}: ERROR {e}", flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        run_queries(sys.argv[2:] or HEADLINE)
    elif cmd == "apply":
        run_apply(int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000)
    elif cmd == "gen":
        run_gen(int(sys.argv[2]) if len(sys.argv) > 2 else 25_000_000)
    elif cmd == "plans":
        run_plans(sys.argv[2:] or HEADLINE,
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plans", "r09"))
    else:
        raise SystemExit(f"unknown command {cmd}")
