"""Decompose the streaming micro-batch's scaling behaviour (round 8).

The stream scaling pair (BENCH/BASELINE.md) misses the 0.8 bar while the
batch pair clears it; per-batch driver work is measured at ~10 ms, so the
gap is inside the ONE Spark job each micro-batch runs (scan → LWW shuffle
→ delta write). This harness times those pieces SEPARATELY on the exact
bench_stream batch shape, at two parallelism levels in fresh processes,
so the non-scaling component is attributed by measurement instead of
hypothesis:

  scan     — full decode of the batch's WAL files (no shuffle, no write)
  shuffle  — scan + within-batch LWW dedupe, winners materialized via an
             aggregate (no write)
  apply    — the real thing: apply_batch(mode="mor") incl. delta write +
             commit (dedupe and raw-append variants)
  drain    — the full 8-micro-batch availableNow stream over the same
             events (trigger/checkpoint overhead = wall − Σ batch walls)

Usage:  python bench/stream_decomp.py [--events 6250000] [--cpus 2,8]
        (one batch's worth of events; the drain leg multiplies by 8)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one_level(cpus: int, events: int, wal: str, drain_wal: str,
               repeats: int) -> dict:
    from rockefeller_spark import gen  # noqa: F401 (session confs)
    from rockefeller_spark.lake import LakeTable
    from rockefeller_spark.merge import apply_batch
    from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
    from rockefeller_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("stream-decomp", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4,
                      extra_confs={
                          "spark.driver.memory": "48g",
                          "spark.sql.files.maxPartitionBytes": "64m",
                          "spark.driver.extraJavaOptions":
                          "-XX:+UseParallelGC"})
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="rk-decomp-")
    out: dict = {"cpus": cpus, "events": events}

    def best(fn, n=repeats):
        walls = []
        for _ in range(n):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        return min(walls), walls

    ev = spark.read.parquet(wal)

    # full decode, no shuffle/write (sum(length) defeats count-only scans)
    out["scan_sec"], out["scan_walls"] = best(
        lambda: ev.select(F.sum(F.length("text"))).collect())

    # scan + the within-batch LWW reduce, winners materialized, no write
    def _shuffle():
        from rockefeller_spark.cdc import dedupe_lww, winners_to_stored
        w = dedupe_lww(winners_to_stored(ev), order_col="_lsn")
        w.select(F.sum(F.length("text")), F.count(F.lit(1))).collect()
    out["shuffle_sec"], out["shuffle_walls"] = best(_shuffle)

    # the real micro-batch job: MOR apply (dedupe vs raw-append)
    for name, dedupe in (("apply_dedupe", True), ("apply_raw", False)):
        walls = []
        timings = []
        for r in range(repeats):
            tdir = os.path.join(work, f"t-{name}-{r}")
            t = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                                 n_buckets=256)
            t0 = time.time()
            res = apply_batch(t, ev, stream_id="d", epoch=0, mode="mor",
                              dedupe_batch=dedupe)
            walls.append(round(time.time() - t0, 3))
            timings.append(res.timings)
            shutil.rmtree(tdir, ignore_errors=True)
        out[f"{name}_sec"] = min(walls)
        out[f"{name}_walls"] = walls
        out[f"{name}_timings"] = timings[walls.index(min(walls))]

    # the full availableNow drain (8 micro-batches over 8x the events)
    if drain_wal:
        from rockefeller_spark.maintenance import CompactionPolicy
        from rockefeller_spark.stream import drain
        policy = CompactionPolicy(max_delta_files=100_000,
                                  max_delta_row_fraction=2.0,
                                  expire_keep_last=8,
                                  orphan_sweep_every_s=1e9)
        files_per_seg = max(6, spark.sparkContext.defaultParallelism)
        tdir, ckpt = os.path.join(work, "t-drain"), os.path.join(work, "ck")
        t = LakeTable.create(spark, tdir, STORED_TRANSCRIPT_SCHEMA,
                             n_buckets=256)
        batch_timings: list = []
        t0 = time.time()
        drain(spark, drain_wal, t, ckpt, mode="mor",
              max_files_per_trigger=files_per_seg, compaction=policy,
              timings=batch_timings)
        out["drain_sec"] = round(time.time() - t0, 3)
        out["drain_batches"] = len(batch_timings)
        out["drain_batch_total_s"] = round(
            sum(r["batch_total_s"] for r in batch_timings), 3)
        out["drain_stage_s"] = round(
            sum(r.get("stage_s", 0) for r in batch_timings), 3)
        out["drain_trigger_gap_s"] = round(
            out["drain_sec"] - out["drain_batch_total_s"], 3)

    shutil.rmtree(work, ignore_errors=True)
    print("DECOMP " + json.dumps(out))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=6_250_000)
    ap.add_argument("--cpus", type=str, default="2,8")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--drain", action="store_true",
                    help="also run the 8-batch availableNow drain leg")
    ap.add_argument("--_level", type=int, default=None)  # internal
    ap.add_argument("--_wal", type=str, default=None)
    ap.add_argument("--_drain_wal", type=str, default="")
    args = ap.parse_args()

    if args._level is not None:
        _one_level(args._level, args.events, args._wal, args._drain_wal,
                   args.repeats)
        return

    # build the inputs ONCE (separate session, bench_stream's exact shape)
    from rockefeller_spark import gen
    from rockefeller_spark.session import get_spark
    work = tempfile.mkdtemp(prefix="rk-decomp-wal-")
    wal = os.path.join(work, "batch")
    drain_wal = os.path.join(work, "drain") if args.drain else ""
    spark = get_spark("decomp-gen", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_total = args.events * 8
    ev = gen.gen_change_events(spark, n_events=args.events,
                               n_convs=max(1000, n_total // 200),
                               max_turns=50, seed=48, num_partitions=8)
    ev.write.mode("overwrite").parquet(wal)
    if drain_wal:
        big = gen.gen_change_events(spark, n_events=n_total,
                                    n_convs=max(1000, n_total // 200),
                                    max_turns=50, seed=48,
                                    num_partitions=8 * 32)
        big.write.mode("overwrite").parquet(drain_wal)
    spark.stop()
    time.sleep(15)                      # let the JVM fully exit (box gotcha)

    levels = [int(c) for c in args.cpus.split(",")]
    results: dict[int, list[dict]] = {n: [] for n in levels}
    for _ in range(2):                  # interleaved best-of-2 processes
        for n in levels:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--events", str(args.events),
                   "--repeats", str(args.repeats),
                   "--_level", str(n), "--_wal", wal,
                   "--_drain_wal", drain_wal]
            env = dict(os.environ, PYTHONPATH=REPO)
            p = subprocess.run(cmd, env=env, capture_output=True, text=True)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("DECOMP ")]
            if not line:
                print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"level {n} failed")
            results[n].append(json.loads(line[-1][len("DECOMP "):]))
            time.sleep(10)

    # best-of per metric, then efficiency table
    keys = [k for k in results[levels[0]][0] if k.endswith("_sec")]
    best = {n: {k: min(r[k] for r in rs) for k in keys if k in rs[0]}
            for n, rs in results.items()}
    print(json.dumps({"best": best}, indent=2))
    if len(levels) == 2:
        lo, hi = levels
        ratio = hi // lo
        print(f"\ncomponent scaling {lo}->{hi} cores "
              f"(efficiency = wall_lo / (ratio * wall_hi)):")
        for k in keys:
            if k in best[lo] and k in best[hi]:
                eff = best[lo][k] / (ratio * best[hi][k]) \
                    if best[hi][k] else float("nan")
                print(f"  {k:>18}: {best[lo][k]:8.2f}s -> "
                      f"{best[hi][k]:8.2f}s   eff {eff:.3f}")


if __name__ == "__main__":
    main()
