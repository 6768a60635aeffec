"""spark-submit entrypoint: the production shape of the engine.

Ship the package and run the WAL tail on any cluster size — the SAME code
the tests and bench run locally:

    cd /root/repo && zip -r /tmp/rockefeller_spark.zip rockefeller_spark
    spark-submit --py-files /tmp/rockefeller_spark.zip \\
        --master <cluster> --num-executors <N> \\
        jobs/apply_stream_job.py \\
        --source /path/to/wal --table /path/to/lake \\
        --checkpoint /path/to/ckpt [--continuous] [--n-buckets 4096]

Batch catch-up by default (drain + exit, cron/Airflow-friendly — the
reference's daily-DAG intent, /root/reference/airflow/dags/daily_dag.py);
``--continuous`` keeps tailing with ``--max-files-per-trigger`` pacing.
"""

from __future__ import annotations

import argparse

from rockefeller_spark import profiles
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.metrics import MetricsLog
from rockefeller_spark.schema import STORED_TRANSCRIPT_SCHEMA
from rockefeller_spark.session import get_spark
from rockefeller_spark.stream import run_stream


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="WAL directory (parquet)")
    ap.add_argument("--table", required=True, help="icelake table path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--quarantine", default=None,
                    help="dead-letter table dir (default <table>/quarantine)")
    ap.add_argument("--n-buckets", type=int, default=256,
                    help="key buckets for a NEW table (size to ~target "
                         "parallelism; thousands at 10^10 rows)")
    ap.add_argument("--write-salt", type=int, default=4)
    ap.add_argument("--mode", choices=["cow", "mor"], default="cow",
                    help="apply strategy: copy-on-write (rewrite touched "
                         "buckets; plain-scan reads) or merge-on-read "
                         "(append deltas, O(batch) apply; reads resolve "
                         "LWW until compaction)")
    ap.add_argument("--retries", type=int, default=0,
                    help="optimistic-concurrency recompute attempts per "
                         "batch. REQUIRED > 0 when more than one writer "
                         "targets the table (a second stream, a separate "
                         "maintain_job worker): a losing commit first "
                         "tries the metadata-only rebase, then recomputes "
                         "up to this many times. Single-writer "
                         "deployments keep 0 (fail fast)")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=64)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--no-maintenance", action="store_true",
                    help="disable the per-batch CompactionPolicy (auto "
                         "compact + snapshot expiry). Without it a MOR "
                         "stream accumulates delta files without bound")
    ap.add_argument("--compact-max-delta-files", type=int, default=8)
    ap.add_argument("--compact-delta-fraction", type=float, default=0.25)
    ap.add_argument("--expire-keep-last", type=int, default=8)
    profiles.add_cli_args(ap)
    args = ap.parse_args()

    # --env / $ROCKEFELLER_ENV: credentials, warehouse root and commit
    # backend come from the profile; the 'user' tier refuses write jobs
    prof = profiles.configure_job(args, "apply_stream_job")
    args.table = profiles.resolve_path(prof, args.table)
    args.checkpoint = profiles.resolve_path(prof, args.checkpoint)
    args.source = profiles.resolve_path(prof, args.source)

    # master/executors come from spark-submit; only engine confs set here
    spark = get_spark("rockefeller-apply-stream", master=None)

    if LakeTable.exists(args.table):
        table = LakeTable.load(spark, args.table)
    else:
        table = LakeTable.create(spark, args.table, STORED_TRANSCRIPT_SCHEMA,
                                 n_buckets=args.n_buckets)
    metrics = MetricsLog(args.metrics) if args.metrics else None

    policy = None
    if not args.no_maintenance:
        from rockefeller_spark.maintenance import CompactionPolicy
        policy = CompactionPolicy(
            max_delta_files=args.compact_max_delta_files,
            max_delta_row_fraction=args.compact_delta_fraction,
            expire_keep_last=args.expire_keep_last,
            write_salt=args.write_salt)

    q = run_stream(spark, args.source, table, args.checkpoint,
                   available_now=not args.continuous,
                   max_files_per_trigger=(args.max_files_per_trigger
                                          if args.continuous else None),
                   watermark=args.watermark,
                   write_salt=args.write_salt,
                   mode=args.mode,
                   retries=args.retries,
                   quarantine_dir=args.quarantine,
                   compaction=policy,
                   metrics=metrics)
    q.awaitTermination()


if __name__ == "__main__":
    main()
