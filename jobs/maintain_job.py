"""spark-submit entrypoint for table maintenance — the cron/Airflow-shaped
counterpart to the in-stream CompactionPolicy (a fleet typically runs BOTH:
the stream loop keeps delta counts bounded batch-to-batch; a scheduled
maintenance job does the heavier periodic work off the ingest path).

    spark-submit --py-files /tmp/rockefeller_spark.zip \\
        jobs/maintain_job.py --table /path/to/lake \\
        [--max-delta-files 8] [--delta-fraction 0.25] \\
        [--max-bucket-files 8] [--keep-last 8] [--orphan-grace-s 3600] \\
        [--rescale-buckets N] [--rollback SNAPSHOT_ID]

Prints one JSON line of what was done (compactions, expiry stats) for the
scheduler's logs.
"""

from __future__ import annotations

import argparse
import json

from rockefeller_spark import profiles
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.maintenance import CompactionPolicy, maintain
from rockefeller_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--max-delta-files", type=int, default=8)
    ap.add_argument("--delta-fraction", type=float, default=0.25)
    ap.add_argument("--max-bucket-files", type=int, default=8)
    ap.add_argument("--max-fragmented-buckets", type=int, default=4)
    ap.add_argument("--keep-last", type=int, default=8)
    ap.add_argument("--orphan-grace-s", type=float, default=3600.0)
    ap.add_argument("--drop-tombstones", action="store_true",
                    help="drop tombstones during compaction — ONLY safe "
                         "once no event older than the table high-water "
                         "mark can still arrive (operator's assertion)")
    ap.add_argument("--write-salt", type=int, default=0)
    ap.add_argument("--rescale-buckets", type=int, default=None,
                    help="also rewrite the table into this bucket count "
                         "(partition-spec evolution; full-table pass)")
    ap.add_argument("--rollback", type=int, default=None,
                    help="roll the table back to this snapshot id before "
                         "any other maintenance")
    profiles.add_cli_args(ap)
    args = ap.parse_args()

    prof = profiles.configure_job(args, "maintain_job")
    args.table = profiles.resolve_path(prof, args.table)

    spark = get_spark("rockefeller-maintain", master=None)
    table = LakeTable.load(spark, args.table)

    out: dict = {"table": args.table}
    if args.rollback is not None:
        snap = table.rollback(args.rollback)
        out["rolled_back_to"] = args.rollback
        out["new_snapshot"] = snap.snapshot_id
    if args.rescale_buckets is not None:
        snap = table.rescale_buckets(args.rescale_buckets,
                                     write_salt=args.write_salt)
        out["rescaled_to_buckets"] = args.rescale_buckets

    policy = CompactionPolicy(
        max_delta_files=args.max_delta_files,
        max_delta_row_fraction=args.delta_fraction,
        max_bucket_files=args.max_bucket_files,
        max_fragmented_buckets=args.max_fragmented_buckets,
        expire_keep_last=args.keep_last,
        orphan_grace_s=args.orphan_grace_s,
        drop_tombstones=args.drop_tombstones,
        write_salt=args.write_salt)
    out["maintenance"] = maintain(table, policy)
    out["stats"] = table.stats()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
