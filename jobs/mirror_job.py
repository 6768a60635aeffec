"""spark-submit entrypoint for CDC chaining — pump a source table's change
feed into a derived (mirror) LakeTable exactly-once (``feed.sync_mirror``).
Run it on a schedule (``jobs/scheduler.py``) or after each ingest drain;
offsets live in the source table's durable consumer-group cursor, so the
job is stateless and safe to rerun or run late.

    spark-submit --py-files /tmp/rockefeller_spark.zip \\
        jobs/mirror_job.py --src /path/to/lake --dst /path/to/mirror \\
        --consumer indexer [--mode cow|mor] [--max-windows N] \\
        [--start-at oldest|current] [--create]

Prints one JSON line ({"windows", "rows", "dst_version"}) for the
scheduler's logs.
"""

from __future__ import annotations

import argparse
import json

from rockefeller_spark import profiles
from rockefeller_spark.feed import sync_mirror
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--consumer", required=True,
                    help="consumer-group id; offsets persist under the "
                         "SOURCE table's metadata/cursors/<id>")
    ap.add_argument("--mode", choices=("cow", "mor"), default="cow")
    ap.add_argument("--max-windows", type=int, default=None)
    ap.add_argument("--start-at", choices=("oldest", "current"),
                    default="oldest")
    ap.add_argument("--create", action="store_true",
                    help="create the mirror table (source's schema and "
                         "bucket count) if it does not exist yet")
    profiles.add_cli_args(ap)
    args = ap.parse_args()

    prof = profiles.configure_job(args, "mirror_job")
    args.src = profiles.resolve_path(prof, args.src)
    args.dst = profiles.resolve_path(prof, args.dst)

    spark = get_spark("rockefeller-mirror", master=None)
    src = LakeTable.load(spark, args.src)
    if args.create and not LakeTable.exists(args.dst):
        s = src.current()
        dst = LakeTable.create(spark, args.dst, s.schema,
                               n_buckets=s.n_buckets,
                               bucket_col=s.bucket_col)
    else:
        dst = LakeTable.load(spark, args.dst)
    out = sync_mirror(src, dst, args.consumer, mode=args.mode,
                      max_windows=args.max_windows, start_at=args.start_at)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
