"""Subprocess body of the vanilla-session registry gate (see
``test_vanilla_session.py``): build a BARE SparkSession — none of the
engine confs from ``rockefeller_spark.session`` — and execute every
registry query at the given scale factor. Catches the bug class the
round-6 driver gate exposed: engine code that silently depends on a
conf the engine's own sessions pin (e.g. parquet timestamp physical
type INT96 vs TIMESTAMP_MICROS — INT96 columns carry no parquet stats,
so min/max file-bound stamping degrades to a no-op under a foreign
session).

Runs standalone: ``python tests/vanilla_gate_runner.py /root/testdata/sf0.001``.
Prints one ``VANILLA_GATE_JSON:{...}`` line the pytest wrapper parses.
"""

from __future__ import annotations

import json
import sys
import traceback


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    from pyspark.sql import SparkSession
    # deliberately NO engine confs: this is the driver's-eye view
    spark = (SparkSession.builder.master("local[4]")
             .appName("rk-vanilla-gate").getOrCreate())
    from rockefeller_spark.registry import QUERIES
    names = only or sorted(QUERIES)
    fails: dict[str, str] = {}
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            df.count()          # execute the full plan (incl. in-query asserts)
        except Exception:
            fails[name] = traceback.format_exc(limit=12)
    print("VANILLA_GATE_JSON:" + json.dumps(
        {"ran": len(names), "failed": sorted(fails)}))
    for name, tb in fails.items():
        print(f"--- {name} ---\n{tb}", file=sys.stderr)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
