"""N vs 4N scaling harness (the sandbox realization of the north rule's
two-cluster-size criterion — see BASELINE.md).

Runs the identical CDC-apply job (same deterministic input, same code)
in two fresh processes at local[8] (N) and local[32] (4N cores), and
writes throughput at both plus scaling efficiency to BENCH/BASELINE.md.

    python bench/scaling.py [--events 2000000] [--n 8] [--xn 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, events: int, batches: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_EVENTS=str(events),
               BENCH_BATCHES=str(batches),
               BENCH_APPLY_ONLY="1",
               PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    args = ap.parse_args()

    r_n = run_at(args.n, args.events, args.batches)
    r_xn = run_at(args.xn, args.events, args.batches)
    tp_n = r_n["cdc"]["events_per_sec"]
    tp_xn = r_xn["cdc"]["events_per_sec"]
    factor = args.xn / args.n
    eff = tp_xn / (factor * tp_n)

    md = f"""# BENCH — N vs 4N scaling evidence

Same job, same deterministic input ({args.events:,} change events,
{args.batches} micro-batches, Zipf-skewed conv_id, duplicate LSNs,
tombstones, out-of-order delivery), run at two parallelism levels in
fresh processes (the sandbox stand-in for two cluster sizes — see
BASELINE.md "Sandbox realization").

| config | cores | apply wall (s) | events/sec |
|---|---|---|---|
| N  | {args.n}  | {r_n['cdc']['apply_sec']}  | {tp_n:,.0f} |
| 4N | {args.xn} | {r_xn['cdc']['apply_sec']} | {tp_xn:,.0f} |

**Scaling efficiency = throughput(4N) / ({factor:.0f} x throughput(N))
= {eff:.3f}** (target ≥ 0.8).

Raw JSON:

```json
{json.dumps(r_n)}
{json.dumps(r_xn)}
```
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(md)
    print(md)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
