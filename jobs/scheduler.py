"""Interval scheduler for the engine's periodic jobs — the sandbox
realization of the reference's daily-DAG intent
(``/root/reference/airflow/dags/daily_dag.py:1-3``, a placeholder that
never wired tasks; ``README.md:68``).

A production fleet schedules two recurring jobs per table:

- **drain** (``apply_stream_job.py`` without ``--continuous``, or
  ``catchup.catch_up`` for a Source with no file tail): pick up whatever
  the WAL accumulated and exit;
- **maintain** (``maintain_job.py``): compaction + snapshot expiry off
  the ingest path.

This module is the loop that runs them when no Airflow exists: fixed
intervals with deterministic per-job jitter (a fleet of tables must not
thundering-herd the object store on the hour), missed-tick collapse (a
drain that overran three intervals runs ONCE, then reschedules from now
— the backlog is one backlog), per-job exponential backoff on failure
(the loop never dies with a job), and graceful SIGTERM. The clock and
sleep are injected so the policy is tested without wall time or Spark.

Concurrency: one job at a time, on purpose. apply-vs-maintain races are
SAFE (commit rebase + the maintenance lock) but cost recomputes;
serializing them in the scheduler makes the steady state conflict-free
while the engine-level guards keep correctness when a second fleet
worker exists anyway.

    python jobs/scheduler.py --table /path/to/lake --source /path/to/wal \\
        --checkpoint /path/to/ckpt --drain-every 300 --maintain-every 3600
"""

from __future__ import annotations

import argparse
import hashlib
import json
import signal
import subprocess
import sys
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Job:
    """One recurring job. ``fn`` raising marks a failure (logged,
    backed off, retried); its return value lands in the run log."""

    name: str
    interval_s: float
    fn: Callable[[], Any]
    jitter_frac: float = 0.05
    backoff_s: float = 30.0          # first retry delay after a failure
    backoff_cap_s: float = 1800.0

    def jitter(self, tick: int) -> float:
        """Deterministic jitter in [0, jitter_frac*interval): a pure
        function of (name, tick) so restarts don't re-roll the phase."""
        if self.jitter_frac <= 0:
            return 0.0
        h = hashlib.md5(f"{self.name}:{tick}".encode()).digest()
        u = int.from_bytes(h[:8], "big") / 2**64
        return u * self.jitter_frac * self.interval_s


@dataclass
class _JobState:
    next_due: float
    tick: int = 0
    runs: int = 0
    failures: int = 0
    consecutive_failures: int = 0
    last_error: str | None = None
    last_wall_s: float | None = None
    last_result: Any = None


class Scheduler:
    def __init__(self, jobs: list[Job], *,
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] | None = None,
                 log: Callable[[dict], None] | None = None):
        if len({j.name for j in jobs}) != len(jobs):
            raise ValueError("job names must be unique")
        self.jobs = list(jobs)
        self.clock = clock
        self._stop = threading.Event()
        self._sleep = sleep or (lambda s: self._stop.wait(timeout=s))
        self._log = log or (lambda rec: print(json.dumps(rec), flush=True))
        now = self.clock()
        self.state: dict[str, _JobState] = {
            j.name: _JobState(next_due=now + j.jitter(0)) for j in jobs}

    def stop(self) -> None:
        self._stop.set()

    def _run_one(self, job: Job, st: _JobState) -> None:
        t0 = self.clock()
        try:
            st.last_result = job.fn()
            st.consecutive_failures = 0
            st.last_error = None
        except Exception as e:
            st.failures += 1
            st.consecutive_failures += 1
            st.last_error = f"{type(e).__name__}: {e}"
        st.runs += 1
        st.tick += 1
        st.last_wall_s = self.clock() - t0
        now = self.clock()
        if st.consecutive_failures:
            # exponential backoff, capped — a persistently failing job
            # slows down PAST its interval rather than hammering a broken
            # dependency on schedule
            delay = min(job.backoff_cap_s,
                        job.backoff_s * 2 ** (st.consecutive_failures - 1))
            st.next_due = now + delay
        else:
            # missed-tick collapse: schedule from NOW, not from the
            # missed slots — an overrun drain has one backlog, not k
            st.next_due = now + job.interval_s + job.jitter(st.tick)
        self._log({"job": job.name, "ok": st.last_error is None,
                   "wall_s": round(st.last_wall_s, 3),
                   "consecutive_failures": st.consecutive_failures,
                   "error": st.last_error,
                   "next_due_in_s": round(st.next_due - now, 3)})

    def run_pending(self) -> int:
        """Run every job whose due time has passed (in due order).
        Returns how many ran — the unit the tests drive directly."""
        ran = 0
        while not self._stop.is_set():
            now = self.clock()
            due = [(st.next_due, j.name, j) for j in self.jobs
                   if (st := self.state[j.name]).next_due <= now]
            if not due:
                return ran
            due.sort()
            _, _, job = due[0]
            self._run_one(job, self.state[job.name])
            ran += 1
        return ran

    def seconds_until_next(self) -> float:
        return max(0.0, min(st.next_due for st in self.state.values())
                   - self.clock())

    def run_forever(self) -> None:
        while not self._stop.is_set():
            if not self.run_pending():
                self._sleep(min(60.0, max(0.05, self.seconds_until_next())))


def _subprocess_job(argv: list[str]) -> Callable[[], Any]:
    def run() -> dict:
        p = subprocess.run(argv, capture_output=True, text=True)
        if p.returncode != 0:
            raise RuntimeError(
                f"exit {p.returncode}: {p.stderr.strip()[-500:]}")
        return {"stdout_tail": p.stdout.strip()[-500:]}
    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--drain-every", type=float, default=300.0)
    ap.add_argument("--maintain-every", type=float, default=3600.0)
    ap.add_argument("--mode", choices=["cow", "mor"], default="mor")
    ap.add_argument("--retries", type=int, default=2,
                    help="apply retries: the maintain worker is a second "
                         "writer, so the drain must tolerate losing a race")
    from rockefeller_spark import profiles
    profiles.add_cli_args(ap)
    args = ap.parse_args()

    py = sys.executable
    here = __file__.rsplit("/", 1)[0]
    # the profile flags pass THROUGH to the child jobs (each resolves and
    # enforces the tier itself — the scheduler holds no credentials)
    prof_argv = ["--env", args.env] if args.env else []
    if args.dotenv != ".env":
        prof_argv += ["--dotenv", args.dotenv]
    drain = _subprocess_job([
        py, f"{here}/apply_stream_job.py", "--source", args.source,
        "--table", args.table, "--checkpoint", args.checkpoint,
        "--mode", args.mode, "--retries", str(args.retries),
        "--no-maintenance", *prof_argv])
    maintain = _subprocess_job([
        py, f"{here}/maintain_job.py", "--table", args.table, *prof_argv])

    sched = Scheduler([
        Job("drain", args.drain_every, drain),
        Job("maintain", args.maintain_every, maintain),
    ])
    signal.signal(signal.SIGTERM, lambda *_: sched.stop())
    signal.signal(signal.SIGINT, lambda *_: sched.stop())
    sched.run_forever()


if __name__ == "__main__":
    main()
