"""jobs/scheduler.py policy tests — injected clock, no Spark, no wall
time. The scheduler is the reference's daily-DAG intent realized
(``airflow/dags/daily_dag.py`` is a placeholder); what matters at fleet
scale is the POLICY: deterministic jitter (no thundering herd), missed-
tick collapse (one backlog, one run), failure backoff that never kills
the loop, and strict serialization of drain-vs-maintain."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
from scheduler import Job, Scheduler  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def _quiet(rec):
    pass


def test_due_jobs_run_in_due_order_and_reschedule():
    clock = FakeClock()
    ran = []
    s = Scheduler([Job("b", 100.0, lambda: ran.append("b"), jitter_frac=0),
                   Job("a", 50.0, lambda: ran.append("a"), jitter_frac=0)],
                  clock=clock, log=_quiet)
    assert s.run_pending() == 2          # both due at t0 (jitter 0)
    clock.advance(60)                    # only "a" due again
    assert s.run_pending() == 1
    assert ran == ["b", "a", "a"] or ran == ["a", "b", "a"]
    clock.advance(50)                    # now "b" (t0+100) and "a" again
    assert s.run_pending() == 2


def test_missed_ticks_collapse_to_one_run():
    clock = FakeClock()
    ran = []
    s = Scheduler([Job("drain", 10.0, lambda: ran.append(1),
                       jitter_frac=0)], clock=clock, log=_quiet)
    s.run_pending()
    clock.advance(95)                    # 9 intervals missed
    assert s.run_pending() == 1          # ONE catch-up run, not 9
    st = s.state["drain"]
    assert st.next_due == pytest.approx(clock() + 10.0)


def test_failure_backs_off_exponentially_and_recovers():
    clock = FakeClock()
    boom = [True]

    def job():
        if boom[0]:
            raise RuntimeError("db down")
        return "ok"

    s = Scheduler([Job("j", 100.0, job, jitter_frac=0, backoff_s=30.0)],
                  clock=clock, log=_quiet)
    s.run_pending()
    st = s.state["j"]
    assert st.consecutive_failures == 1
    assert st.next_due == pytest.approx(clock() + 30.0)   # not +100
    clock.advance(30)
    s.run_pending()
    assert st.consecutive_failures == 2
    assert st.next_due == pytest.approx(clock() + 60.0)   # doubled
    boom[0] = False
    clock.advance(60)
    s.run_pending()                      # recovery resets the ladder
    assert st.consecutive_failures == 0 and st.last_error is None
    assert st.last_result == "ok"
    assert st.next_due == pytest.approx(clock() + 100.0)
    assert st.failures == 2 and st.runs == 3


def test_one_job_failing_never_starves_the_other():
    clock = FakeClock()
    ran = []
    s = Scheduler([
        Job("bad", 10.0, lambda: 1 / 0, jitter_frac=0, backoff_s=5.0),
        Job("good", 10.0, lambda: ran.append(1), jitter_frac=0),
    ], clock=clock, log=_quiet)
    for _ in range(5):
        s.run_pending()
        clock.advance(10)
    assert len(ran) >= 5
    assert s.state["bad"].failures >= 4


def test_jitter_is_deterministic_and_bounded():
    j = Job("drain", 300.0, lambda: None, jitter_frac=0.05)
    vals = [j.jitter(t) for t in range(20)]
    assert vals == [j.jitter(t) for t in range(20)]       # restart-stable
    assert all(0 <= v < 0.05 * 300.0 for v in vals)
    assert len(set(vals)) > 10                            # actually spreads
    # two tables' same-named-tick jitters differ (fleet de-phasing)
    assert Job("drain-t2", 300.0, lambda: None).jitter(0) != j.jitter(0)


def test_stop_halts_run_forever():
    clock = FakeClock()
    calls = []

    def sleeper(s):
        calls.append(s)
        clock.advance(s)
        if len(calls) > 3:
            sched.stop()

    sched = Scheduler([Job("j", 50.0, lambda: None, jitter_frac=0)],
                      clock=clock, sleep=sleeper, log=_quiet)
    sched.run_forever()                  # returns instead of spinning
    assert sched.state["j"].runs >= 1


def test_duplicate_names_rejected():
    with pytest.raises(ValueError):
        Scheduler([Job("x", 1.0, lambda: None),
                   Job("x", 2.0, lambda: None)], log=_quiet)
