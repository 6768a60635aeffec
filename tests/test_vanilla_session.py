"""Vanilla-session registry gate (round-7 VERDICT item 2).

The round-6 driver gate failed ``cdc_time_pruned_read`` because the
engine assumed a conf its own sessions pin
(``spark.sql.parquet.outputTimestampType``) that the driver's vanilla
session does not supply. This gate runs EVERY registry query on a bare
``SparkSession.builder.master("local[4]")`` session in a subprocess
(a second in-process session would inherit the test session's SparkConf
via ``getOrCreate``/``newSession``, defeating the point), so the next
conf-dependence bug fails here before it fails at the driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"
RUNNER = os.path.join(os.path.dirname(__file__), "vanilla_gate_runner.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_registry_queries_run_on_vanilla_session():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, RUNNER, SF], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1800)
    marker = [ln for ln in proc.stdout.splitlines()
              if ln.startswith("VANILLA_GATE_JSON:")]
    assert marker, (
        f"gate subprocess produced no result line\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}")
    result = json.loads(marker[-1].split(":", 1)[1])
    assert result["ran"] >= 25
    assert not result["failed"], (
        f"registry queries failed under a vanilla session: "
        f"{result['failed']}\nstderr:\n{proc.stderr[-6000:]}")
    assert proc.returncode == 0
