"""Profile dispatch wired END-TO-END into the job CLIs (reference
parity: ``db_connect.py:103-139`` is consumed by every reference script,
not just importable). Covers the unit seam (configure_job / resolve_path)
and two subprocess drives: a prod-profile warehouse-relative maintenance
run, and the 'user'-tier refusal (read-only credentials must fail at
launch, not halfway into a batch)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from rockefeller_spark import profiles
from rockefeller_spark.backends import FakeObjectStoreBackend, PosixBackend
from rockefeller_spark.lake import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CREDS = {
    "DB_HOST": "db.internal", "DB_NAME": "cdc",
    "DB_USERNAME_PROD": "svc", "DB_PASSWORD_PROD": "p",
    "DB_USERNAME_PUBLIC": "reader", "DB_PASSWORD_PUBLIC": "u",
}


class _Args:
    def __init__(self, env=None, dotenv=None):
        self.env, self.dotenv = env, dotenv


# ------------------------------------------------------------- unit seam

def test_configure_job_legacy_mode_is_none(monkeypatch):
    """No --env and no $ROCKEFELLER_ENV: jobs run exactly as before."""
    prof = profiles.configure_job(_Args(), "j", environ={})
    assert prof is None
    assert profiles.resolve_path(None, "rel/path") == "rel/path"


def test_configure_job_refuses_user_tier_for_writes():
    with pytest.raises(profiles.ReadOnlyProfileError, match="read-only"):
        profiles.configure_job(_Args(env="user"), "apply_stream_job",
                               environ=CREDS)
    # read jobs under the same profile are fine
    prof = profiles.configure_job(_Args(env="user"), "report_job",
                                  writes=False, environ=CREDS)
    assert prof.credential_tier == "user"


def test_configure_job_activates_profile_backend(monkeypatch):
    monkeypatch.setattr(LakeTable, "backend_factory", PosixBackend)
    env = dict(CREDS, ROCKEFELLER_WAREHOUSE="s3sem:///wh/prod")
    prof = profiles.configure_job(_Args(env="prod"), "j", environ=env)
    assert LakeTable.backend_factory is FakeObjectStoreBackend
    assert profiles.resolve_path(prof, "conversations") == \
        "/wh/prod/conversations"
    assert profiles.resolve_path(prof, "/abs/table") == "/abs/table"


def test_env_var_alone_activates(monkeypatch):
    monkeypatch.setattr(LakeTable, "backend_factory", PosixBackend)
    env = dict(CREDS, ROCKEFELLER_ENV="prod",
               ROCKEFELLER_WAREHOUSE="/wh")
    prof = profiles.configure_job(_Args(), "j", environ=env)
    assert prof.env == "prod"
    assert profiles.resolve_path(prof, "t") == "/wh/t"


# ------------------------------------------------------ subprocess drives

def _run_job(job, argv, extra_env, cwd, timeout=300):
    env = {k: v for k, v in os.environ.items() if k != "ROCKEFELLER_ENV"}
    env.update(extra_env)
    env["PYTHONPATH"] = REPO
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", job), *argv],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout)


def test_user_tier_refusal_in_cli(tmp_path):
    """The refusal happens at launch (before any Spark session)."""
    proc = _run_job("maintain_job.py",
                    ["--table", "conversations", "--env", "user"],
                    dict(CREDS, ROCKEFELLER_WAREHOUSE=str(tmp_path)),
                    cwd=str(tmp_path), timeout=120)
    assert proc.returncode != 0
    assert "read-only" in proc.stderr


def test_profile_selected_warehouse_drive(spark, tmp_path):
    """--env prod + $ROCKEFELLER_WAREHOUSE: the job finds the table by
    its BARE name under the profile's warehouse and maintains it."""
    from rockefeller_spark import gen
    from rockefeller_spark.merge import apply_batch

    wh = tmp_path / "wh"
    wh.mkdir()
    t = LakeTable.create(spark, str(wh / "conversations"),
                         __import__("rockefeller_spark.schema",
                                    fromlist=["s"]).STORED_TRANSCRIPT_SCHEMA,
                         n_buckets=4)
    apply_batch(t, gen.gen_change_events(spark, n_events=500, n_convs=5,
                                         seed=31))

    proc = _run_job(
        "maintain_job.py",
        ["--table", "conversations", "--env", "prod", "--keep-last", "1"],
        dict(CREDS, ROCKEFELLER_WAREHOUSE=str(wh)),
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["table"] == str(wh / "conversations")
    assert out["stats"]["rows"] > 0
