"""The north-rule ship shape: the job runs via ``spark-submit --py-files``
with the engine shipped as a zip — no repo checkout on the workers.

Builds the zip exactly as the job header documents, drains a WAL with
``jobs/apply_stream_job.py`` in a clean subprocess (cwd outside the repo,
PYTHONPATH scrubbed, so every engine import resolves from the zip), then
compares the final table state to the oracle replay."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pandas as pd
import pytest

from rockefeller_spark import gen
from rockefeller_spark.lake import LakeTable
from rockefeller_spark.merge import read_state
from rockefeller_spark.oracle import replay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(path: str) -> str:
    pkg = os.path.join(REPO, "rockefeller_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_py_files_ship_and_drain(spark, tmp_path):
    ev = gen.gen_change_events(spark, n_events=8000, n_convs=40, seed=77)
    wal = str(tmp_path / "wal")
    ev.write.parquet(wal)
    zip_path = _build_zip(str(tmp_path / "rockefeller_spark.zip"))
    table_dir = str(tmp_path / "lake")

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_GRAFT_SF_DIR")}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "apply_stream_job.py"),
         "--source", wal, "--table", table_dir,
         "--checkpoint", str(tmp_path / "ckpt"),
         "--quarantine", str(tmp_path / "q"),
         "--n-buckets", "8", "--mode", "mor"],
        cwd=str(tmp_path),                 # NOT the repo: imports = the zip
        env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]

    got = (read_state(LakeTable.load(spark, table_dir)).toPandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    want = replay(ev.toPandas())
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
