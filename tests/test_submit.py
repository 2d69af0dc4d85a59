"""Real spark-submit --py-files run (north_rule packaging contract):
the job script resolves renet2_spark ONLY from the shipped zip — the
subprocess runs from a foreign cwd with no repo on sys.path/PYTHONPATH."""

import os
import subprocess
import sys

import pyspark

from renet2_spark.packaging import build_pyfiles_zip
from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    zpath = build_pyfiles_zip(str(tmp_path / "renet2_spark.zip"))
    out = str(tmp_path / "edges_out")
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "submit_edges.py"),
            "--input", f"{SF_SMOKE}/documents.parquet",
            "--output", out,
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SUBMIT_OK rows=285" in r.stdout, r.stdout[-2000:]


def test_spark_submit_pyfiles_multi_executor(tmp_path):
    """north_rule literal: 'runs via spark-submit --py-files on a
    multi-executor cluster' — same job, but on local-cluster[2,2,2048]
    (two separate executor JVMs with their own BlockManagers); the
    shipped zip must reach the executor python workers too."""
    zpath = build_pyfiles_zip(str(tmp_path / "renet2_spark.zip"))
    out = str(tmp_path / "edges_out_mc")
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            submit, "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.executor.memory=1536m",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "submit_edges.py"),
            "--input", f"{SF_SMOKE}/documents.parquet",
            "--output", out,
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=480,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SUBMIT_OK rows=285" in r.stdout, r.stdout[-2000:]
