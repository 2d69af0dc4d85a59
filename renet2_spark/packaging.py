"""Cluster packaging: build the --py-files zip.

north_rule: "runs via spark-submit --py-files on a multi-executor
cluster". The zip contains the renet2_spark package only; drivers ship
it with `spark-submit --py-files renet2_spark.zip job.py ...` (see
scripts/submit_edges.py and tests/test_submit.py, which runs a real
spark-submit against the zip with no repo on sys.path).
"""

from __future__ import annotations

import os
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out_path
