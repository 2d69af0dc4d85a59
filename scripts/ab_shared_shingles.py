#!/usr/bin/env python
"""A/B (r5 verdict #7): the two headline dedup queries each explode
the corpus into shingles and re-run the df-cap shuffle. Variant
'shared' materializes ONE df-capped (doc_id, shingle) relation to
parquet (on /dev/shm, like the curation_pipeline stage table that won
-31% in r5) and feeds jaccard's main path and minhash's verify path
from it; the materialization time is charged to the variant. Variants
are interleaved (current/shared/current/shared) against the sandbox's
progressive throttling; per-variant minimum reported.

Usage: python scripts/ab_shared_shingles.py [sf_dir] [cpus] [rounds]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from renet2_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    df_capped_shingles,
    doc_shingles,
)
from renet2_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(
        app_name="ab_shared_shingles",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run_current() -> tuple[float, int, int]:
        t0 = time.perf_counter()
        nj = dedup_ngram_jaccard(docs).count()
        nm = dedup_minhash_lsh(docs).count()
        return time.perf_counter() - t0, nj, nm

    def run_shared() -> tuple[float, int, int]:
        root = tempfile.mkdtemp(prefix="ab_sh_", dir="/dev/shm")
        t0 = time.perf_counter()
        capped = df_capped_shingles(doc_shingles(docs))
        capped.write.mode("overwrite").parquet(f"{root}/shingles")
        shared = spark.read.parquet(f"{root}/shingles")
        nj = dedup_ngram_jaccard(
            docs, max_shingle_docs=None, shingles=shared
        ).count()
        nm = dedup_minhash_lsh(
            docs, max_shingle_docs=None, shingles=shared
        ).count()
        dt = time.perf_counter() - t0
        shutil.rmtree(root, ignore_errors=True)
        return dt, nj, nm

    # warm lap at smoke scale (JIT)
    smoke = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dedup_ngram_jaccard(smoke).count()
    dedup_minhash_lsh(smoke).count()

    # result equivalence before timing anything
    a = sorted(map(tuple, dedup_ngram_jaccard(docs).collect()))
    root = tempfile.mkdtemp(prefix="ab_eq_", dir="/dev/shm")
    df_capped_shingles(doc_shingles(docs)).write.mode("overwrite").parquet(
        f"{root}/sh"
    )
    shared = spark.read.parquet(f"{root}/sh")
    b = sorted(
        map(
            tuple,
            dedup_ngram_jaccard(
                docs, max_shingle_docs=None, shingles=shared
            ).collect(),
        )
    )
    assert a == b, "jaccard results diverge under shared shingles"
    c = sorted(map(tuple, dedup_minhash_lsh(docs).collect()))
    d = sorted(
        map(
            tuple,
            dedup_minhash_lsh(
                docs, max_shingle_docs=None, shingles=shared
            ).collect(),
        )
    )
    assert c == d, "minhash results diverge under shared shingles"
    shutil.rmtree(root, ignore_errors=True)

    cur, shr = [], []
    for _ in range(rounds):
        cur.append(run_current())
        shr.append(run_shared())
    best_c = min(t for t, _, _ in cur)
    best_s = min(t for t, _, _ in shr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "current_sec": [round(t, 3) for t, _, _ in cur],
                "shared_sec": [round(t, 3) for t, _, _ in shr],
                "best_current": round(best_c, 3),
                "best_shared": round(best_s, 3),
                "delta_pct": round(100.0 * (best_c - best_s) / best_c, 1),
                "rows": {"jaccard": cur[0][1], "minhash": cur[0][2]},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
