#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py is FROZEN for
driver measurement; extra benchmarks live here per the optimization
brief).

Modes:
  --isolate [q1,q2,...]   time queries via the noop sink (guide §1.4),
                          interleaved rounds, report all samples + min.
                          Default: the headline set.
  --plans DIR [q1,...]    write .explain('formatted') per query to
                          DIR/<query>.txt (no execution beyond planning
                          + the probe-free plan build).
  --stages QUERY          stage-level wall/task-time/shuffle bytes for
                          one query from the Spark event log.
  --all                   single timed pass over EVERY declared query
                          (checklist coverage; noop sink).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_XB_ROUNDS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "kg_edges",
    "kg_edges_neural",
    "kg_mentions",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_topk_brute",
    "text_stats",
    "fingerprint",
]


def _spark():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from renet2_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    return get_spark(
        app_name="renet2_bench_extra",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )


def _queries(spark):
    import __spark_entry__ as entry
    from renet2_spark.functions import textstats as _ts

    qs = dict(entry.queries())
    docs = lambda s, d: s.read.parquet(f"{d}/documents.parquet")
    qs.setdefault("text_stats", lambda s, d: _ts.text_stats(docs(s, d)))
    qs.setdefault("fingerprint", lambda s, d: _ts.fingerprint(docs(s, d)))
    return qs


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def isolate(names: list[str]) -> dict:
    rounds = int(os.environ.get("SPARK_GRAFT_XB_ROUNDS", "3"))
    spark = _spark()
    qs = _queries(spark)
    # warm lap (JIT + python workers) at smoke scale
    for n in names:
        _noop(qs[n](spark, "/root/testdata/sf0.001"))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"isolate:{n}")
            t0 = time.perf_counter()
            _noop(qs[n](spark, SF_DIR))
            samples[n].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        n: {"samples": samples[n], "min": min(samples[n])} for n in names
    }
    out["_total_min"] = round(sum(v["min"] for v in out.values()), 3)
    spark.stop()
    return out


def plans(outdir: str, names: list[str]) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = _queries(spark)
    for n in names:
        df = qs[n](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{n}.txt"), "w") as f:
            f.write(p)
        print(f"# wrote {outdir}/{n}.txt", file=sys.stderr)
    spark.stop()


def stages(name: str) -> dict:
    import glob
    import shutil
    import tempfile

    evdir = tempfile.mkdtemp(prefix="xbev_", dir="/dev/shm")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from renet2_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name=f"xb_stages_{name}",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = _queries(spark)
    _noop(qs[name](spark, "/root/testdata/sf0.001"))  # warm
    t_mark = time.time() * 1000
    t0 = time.perf_counter()
    _noop(qs[name](spark, SF_DIR))
    wall = round(time.perf_counter() - t0, 3)
    spark.stop()
    out = []
    for path in glob.glob(f"{evdir}/**/*", recursive=True):
        if os.path.isdir(path) or "appstatus" in os.path.basename(path):
            continue
        with open(path, errors="ignore") as f:
            for line in f:
                if '"SparkListenerStageCompleted"' not in line:
                    continue
                ev = json.loads(line)["Stage Info"]
                sub = ev.get("Submission Time")
                if sub is None or sub < t_mark:
                    continue
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in ev.get("Accumulables", [])
                }
                out.append(
                    {
                        "id": ev["Stage ID"],
                        "name": ev["Stage Name"].split(" at ")[0]
                        + ":" + str(ev.get("Number of Tasks", 0)),
                        "wall_s": round(
                            (ev.get("Completion Time", sub) - sub) / 1000.0, 3
                        ),
                        "task_s": round(
                            acc.get("internal.metrics.executorRunTime", 0)
                            / 1000.0, 3
                        ),
                        "input_mb": round(
                            acc.get("internal.metrics.input.bytesRead", 0)
                            / 1e6, 1
                        ),
                        "sh_read_mb": round(
                            (
                                acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                                + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                            ) / 1e6, 1
                        ),
                        "sh_write_mb": round(
                            acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                            / 1e6, 1
                        ),
                        "py_s": round(
                            acc.get(
                                "internal.metrics.python.totalExecutionTime", 0
                            ) / 1000.0, 3
                        ),
                    }
                )
    shutil.rmtree(evdir, ignore_errors=True)
    out.sort(key=lambda s: s["id"])
    return {"query": name, "wall_s": wall, "stages": out}


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--isolate":
        names = args[1].split(",") if len(args) > 1 else HEADLINE
        print(json.dumps(isolate(names), indent=1))
    elif args and args[0] == "--plans":
        outdir = args[1]
        names = args[2].split(",") if len(args) > 2 else HEADLINE
        plans(outdir, names)
    elif args and args[0] == "--stages":
        print(json.dumps(stages(args[1]), indent=1))
    elif args and args[0] == "--all":
        spark = _spark()
        qs = _queries(spark)
        res = {}
        for n in sorted(qs):
            t0 = time.perf_counter()
            _noop(qs[n](spark, SF_DIR))
            res[n] = round(time.perf_counter() - t0, 3)
            print(f"# {n}: {res[n]}s", file=sys.stderr)
        spark.stop()
        print(json.dumps(res, indent=1))
    else:
        print(__doc__)
