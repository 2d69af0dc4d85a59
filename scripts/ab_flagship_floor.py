"""A/B: ingest-parallelism floor on the FLAGSHIP-chain contract queries.

BENCH.md round 6 measured the floor hurting kg_edges (+82%) in an
isolated per-query harness, and the floor was meant to be selective
("the flagship pipeline keeps the plain scan"), but the driver
contract's q_edges / q_nodes / q_edges_incremental still route
through the floored `_docs`. This script measures floored vs plain
for those three queries interleaved at sf0.1 in the bench session
shape (local[32], /dev/shm shuffle) so the contract wiring can follow
the evidence.

Run: python scripts/ab_flagship_floor.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    from renet2_spark.session import get_spark
    from renet2_spark.corpus import ingest_parallelism_floor, load_documents
    from renet2_spark.plans import pipeline
    from renet2_spark.sources.checkpoint import CheckpointStore
    import tempfile

    spark = get_spark(
        app_name="ab_flagship_floor",
        master="local[32]",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )

    def docs_plain(s, d):
        return load_documents(s, d)

    def docs_floor(s, d):
        return ingest_parallelism_floor(load_documents(s, d), s)

    def q_edges(s, d, docs_fn):
        return pipeline.build_edges(s, docs_fn(s, d), corpus="packed")

    def q_nodes(s, d, docs_fn):
        return pipeline.build_nodes(s, docs_fn(s, d), corpus="packed")

    def q_incr(s, d, docs_fn):
        from renet2_spark.streaming.incremental import run_incremental

        with tempfile.TemporaryDirectory(dir="/dev/shm") as tmp:
            store = CheckpointStore(s, tmp)
            return run_incremental(
                s, docs_fn(s, d), store, buckets=8, corpus="packed"
            ).count()

    queries = {
        "kg_edges": q_edges,
        "kg_nodes": q_nodes,
        "kg_edges_incremental": q_incr,
    }

    # warm-up lap (JIT/codegen) at smoke scale, both variants
    for fn in queries.values():
        for dfn in (docs_plain, docs_floor):
            r = fn(spark, "/root/testdata/sf0.001", dfn)
            if hasattr(r, "count"):
                r.count()

    best: dict[str, dict[str, float]] = {
        q: {"floor": 9e9, "plain": 9e9} for q in queries
    }
    for rnd in range(rounds):
        for qname, fn in queries.items():
            for vname, dfn in (("floor", docs_floor), ("plain", docs_plain)):
                t0 = time.perf_counter()
                r = fn(spark, SF_DIR, dfn)
                n = r.count() if hasattr(r, "count") else r
                dt = time.perf_counter() - t0
                best[qname][vname] = min(best[qname][vname], dt)
                print(
                    f"# round {rnd} {qname} {vname}: {n} rows {dt:.3f}s",
                    file=sys.stderr,
                )
    print("\n| query | floor best | plain best | delta |")
    print("|---|---|---|---|")
    for qname, v in best.items():
        d = (v["floor"] - v["plain"]) / v["plain"] * 100
        print(
            f"| {qname} | {v['floor']:.3f} | {v['plain']:.3f} | "
            f"{'+' if d >= 0 else ''}{d:.0f}% |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
