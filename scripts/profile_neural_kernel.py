"""Profile the deterministic neural forward kernel OUTSIDE Spark.

Feeds score_batch with realistic pandas batches (drawn from the
actual sf0.01 pair tensors via the same build path the pipeline uses)
and breaks down wall time: doc-cache build, per-pair feat flip,
shape-group stacking, and the forward_all stages (gather+conv, pool,
GRU fwd/bwd, fc+sigmoid). Pure measurement — no engine change.

Run: python scripts/profile_neural_kernel.py [n_batches] [batch_rows]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from renet2_spark.operators import neural as nn
    from renet2_spark.session import get_spark
    from renet2_spark.corpus import (
        derive_spans,
        load_documents,
        sentences_from_spans,
    )
    from renet2_spark.operators.normalize import canonicalize_mentions
    from renet2_spark.operators.pairgen import pair_features
    from renet2_spark.operators.tagger import tag_mentions

    spark = get_spark(
        app_name="profile_neural",
        master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf = "/root/testdata/sf0.01"
    docs = load_documents(spark, sf)
    sents = sentences_from_spans(derive_spans(docs))
    ments = canonicalize_mentions(tag_mentions(sents, spark))
    pairs = pair_features(ments).select("doc_id", "gene_id", "disease_id")
    joined = pairs.join(nn.doc_tensors(sents, ments), "doc_id")
    pdf_full = joined.toPandas()
    spark.stop()
    print(f"# rows available: {len(pdf_full)}", file=sys.stderr)

    batches = [
        pdf_full.iloc[i * batch_rows : (i + 1) * batch_rows].reset_index(
            drop=True
        )
        for i in range(min(n_batches, max(1, len(pdf_full) // batch_rows)))
    ]

    # shape-group census: how many forward_all invocations per batch?
    for bi, b in enumerate(batches):
        shapes: dict = {}
        for t in b["tok_ids"]:
            S = min(len(t), nn.MAX_SENTS)
            Tk = min(max((len(s) for s in t[:S]), default=1), nn.MAX_TOKENS)
            shapes[(S, Tk)] = shapes.get((S, Tk), 0) + 1
        sizes = sorted(shapes.values(), reverse=True)
        print(
            f"# batch {bi}: {len(b)} rows, {len(shapes)} shape groups, "
            f"group sizes {sizes[:8]}{'...' if len(sizes) > 8 else ''}",
            file=sys.stderr,
        )

    # warm caches (weight tables)
    nn.score_batch(batches[0].head(8))

    t0 = time.perf_counter()
    for b in batches:
        nn.score_batch(b)
    wall = time.perf_counter() - t0
    nrows = sum(len(b) for b in batches)
    print(f"# score_batch: {nrows} pairs in {wall:.3f}s "
          f"({nrows / wall:.0f} pairs/s)", file=sys.stderr)

    pr = cProfile.Profile()
    pr.enable()
    for b in batches:
        nn.score_batch(b)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
