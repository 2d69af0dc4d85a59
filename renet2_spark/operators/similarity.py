"""Similarity search over embedding columns.

* :func:`ann_topk_brute` — exact cosine top-k; the correctness
  baseline (DuckDB-oracled).
* :func:`lsh_buckets` / :func:`ann_topk_lsh` — random-hyperplane LSH:
  candidates only within a shared signature bucket (multi-probe via
  several independent tables). Approximate — recall measured against
  the brute-force baseline in tests, not an oracle query.

Scale: brute force is O(n*q) — fine when the query set is small or as
a final re-rank; the LSH path turns global search into per-bucket
local search. Hyperplanes are deterministic (seeded numpy, broadcast
as literal arrays), so results are stable across runs/executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import cosine


def ann_topk_brute(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries:
    (query_id, rank, neighbor_id, cos). Deterministic tie-break on
    neighbor id."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qe"), F.col("ne")), 5))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def lsh_buckets(
    embeddings: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, table, bucket) — sign-pattern bucket per hash table.
    Planes are literal arrays → whole-stage codegen dot products."""
    out = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        bits = []
        for p in planes:
            lit = F.array(*[F.lit(float(x)) for x in p])
            dot = F.aggregate(
                F.zip_with(
                    F.col("embedding"), lit, lambda x, y: x.cast("double") * y
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        out.append(
            F.struct(F.lit(t).alias("table"), F.concat(*bits).alias("bucket"))
        )
    return embeddings.select(
        "vec_id", F.explode(F.array(*out)).alias("tb")
    ).select(
        "vec_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    **lsh_kw,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any LSH bucket
    with the query, re-ranked by exact cosine."""
    buckets = lsh_buckets(embeddings, **lsh_kw)
    qb = buckets.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = (
        qb.join(buckets, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("cos", F.round(cosine(F.col("qe"), F.col("ne")), 5))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
