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
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import cosine, vec_dot, vec_norm


def _floored(embeddings: DataFrame) -> DataFrame:
    """Scan-parallelism floor for the similarity operators (r7, guide
    §2.6/§6): the sandbox's single-split embeddings file otherwise
    runs the whole interpreted-fold cosine work in ONE task (measured:
    ann_topk_brute spent 0.72 of its 1.4s wall in a single task).
    No-op on any multi-split input (ingest_parallelism_floor guard)."""
    from ..corpus import ingest_parallelism_floor

    return ingest_parallelism_floor(
        embeddings, embeddings.sparkSession, key="vec_id"
    )


def ann_topk_brute(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
) -> DataFrame:
    """Top-k cosine neighbors for vec_id < n_queries:
    (query_id, rank, neighbor_id, cos). Deterministic tie-break on
    neighbor id. r7: each side's L2 norm is computed ONCE before the
    pairwise join (the interpreted norm folds used to run per PAIR —
    3x the per-pair work; dot/(qn*cn) is bitwise identical to the
    fused cosine: same sub-expressions, same association)."""
    emb = _floored(embeddings)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        vec_norm(F.col("embedding")).alias("_qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        vec_norm(F.col("embedding")).alias("_cn"),
    )
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cos",
        F.round(
            vec_dot(F.col("qe"), F.col("ne")) / (F.col("_qn") * F.col("_cn")),
            5,
        ),
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


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 5,
    sample_ids: int = 512,
) -> np.ndarray:
    """Deterministic mini k-means (cosine/spherical) over a BOUNDED
    content-hash sample: rows are ranked by md5('ivf:' || vec_id) and
    the first `sample_ids` taken (r5 verdict #3 — the old id-PREFIX
    sample biased centroids toward whatever the low ids contained;
    the hash rank is a uniform draw over the WHOLE corpus, stays a
    tiny driver-side collect at any corpus size — orderBy+limit plans
    as TakeOrderedAndProject, per-partition top-K then a driver-side
    merge, no global sort materializes — and is deterministic across
    runs/partitionings, ties broken by vec_id). Lloyd iterations run
    in NumPy on the driver and the resulting [C, d] centroid matrix
    broadcasts. Initialization = first C sample vectors (hash order)
    — seed-free and stable."""
    key = F.md5(F.concat(F.lit("ivf:"), F.col("vec_id").cast("string")))
    rows = (
        embeddings.select("vec_id", "embedding", key.alias("_k"))
        .orderBy("_k", "vec_id")
        .limit(sample_ids)
        .select("embedding")
        .collect()
    )
    if not rows:
        raise ValueError(
            "ivf_centroids: embeddings table has no rows — cannot seed "
            "centroids from an empty sample"
        )
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    if len(x) < n_centroids:
        # fewer sample vectors than requested centroids: clamp rather
        # than silently emitting a short matrix callers don't expect
        n_centroids = len(x)
    c = x[:n_centroids].copy()
    for _ in range(n_iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(n_centroids):
            m = x[assign == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def _ivf_probe_udf(centroids: np.ndarray, nprobe: int):
    """Vectorized pandas UDF: embedding -> array of the nprobe nearest
    centroid ids (one batched matmul per Arrow batch)."""
    from pyspark.sql import types as T

    c = centroids.astype(np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(emb: pd.Series) -> pd.Series:
        x = np.array(emb.tolist(), dtype=np.float64)
        # no query normalization: argsort of x.c is scale-invariant,
        # and skipping the divide keeps the dot bit-comparable with
        # the DuckDB oracle's list_dot_product(embedding, centroid)
        sims = x @ c.T
        # stable sort pins dot ties to ascending centroid id — the
        # same tie rule the DuckDB oracle's row_number uses
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in top])

    return probe


def ann_topk_ivf(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    n_centroids: int = 8,
    nprobe: int = 3,
) -> DataFrame:
    """IVF approximate top-k (the second scale path next to LSH):
    vectors are bucketed by nearest centroid (inverted file), queries
    probe their nprobe nearest centroid buckets, candidates are exact
    re-ranked. Global search becomes a centroid-keyed equi-join —
    candidate generation is O(n * nprobe / C) per query instead of
    O(n). Approximate: recall vs the brute baseline asserted in
    tests/test_similarity.py; rows-only in the driver contract."""
    cents = ivf_centroids(embeddings, n_centroids=n_centroids)
    probe = _ivf_probe_udf(cents, nprobe)
    assign1 = _ivf_probe_udf(cents, 1)
    inv = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(assign1(F.col("embedding"))).alias("cid"),
    )
    qprobe = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.explode(probe(F.col("embedding"))).alias("cid"),
    )
    cand = (
        qprobe.join(inv, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = embeddings.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        vec_norm(F.col("embedding")).alias("_qn"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        vec_norm(F.col("embedding")).alias("_cn"),
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "cos",
            F.round(
                vec_dot(F.col("qe"), F.col("ne"))
                / (F.col("_qn") * F.col("_cn")),
                5,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    **lsh_kw,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any LSH bucket
    with the query, re-ranked by exact cosine. The CORPUS side of the
    bucket join is capped at max_bucket_size members per (table,
    bucket) (dedup.cap_hot_buckets — lowest vec_id kept, mirrored in
    the oracle), bounding a hot bucket's candidate fan-out at
    O(n_queries * cap) instead of O(n_queries * N); the query side is
    never capped, so every query still probes."""
    from .dedup import MAX_LSH_BUCKET, cap_hot_buckets

    max_bucket_size = lsh_kw.pop("max_bucket_size", MAX_LSH_BUCKET)
    buckets = lsh_buckets(embeddings, **lsh_kw)
    qb = buckets.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cb = (
        cap_hot_buckets(buckets, ["table", "bucket"], "vec_id", max_bucket_size)
        if max_bucket_size is not None
        else buckets
    )
    cand = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = embeddings.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        vec_norm(F.col("embedding")).alias("_qn"),
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        vec_norm(F.col("embedding")).alias("_cn"),
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn(
            "cos",
            F.round(
                vec_dot(F.col("qe"), F.col("ne"))
                / (F.col("_qn") * F.col("_cn")),
                5,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
