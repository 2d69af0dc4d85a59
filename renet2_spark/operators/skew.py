"""Skew-defusal helpers: salted two-phase aggregation / salted joins.

The reference is single-node and has no skew story (SURVEY §4). At
cluster scale, entity-keyed aggregations are dominated by hot entities
(our fixture: gene 'join' occurs in ~96% of documents; real-world:
TP53 / 'Neoplasms' D009369). The north_rule requires explicit salted
repartitioning.

Pattern: stage 1 aggregates on (key, salt) where salt = a uniform
function of an orthogonal column (doc_id), spreading one hot key over
`salt_buckets` reducers; stage 2 re-aggregates the (at most
`salt_buckets` x |keys|) partials — tiny. Spark's map-side partial
aggregation already helps for algebraic aggs; salting also covers
holistic aggs (collect_set/countDistinct) where partials stay large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, doc_col: str, salt_buckets: int) -> DataFrame:
    salt = F.pmod(F.xxhash64(F.col(doc_col)), F.lit(salt_buckets))
    return df.withColumn("_salt", salt.cast("int"))


def salted_count(
    df: DataFrame,
    keys: list[str],
    doc_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(count, countDistinct(doc)) with salting:
    output (keys..., n_mentions, n_docs)."""
    stage1 = (
        with_salt(df, doc_col, salt_buckets)
        .groupBy(*keys, "_salt")
        .agg(
            F.count("*").alias("_cnt"),
            # distinct docs within a salt bucket; buckets partition the
            # doc space (salt = f(doc)), so stage-2 SUM is exact
            F.countDistinct(doc_col).alias("_docs"),
        )
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_cnt").cast("long").alias("n_mentions"),
        F.sum("_docs").cast("long").alias("n_docs"),
    )


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    doc_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase collect_set: per-salt partial sets, then union+dedupe.
    Output (keys..., values array<...>, sorted)."""
    stage1 = (
        with_salt(df, doc_col, salt_buckets)
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value_col).alias("_vals"))
    )
    return stage1.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_vals")))
        ).alias("values")
    )
