"""End-to-end KG construction plan: documents -> nodes/edges.

Mirrors the reference predict path (SURVEY §3.1,
src/renet2/predict.py:338-448) as one declarative DataFrame DAG:

  flat documents --derive_spans--> interleaved span corpus
    --sentences_from_spans--> sentences        (narrow)
    --tag_mentions--> raw mentions             (broadcast join)
    --canonicalize--> mentions                 (narrow)
    --pair_features--> candidate pairs         (doc-keyed shuffles)
    --score + vote--> accepted pairs           (row-local)
    --attach_names--> edges                    (doc-keyed join)
  mentions --salted agg--> nodes

Every shuffle is keyed by doc_id (+sentence/entity) — document-uniform,
so hot entities (the 'join' gene appears in ~96% of docs) never skew a
partition. Entity-keyed rollups (nodes) go through two-phase salted
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import derive_spans, load_documents, sentences_from_spans
from ..operators.normalize import canonicalize_mentions
from ..operators.pairgen import pair_features
from ..operators.scorer import (
    CUTOFF,
    ensemble_vote,
    materialize_edges,
    score_pairs,
)
from ..operators.tagger import tag_mentions


def build_mentions(spark: SparkSession, documents: DataFrame) -> DataFrame:
    spans = derive_spans(documents)
    sentences = sentences_from_spans(spans)
    return canonicalize_mentions(tag_mentions(sentences, spark))


def build_edges(
    spark: SparkSession, documents: DataFrame, cutoff: int = CUTOFF
) -> DataFrame:
    mentions = build_mentions(spark, documents)
    pairs = pair_features(mentions)
    voted = ensemble_vote(score_pairs(pairs), cutoff=cutoff)
    return materialize_edges(voted, mentions)


def build_nodes(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Entity node table with corpus-wide stats. Entity-keyed — uses a
    salted two-phase aggregation so the hot-gene key can't produce a
    straggler reducer (operators/skew.py)."""
    from ..operators.skew import salted_count

    mentions = build_mentions(spark, documents)
    return salted_count(
        mentions,
        keys=["type", "entity_id"],
        doc_col="doc_id",
        salt_buckets=16,
    )


def run(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_edges(spark, load_documents(spark, sf_dir))
