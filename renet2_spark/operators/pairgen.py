"""Candidate (gene, disease) pair generation.

Reference: Generate_data_rnn (plain per-doc cross product of gene ids
x disease ids, src/renet2/utils/sequence_utils.py:370-438) and
Generate_data_rnn_v (pairs restricted to co-occurrence within one
section, sequence_utils.py:255-304 — section pair set `tar_p_set` at
291, cross at 301-304). The reference loops per doc in Python; here
the fan-out is a declarative plan:

  mentions --groupBy(doc_id, sent_no)--> per-sentence entity sets
           --explode x explode--> co-occurring pairs
           --groupBy(doc_id, g, d)--> n_cooc_sents

One shuffle (the groupBy); the cross product is generated row-locally
by nested explode, so no join and **no skew on hot entities** — the
shuffle key is (doc_id, sent_no), which is uniformly distributed no
matter how hot an entity is. This is the explicit skew defusal the
north_rule asks for: keying fan-out by document, never by entity.
Entity-keyed aggregations downstream use salted two-phase aggs
(operators/skew.py).

Feature columns for the scorer (document-level evidence, the same
signals the reference's feature codes 4/5/6 mark per token,
sequence_utils.py:325-349): n_cooc_sents, n_gene_mentions,
n_disease_mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sentence_pair_candidates(mentions: DataFrame) -> DataFrame:
    """Sentence/section co-occurrence variant (_v). Output:
    (doc_id, gene_id, disease_id, n_cooc_sents)."""
    per_sent = mentions.groupBy("doc_id", "sent_no").agg(
        F.collect_set(
            F.when(F.col("type") == "Gene", F.col("entity_id"))
        ).alias("genes"),
        F.collect_set(
            F.when(F.col("type") == "Disease", F.col("entity_id"))
        ).alias("diseases"),
    )
    pairs = (
        per_sent.select(
            "doc_id", "sent_no", F.explode("genes").alias("gene_id"), "diseases"
        )
        .select(
            "doc_id", "sent_no", "gene_id", F.explode("diseases").alias("disease_id")
        )
    )
    return pairs.groupBy("doc_id", "gene_id", "disease_id").agg(
        F.countDistinct("sent_no").cast("int").alias("n_cooc_sents")
    )


def doc_pair_candidates(mentions: DataFrame) -> DataFrame:
    """Plain variant: per-doc distinct genes x distinct diseases
    (reference sequence_utils.py:370-438). Output:
    (doc_id, gene_id, disease_id)."""
    per_doc = mentions.groupBy("doc_id").agg(
        F.collect_set(
            F.when(F.col("type") == "Gene", F.col("entity_id"))
        ).alias("genes"),
        F.collect_set(
            F.when(F.col("type") == "Disease", F.col("entity_id"))
        ).alias("diseases"),
    )
    return (
        per_doc.select("doc_id", F.explode("genes").alias("gene_id"), "diseases")
        .select("doc_id", "gene_id", F.explode("diseases").alias("disease_id"))
    )


def entity_mention_counts(mentions: DataFrame) -> DataFrame:
    """(doc_id, type, entity_id, n_mentions) — doc-level evidence."""
    return mentions.groupBy("doc_id", "type", "entity_id").agg(
        F.count("*").cast("int").alias("n_mentions")
    )


def pair_features(mentions: DataFrame) -> DataFrame:
    """Candidate pairs + evidence features:
    (doc_id, gene_id, disease_id, n_cooc_sents, n_g, n_d).

    Join keys include doc_id, so partitioning stays document-uniform
    (hot entities do not skew these joins)."""
    pairs = sentence_pair_candidates(mentions)
    cnt = entity_mention_counts(mentions)
    g_cnt = cnt.filter(F.col("type") == "Gene").select(
        "doc_id", F.col("entity_id").alias("gene_id"), F.col("n_mentions").alias("n_g")
    )
    d_cnt = cnt.filter(F.col("type") == "Disease").select(
        "doc_id",
        F.col("entity_id").alias("disease_id"),
        F.col("n_mentions").alias("n_d"),
    )
    return (
        pairs.join(g_cnt, ["doc_id", "gene_id"])
        .join(d_cnt, ["doc_id", "disease_id"])
        .select(
            "doc_id", "gene_id", "disease_id", "n_cooc_sents", "n_g", "n_d"
        )
    )
