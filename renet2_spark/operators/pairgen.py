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
            F.when(F.col("type") != "Gene", F.col("entity_id"))
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
            F.when(F.col("type") != "Gene", F.col("entity_id"))
        ).alias("diseases"),
    )
    return (
        per_doc.select("doc_id", F.explode("genes").alias("gene_id"), "diseases")
        .select("doc_id", "gene_id", F.explode("diseases").alias("disease_id"))
    )


_EDGE_CACHES: list[DataFrame] = []


def release_edge_caches() -> None:
    while _EDGE_CACHES:
        try:
            _EDGE_CACHES.pop().unpersist()
        except Exception:
            pass  # cache belonged to an already-stopped session


def edge_relations(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(pairs, info) for the flagship edge plan from ONE pass over the
    mention chain (r7, guide §2.4): both consumers aggregate first by
    (doc_id, sent_no, type, entity_id) — an IDENTICAL partial-agg +
    exchange subtree, which AQE stage reuse executes once — and derive
    their shapes from that relation. Previously sentence_pair_candidates
    and the two entity_info sides each re-ran the scan+tokenize+tag
    chain (3 executions of ~4.5 task-s at sf0.1; stage profile in
    OPTIMIZATION_r07.md). Values are identical to
    sentence_pair_candidates(mentions) / entity_info(mentions):
    the per-sentence entity sets, distinct-sentence counts, mention
    counts and sorted-distinct name joins all commute with the
    per-sentence pre-aggregation."""
    m2 = mentions.groupBy("doc_id", "sent_no", "type", "entity_id").agg(
        F.count("*").cast("long").alias("_n"),
        F.collect_set("mention").alias("_names"),
    )
    # persist: Catalyst pushes the downstream type filters below the
    # aggregation into each branch's dictionary side, so the three
    # consumers would otherwise still evaluate the whole mention chain
    # separately (r7 stage profile: 3 x ~0.35s serialized on a 1-split
    # corpus). The relation is one row per (doc, sent, type, entity) —
    # far smaller than the corpus; rotated per call like the other
    # registries (overlapping builds lose only the reuse).
    release_edge_caches()
    m2 = m2.persist()
    _EDGE_CACHES.append(m2)
    per_sent = m2.groupBy("doc_id", "sent_no").agg(
        F.collect_set(
            F.when(F.col("type") == "Gene", F.col("entity_id"))
        ).alias("genes"),
        F.collect_set(
            F.when(F.col("type") != "Gene", F.col("entity_id"))
        ).alias("diseases"),
    )
    pairs = (
        per_sent.select(
            "doc_id", "sent_no", F.explode("genes").alias("gene_id"), "diseases"
        )
        .select(
            "doc_id", "sent_no", "gene_id",
            F.explode("diseases").alias("disease_id"),
        )
        .groupBy("doc_id", "gene_id", "disease_id")
        .agg(F.countDistinct("sent_no").cast("int").alias("n_cooc_sents"))
    )
    info = m2.groupBy("doc_id", "type", "entity_id").agg(
        F.sum("_n").cast("int").alias("n_mentions"),
        F.concat_ws(
            "|",
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("_names")))),
        ).alias("name"),
    )
    return pairs, info


def entity_info(mentions: DataFrame) -> DataFrame:
    """(doc_id, type, entity_id, n_mentions, name) — ONE aggregation
    serving both the scorer's evidence counts and the edge table's
    name attachment (reference computes these in two separate passes,
    predict.py:162-203; we share the shuffle)."""
    return mentions.groupBy("doc_id", "type", "entity_id").agg(
        F.count("*").cast("int").alias("n_mentions"),
        F.concat_ws("|", F.sort_array(F.collect_set("mention"))).alias("name"),
    )


def entity_mention_counts(mentions: DataFrame) -> DataFrame:
    """(doc_id, type, entity_id, n_mentions) — doc-level evidence."""
    return entity_info(mentions).drop("name")


def pair_features(
    mentions: DataFrame, info: DataFrame | None = None
) -> DataFrame:
    """Candidate pairs + evidence features:
    (doc_id, gene_id, disease_id, n_cooc_sents, n_g, n_d).

    Join keys include doc_id, so partitioning stays document-uniform
    (hot entities do not skew these joins)."""
    pairs = sentence_pair_candidates(mentions)
    cnt = info if info is not None else entity_info(mentions)
    g_cnt = cnt.filter(F.col("type") == "Gene").select(
        "doc_id", F.col("entity_id").alias("gene_id"), F.col("n_mentions").alias("n_g")
    )
    d_cnt = cnt.filter(F.col("type") != "Gene").select(
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


def doc_local_pair_table(mentions: DataFrame) -> DataFrame:
    """Fused document-local pair generation: ONE shuffle
    (groupBy doc_id), then the per-doc gene x disease fan-out, sentence
    co-occurrence counts, evidence counts and name aggregation are all
    row-local array expressions, exploded at the end. Output:
    (doc_id, gene_id, disease_id, n_cooc_sents, n_g, n_d, g_name,
    d_name).

    This replaces a 4-join / 6-exchange plan (pairs + per-entity
    counts + per-entity names) whose repeated mention-chain recompute
    and exchange fan-out dominated wall-clock (measured: join plan 58s
    vs fused plan at rep=64/32 cores). Per-doc arrays are bounded
    (<= 500 sentences x 512 tokens caps, reference raw.py:648-698), so
    the row-local work is O(genes x diseases) with tiny constants —
    and the shuffle key is doc_id, which hot entities cannot skew
    (the north_rule's salting requirement applies to entity-keyed
    rollups, operators/skew.py)."""
    ms = F.col("ms")

    def info_arr(typ: str) -> "F.Column":
        side = F.filter(ms, lambda m: m["type"] == F.lit(typ))
        ids = F.array_distinct(F.transform(side, lambda m: m["entity_id"]))

        def one(e):
            mine = F.filter(side, lambda m: m["entity_id"] == e)
            return F.struct(
                e.alias("id"),
                F.size(mine).cast("int").alias("n"),
                F.concat_ws(
                    "|",
                    F.array_sort(
                        F.array_distinct(F.transform(mine, lambda m: m["mention"]))
                    ),
                ).alias("name"),
                F.array_distinct(
                    F.transform(mine, lambda m: m["sent_no"])
                ).alias("sents"),
            )

        return F.transform(ids, one)

    per_doc = mentions.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("sent_no", "type", "entity_id", "mention")
        ).alias("ms")
    )

    def pair(gi, di):
        return F.struct(
            di["id"].alias("disease_id"),
            F.size(F.array_intersect(gi["sents"], di["sents"]))
            .cast("int")
            .alias("n_cooc_sents"),
            di["n"].alias("n_d"),
            di["name"].alias("d_name"),
        )

    # explode-structured fan-out: each info array is computed ONCE per
    # doc row and carried as data — a nested transform(ginfo, gi ->
    # transform(dinfo, ...)) would re-evaluate the inner array
    # expression per gene (lambda args are not memoized)
    s1 = per_doc.select(
        "doc_id", info_arr("Gene").alias("gis"), info_arr("Disease").alias("dis")
    )
    s2 = s1.select("doc_id", F.explode("gis").alias("gi"), "dis")
    s3 = s2.select(
        "doc_id",
        F.col("gi.id").alias("gene_id"),
        F.col("gi.n").alias("n_g"),
        F.col("gi.name").alias("g_name"),
        F.explode(
            F.filter(
                F.transform(F.col("dis"), lambda di: pair(F.col("gi"), di)),
                lambda p: p["n_cooc_sents"] > 0,
            )
        ).alias("p"),
    )
    return s3.select(
        "doc_id",
        "gene_id",
        F.col("p.disease_id").alias("disease_id"),
        F.col("p.n_cooc_sents").alias("n_cooc_sents"),
        "n_g",
        F.col("p.n_d").alias("n_d"),
        "g_name",
        F.col("p.d_name").alias("d_name"),
    )
