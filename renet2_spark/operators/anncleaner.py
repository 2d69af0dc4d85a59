"""Annotation cleaning: overlap merge, joint-tag fusion, boundary drop.

Reference semantics:
* make_tags overlap handling (src/renet2/utils/sequence_utils.py:2-80):
  annotations sorted by (start, end); two anns with identical
  (sent, start, end) but different types fuse into a composite
  Gene-Disease tag with id 'g>-<d' (lines 17-26); an ann overlapping
  the previous span (start <= prev_end) is merged away, keeping the
  earlier/wider span (lines 51-69).
* clean_anns_in_different_sent (src/renet2/utils/ann_utils.py:13-23,
  122-125): drop annotations whose char span crosses a sentence
  boundary. (disambiguate_anns/unify_anns at 28-120 are dead code —
  early return at 125 — reproduced only as unify_doc_ids in
  normalize.py since normalize_ann.py:26-49 has live equivalents.)

Spark-first: both are window-shaped per (doc, sentence) — lag()
comparisons for pairwise fusion/overlap, plus an iterated closure via
a grouped array expression for overlap CHAINS (a>b>c): sorting within
the doc row and a single linear scan expressed as aggregate over the
sorted array (bounded per doc by the reference caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOINT_SEP = ">-<"  # reference sequence_utils.py:22-25 composite id


def fuse_joint_tags(mentions: DataFrame) -> DataFrame:
    """Same (doc, sent_no, start, end) with BOTH a Gene and a Disease
    annotation -> one composite mention of type 'Gene-Disease' with
    entity_id 'gene>-<disease' (reference sequence_utils.py:17-26)."""
    keys = ["doc_id", "sent_no", "start", "end"]
    agg = mentions.groupBy(*keys, "mention", "tok_no").agg(
        F.max(F.when(F.col("type") == "Gene", F.col("entity_id"))).alias("g"),
        F.max(F.when(F.col("type") == "Disease", F.col("entity_id"))).alias("d"),
        F.count("*").alias("n"),
    )
    fused = agg.select(
        *keys,
        "mention",
        "tok_no",
        F.when(
            F.col("g").isNotNull() & F.col("d").isNotNull(), F.lit("Gene-Disease")
        )
        .when(F.col("g").isNotNull(), F.lit("Gene"))
        .otherwise(F.lit("Disease"))
        .alias("type"),
        F.when(
            F.col("g").isNotNull() & F.col("d").isNotNull(),
            F.concat(F.col("g"), F.lit(JOINT_SEP), F.col("d")),
        )
        .when(F.col("g").isNotNull(), F.col("g"))
        .otherwise(F.col("d"))
        .alias("entity_id"),
    )
    return fused


def merge_overlaps(mentions: DataFrame) -> DataFrame:
    """Drop annotations overlapping the last KEPT span in (start, end)
    order within (doc, sent) (reference sequence_utils.py:51-69 tracks
    the previous kept/merged span — NOT a running max over dropped
    rows: after [0,10) drops [5,12), a following [11,15) is kept).

    Stateful linear scan -> per-sentence sorted-array fold (bounded by
    the reference's 512-token sentence cap); one doc-keyed shuffle."""
    payload = F.struct(
        "start", "end", "tok_no", "mention", "type", "entity_id"
    )
    per_sent = mentions.groupBy("doc_id", "sent_no").agg(
        F.sort_array(F.collect_list(payload)).alias("arr")
    )
    empty = F.struct(
        F.array()
        .cast(
            "array<struct<start:int,end:int,tok_no:int,mention:string,"
            "type:string,entity_id:string>>"
        )
        .alias("kept"),
        F.lit(-1).cast("int").alias("cur_end"),
    )
    kept = F.aggregate(
        F.col("arr"),
        empty,
        lambda acc, m: F.when(
            m["start"] >= acc["cur_end"],
            F.struct(
                F.concat(acc["kept"], F.array(m)).alias("kept"),
                F.greatest(acc["cur_end"], m["end"]).alias("cur_end"),
            ),
        ).otherwise(acc),
        lambda acc: acc["kept"],
    )
    return (
        per_sent.select("doc_id", "sent_no", F.explode(kept).alias("m"))
        .select(
            "doc_id",
            "sent_no",
            F.col("m.tok_no").alias("tok_no"),
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
            F.col("m.mention").alias("mention"),
            F.col("m.type").alias("type"),
            F.col("m.entity_id").alias("entity_id"),
        )
    )


def drop_cross_sentence(
    mentions: DataFrame, sentences: DataFrame
) -> DataFrame:
    """Drop annotations whose [start, end) char span crosses their
    sentence's boundary (reference ann_utils.py:13-23: begin sentence
    != end sentence -> drop; also the tail filter at 215-216).
    Implemented as a range predicate against the sentence span."""
    bounds = sentences.select(
        "doc_id",
        "sent_no",
        F.col("offset").alias("_lo"),
        (F.col("offset") + F.length("sentence")).alias("_hi"),
    )
    return (
        mentions.join(bounds, ["doc_id", "sent_no"])
        .filter((F.col("start") >= F.col("_lo")) & (F.col("end") <= F.col("_hi")))
        .drop("_lo", "_hi")
    )
