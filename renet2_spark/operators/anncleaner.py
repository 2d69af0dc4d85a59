"""Annotation cleaning: overlap merge, joint-tag fusion, boundary drop.

Reference semantics:
* make_tags overlap handling (src/renet2/utils/sequence_utils.py:2-80):
  annotations sorted by (start, end); two anns with identical
  (sent, start, end, mention) but different types fuse into a
  composite Gene-Disease tag with id 'd>-<g' (lines 17-26, DISEASE id
  first: when the current tag is a Gene the reference prepends last_Id
  — the disease — and when it is a Disease it prepends the current Id,
  so both orders emit disease-first, cf. word_index entries like
  '<D006432>-<3077>'); an ann overlapping the previous tag (start <= prev end)
  REPLACES it with a merged span [prev.start, new.end] carrying the
  NEW tag's identity, and the running end becomes the new tag's end
  (lines 42-80).
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
    """Same (doc, sent_no, start, end, mention) with BOTH a Gene and a
    Disease annotation -> one composite mention of type 'Gene-Disease'
    with entity_id 'disease>-<gene' (reference sequence_utils.py:17-26;
    disease id first, matching the reference's composite order — round-2
    advice fix). Works on span-bearing mentions (start/end char
    offsets) and on the token-coordinate fast-tagger output (keys fall
    back to tok_no when start/end are absent — same granularity, the
    fast tagger emits one mention per token)."""
    keys = ["doc_id", "sent_no"] + [
        c for c in ("start", "end") if c in mentions.columns
    ]
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
            F.concat(F.col("d"), F.lit(JOINT_SEP), F.col("g")),
        )
        .when(F.col("g").isNotNull(), F.col("g"))
        .otherwise(F.col("d"))
        .alias("entity_id"),
    )
    return fused


def merge_overlaps(mentions: DataFrame) -> DataFrame:
    """Extend-and-replace overlap merge, faithful to the reference scan
    (sequence_utils.py:42-80): annotations sorted by (start, end)
    within (doc, sent); a tag overlapping the previous tag (start <=
    prev inclusive end, i.e. start < prev exclusive end here) REPLACES
    the previously kept tag with a merged span [kept.start, new.end]
    carrying the NEW tag's mention/type/entity_id, and the running end
    becomes the NEW tag's end (so a contained span SHRINKS the running
    end — the reference's `last_end` tracks the last element, not a
    max; round-1 advice fix: the old version kept the earlier span and
    dropped the newcomer).

    Because the running end after each element is always that element's
    own end, chains break exactly where start >= lag(end) in scan
    order — so the stateful scan is two window functions + one grouped
    aggregation (codegen'd built-ins, one (doc, sent)-keyed shuffle):
    per chain emit first.start / last.end / first.tok_no and the LAST
    element's identity."""
    from pyspark.sql import Window as W

    order = [
        F.asc("start"), F.asc("end"), F.asc("mention"), F.asc("type"),
        F.asc("entity_id"), F.asc("tok_no"),
    ]
    w = W.partitionBy("doc_id", "sent_no").orderBy(*order)
    prev_end = F.lag("end").over(w)
    new_chain = (
        prev_end.isNull() | (F.col("start") >= prev_end)
    ).cast("int")
    rn = F.row_number().over(w)
    chained = mentions.select(
        "doc_id", "sent_no", "tok_no", "start", "end", "mention", "type",
        "entity_id",
        rn.alias("_rn"),
        F.sum(new_chain)
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("_chain"),
    )
    return (
        chained.groupBy("doc_id", "sent_no", "_chain")
        .agg(
            F.min_by("tok_no", "_rn").alias("tok_no"),
            F.min_by("start", "_rn").alias("start"),
            F.max_by("end", "_rn").alias("end"),
            F.max_by("mention", "_rn").alias("mention"),
            F.max_by("type", "_rn").alias("type"),
            F.max_by("entity_id", "_rn").alias("entity_id"),
        )
        .select(
            "doc_id", "sent_no", "tok_no", "start", "end", "mention",
            "type", "entity_id",
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
