"""Training-corpus curation operators: sequence packing, eval-set
decontamination, deterministic sampling.

Not in the reference (its corpus is a curated PubMed set); these are
the remaining first-class operations an LLM training-data pipeline
runs after dedup/quality filtering (operators/dedup.py,
functions/textstats.py):

* :func:`pack_sequences` — concat-then-chunk packing of documents into
  fixed token-budget context windows ("bins"). Global contiguous
  packing is inherently sequential, so packing is PER SOURCE (any
  uniform partition key works): each source packs independently in
  doc_id order — embarrassingly parallel across sources, one
  window-function pass within each, waste bounded by one partial bin
  per source. A document's bin is the bin its first token lands in
  (standard concat-and-chunk semantics where chunk boundaries may cut
  across documents).

* :func:`decontaminate` — n-gram contamination check of the training
  corpus against an evaluation set: for every train doc, the number of
  word n-grams it shares with ANY eval doc. The eval shingle set is
  deduplicated and broadcast (eval sets are small by definition); the
  probe is a broadcast semi/inner join against the train side's
  exploded shingles — no shuffle of the train corpus. The same
  shingling as dedup (doc_shingles) so thresholds are comparable.

* :func:`sample_hash` — deterministic content-independent sampling:
  keep a document iff the first 4 hex digits of md5(salt || doc_id),
  read as an integer, fall below pct * 65536 / 100. Reproducible
  across runs/engines (exactly reproducible in the DuckDB oracle),
  uniform in expectation, and stable under corpus growth (a doc's
  fate never depends on other docs) — the property naive
  rand()-sampling lacks.

All three are pure Catalyst plans with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import NGRAM, doc_shingles

PACK_BUDGET = 256  # tokens per packed context window


def pack_sequences(
    documents: DataFrame, budget: int = PACK_BUDGET
) -> DataFrame:
    """(source, doc_id, n_tokens, start_offset, bin_id, bin_offset) —
    concat-then-chunk packing per source in doc_id order.

    start_offset = running token count of preceding docs in the same
    source; bin_id = start_offset // budget; bin_offset = start_offset
    % budget. One window pass partitioned by source (parallel across
    sources; a 100 TB corpus packs per file-group/bucket the same
    way)."""
    n_tok = F.size(F.split(F.col("text"), " "))
    # order by the NUMERIC id ("10" < "2" lexicographically)
    w = (
        W.partitionBy("source")
        .orderBy("_ord")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        documents.select(
            "source",
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("doc_id").cast("long").alias("_ord"),
            n_tok.cast("int").alias("n_tokens"),
        )
        .withColumn("start_offset", start.cast("long"))
        .select(
            "source",
            "doc_id",
            "n_tokens",
            "start_offset",
            (F.col("start_offset") / budget).cast("int").alias("bin_id"),
            F.pmod(F.col("start_offset"), F.lit(budget))
            .cast("int")
            .alias("bin_offset"),
        )
    )


def decontaminate(
    documents: DataFrame, eval_docs: DataFrame, n: int = NGRAM
) -> DataFrame:
    """(doc_id, n_contaminated, n_sh, contamination) — per train doc,
    how many of its distinct word n-grams appear in ANY eval doc.
    Train docs with zero overlap are included with n_contaminated=0
    (the common downstream move is `filter(contamination < tau)`)."""
    eval_sh = doc_shingles(eval_docs, n).select("shingle").distinct()
    train_sh = doc_shingles(documents, n)
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_contaminated"))
    )
    from .dedup import doc_shingle_counts

    sizes = doc_shingle_counts(documents, n)
    return (
        sizes.join(hits, "doc_id", "left")
        .withColumn(
            "n_contaminated", F.coalesce("n_contaminated", F.lit(0))
        )
        .withColumn(
            "contamination",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_sh").cast("double"),
                5,
            ),
        )
        .select("doc_id", "n_contaminated", "n_sh", "contamination")
    )


def sample_hash(
    documents: DataFrame, pct: float = 10.0, salt: str = "s0"
) -> DataFrame:
    """(doc_id, lang, source) — deterministic ~pct% sample: keep iff
    int(md5(salt || ':' || doc_id)[:4], 16) < pct/100 * 65536."""
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    threshold = int(pct / 100.0 * 65536)
    return (
        documents.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "lang",
            "source",
            key.alias("_k"),
        )
        .filter(F.col("_k") < threshold)
        .drop("_k")
    )
