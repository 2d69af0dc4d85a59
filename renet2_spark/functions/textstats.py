"""Text analysis functions for corpus curation: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

All pure Catalyst expressions (zero Python in the hot path) and all
reproducible in ANSI SQL for the oracle. At 100 TB these run inside
the same scan as dedup — no extra pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a")
FP_MOD = 1_000_000_007
FP_BASE = 31


def _words() -> Column:
    return F.split(F.col("text"), " ")


def text_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    quality_score). quality = min(1, n_tokens/100) * (1 - stopword_ratio)
    — a length/stopword composite in the spirit of C4/Gopher rules."""
    ws = _words()
    n_tok = F.size(ws)
    n_chars = F.length("text")
    stop = F.size(
        F.filter(ws, lambda w: w.isin(*STOPWORDS))
    )
    avg_len = F.round(
        (n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"), 5
    )
    stop_ratio = F.round(stop.cast("double") / n_tok.cast("double"), 5)
    quality = F.round(
        F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
        * (F.lit(1.0) - stop.cast("double") / n_tok.cast("double")),
        5,
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n_tok.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang, lang_pred, lang_conf) — n-gram/stopword
    heuristic. The synthetic corpus is English-like word salad, so the
    heuristic scores en-stopword density; conf = stopword hits /
    tokens. (The real corpus analogue scores per-language character
    n-gram tables; plumbing is identical.)"""
    ws = _words()
    hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    pred = F.when(hits > 0, F.lit("en")).otherwise(F.lit("und"))
    conf = F.round(hits.cast("double") / F.size(ws).cast("double"), 5)
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "lang",
        pred.alias("lang_pred"),
        conf.alias("lang_conf"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, subword_tokens) — whitespace count plus a
    BPE-ish upper bound: ceil(len(word)/4) subword units per word."""
    ws = _words()
    sub = F.aggregate(
        ws,
        F.lit(0).cast("int"),
        lambda a, w: a + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(ws).cast("int").alias("ws_tokens"),
        sub.alias("subword_tokens"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp, text_md5) — order-sensitive rolling polynomial hash
    over words (h = h*31 + (ascii(first)*100 + len)) mod 1e9+7, plus
    content md5. Rolling fp detects reordered-content docs that md5
    treats as distinct."""
    ws = _words()
    word_val = lambda w: (
        F.ascii(F.substring(w, 1, 1)) * F.lit(100) + F.length(w)
    ).cast("long")
    fp = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda a, w: (a * F.lit(FP_BASE) + word_val(w)) % F.lit(FP_MOD),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        fp.alias("fp"),
        F.md5("text").alias("text_md5"),
    )
