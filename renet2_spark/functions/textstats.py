"""Text analysis functions for corpus curation: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

All pure Catalyst expressions (zero Python in the hot path) and all
reproducible in ANSI SQL for the oracle. At 100 TB these run inside
the same scan as dedup — no extra pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a")
FP_MOD = 1_000_000_007
FP_BASE = 31


def _words() -> Column:
    return F.split(F.col("text"), " ")


def _stop_hits(ws: Column) -> Column:
    """Count of stopword tokens WITHOUT a filter() HOF lambda (those
    evaluate interpreted — round-2 verdict #4): size(ws) minus the size
    after removing each stopword with codegen'd array_remove."""
    kept = ws
    for s in STOPWORDS:
        kept = F.array_remove(kept, s)
    return F.size(ws) - F.size(kept)


def quality_score_col() -> Column:
    """quality = min(1, n_tokens/100) * (1 - stopword_ratio), rounded —
    the row-local composite both text_stats and the composed curation
    pipeline filter on (no join needed to filter by quality)."""
    ws = _words()
    n_tok = F.size(ws)
    stop = _stop_hits(ws)
    return F.round(
        F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
        * (F.lit(1.0) - stop.cast("double") / n_tok.cast("double")),
        5,
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    quality_score). quality = min(1, n_tokens/100) * (1 - stopword_ratio)
    — a length/stopword composite in the spirit of C4/Gopher rules."""
    ws = _words()
    n_tok = F.size(ws)
    n_chars = F.length("text")
    stop = _stop_hits(ws)
    avg_len = F.round(
        (n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"), 5
    )
    stop_ratio = F.round(stop.cast("double") / n_tok.cast("double"), 5)
    quality = quality_score_col()
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
    hits = _stop_hits(ws)
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
    BPE-ish upper bound: ceil(len(word)/4) subword units per word.

    subword counting is a single codegen'd regexp_count: greedy
    non-overlapping matches of [^ ]{1,4} split every space-delimited
    word of length L into exactly ceil(L/4) chunks — identical value to
    the per-word aggregate, without the interpreted HOF lambda the old
    version paid per row (round-2 verdict #4)."""
    ws = _words()
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(ws).cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[^ ]{1,4}")).cast("int").alias(
            "subword_tokens"
        ),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp, text_md5) — order-sensitive rolling polynomial hash
    over words (h = h*31 + (ascii(first)*100 + len)) mod 1e9+7, plus
    content md5. Rolling fp detects reordered-content docs that md5
    treats as distinct.

    The Horner fold is inherently sequential per doc, so it runs as an
    Arrow-batched pandas UDF (round-2 verdict #4: the previous
    formulation was an interpreted `aggregate` HOF lambda, the slowest
    class Spark offers). int64 never overflows: h < 1e9+7, so
    h*31 + val < 2^63. Embarrassingly parallel across docs."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        fingerprint_udf()("text").alias("fp"),
        F.md5("text").alias("text_md5"),
    )


def fingerprint_udf():
    """The rolling-hash pandas UDF as a reusable callable — shared by
    :func:`fingerprint` and :func:`text_profile`."""
    mod, base = FP_MOD, FP_BASE

    @F.pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        # null text -> null fp, matching the Catalyst aggregate
        # formulation this replaced (ADVICE r3: bare t.split raised
        # AttributeError on None inside the Arrow batch)
        out: list = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:
                continue
            h = 0
            for w in t.split(" "):
                h = (h * base + (ord(w[0]) if w else 0) * 100 + len(w)) % mod
            out[i] = h
        return pd.Series(out, dtype="Int64")

    return _fp


def text_repetition(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, n_grams, n_distinct, dup_ratio) — intra-document
    repetition: fraction of word n-gram OCCURRENCES that are repeats
    of an earlier n-gram in the same doc (the Gopher-style
    duplicate-n-gram quality signal). Row-local: the gram array and
    its distinct count are computed per row with array expressions —
    no explode, no shuffle (the per-row HOF fold beats an
    explode+groupBy reshuffle here for the same reason simhash's did,
    BENCH.md round 3)."""
    ws = F.split(F.col("text"), " ")
    n_gr = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_gr - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
    )
    # guard: sequence(0, -1+? ) — when n_gr == 0 the sequence above
    # still emits index 0; slice it away with a CASE
    n_dist = F.when(n_gr == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(grams))
    )
    dup_ratio = F.when(n_gr == 0, F.lit(0.0)).otherwise(
        F.round(
            (n_gr - n_dist).cast("double") / n_gr.cast("double"), 5
        )
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n_gr.cast("int").alias("n_grams"),
        n_dist.cast("int").alias("n_distinct"),
        dup_ratio.alias("dup_ratio"),
    )


# PII patterns: the common Java-regex / RE2 subset (no lookaround), so
# the DuckDB oracle runs the IDENTICAL patterns. Order matters: emails
# are masked before phones/IPs so an address can never be re-matched.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"
PII_IP = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_mask_col(col: Column | str = "text") -> Column:
    """The masking chain as a reusable row-local Column (shared by
    pii_scrub and the curation pipeline's pii=True stage)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_IP,
        "[IP]",
    )


def pii_scrub(documents: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, text_masked, masked_md5) —
    PII redaction for training corpora: emails / intl-format phone
    numbers / IPv4 addresses are counted and replaced with typed mask
    tokens ([EMAIL], [PHONE], [IP]). Row-local regexp_count +
    regexp_replace chain — pure codegen, zero shuffle, fuses into the
    same scan as the rest of the quality pipeline at 100 TB. (A
    production deployment extends the pattern table — SSNs, IBANs,
    street addresses — the plan shape is unchanged.)

    Accounting caveat: the n_* counts are per-class matches on the
    RAW text, while masking is sequential (email, then phone, then
    IP), so a phone/IP embedded inside an email address counts toward
    its class but is swallowed by the [EMAIL] mask — n_phones can
    exceed the number of [PHONE] tokens in text_masked. Redaction
    itself is always complete (every match of every class lies inside
    some mask); the DuckDB oracle mirrors the same semantics."""
    masked = pii_mask_col()
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_PHONE)).cast("int").alias("n_phones"),
        F.regexp_count("text", F.lit(PII_IP)).cast("int").alias("n_ips"),
        masked.alias("text_masked"),
        F.md5(masked).alias("masked_md5"),
    )


def tfidf_topk(
    documents: DataFrame, k: int = 3, broadcast_df: bool = True
) -> DataFrame:
    """(doc_id, word, tf, n_tokens, df, tfidf, rnk) — per-document
    top-k keywords by corpus-weighted TF-IDF: tfidf = (tf / n_tokens)
    * ln(n_docs / df), ranked per doc (ties broken by word) and cut at
    rank k. The corpus-level statistic class (document frequency /
    inverse document frequency) the rest of the text-analysis surface
    — deliberately row-local — cannot express.

    100 TB shape: ONE whitespace explode feeds ONE (doc_id, word)
    partial-aggregated count; doc lengths and document frequencies
    both derive from that relation. (n_docs itself aggregates the
    documents relation directly — a cheap count-only scan; r7 ADVICE
    docstring fix: the old text claimed no second scan at all.)
    The df table is vocabulary-sized — tiny relative to the corpus —
    and joins back broadcast by default; pass broadcast_df=False for
    open-vocabulary corpora whose vocab outgrows broadcast limits and
    let AQE pick the strategy. The final ranking windows per doc_id
    (skew-free: a document bounds its own vocabulary). tfidf is
    rounded to 6 decimals BEFORE ranking so rank order is robust to
    last-ulp ln() differences across engines."""
    words = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("n_tokens"))
    df_tbl = tf.groupBy("word").agg(F.count("*").cast("long").alias("df"))
    if broadcast_df:
        df_tbl = F.broadcast(df_tbl)
    n_docs = F.broadcast(
        documents.agg(
            F.countDistinct(F.col("doc_id").cast("string")).alias("n_docs")
        )
    )
    scored = (
        tf.join(doclen, "doc_id")
        .join(df_tbl, "word")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf").cast("double") / F.col("n_tokens"))
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("int").alias("tf"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("df").cast("int").alias("df"),
            "tfidf",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def unigram_surprisal(
    documents: DataFrame, broadcast_lm: bool = True
) -> DataFrame:
    """(doc_id, n_tokens, surprisal) — per-document mean unigram
    surprisal under the corpus's own unigram language model:
    surprisal(doc) = sum_w tf_w * -ln(cnt_w / total) / n_tokens,
    the CCNet-style LM quality signal (high = improbable under the
    corpus model: rare words, noise, other languages; low =
    boilerplate-like). Fits corpus curation as a filter signal the
    row-local quality_score cannot express — it needs the corpus.

    100 TB shape: the SAME one-explode / one (doc,word) partial-agg
    relation as tfidf_topk; the unigram table is vocabulary-sized and
    broadcast by default (broadcast_lm=False lets AQE pick for open
    vocabularies); the final per-doc agg shuffles on doc_id
    (skew-free). Per-word terms are rounded to 6 decimals and summed
    as DECIMAL(28,6) — exact integer arithmetic, so the sum is
    independent of both task order and engine, which is what makes an
    exact cross-engine oracle possible for a float aggregate."""
    words = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(
        F.count("*").cast("long").alias("tf")
    )
    lm = tf.groupBy("word").agg(F.sum("tf").alias("cnt"))
    if broadcast_lm:
        lm = F.broadcast(lm)
    total = F.broadcast(tf.agg(F.sum("tf").alias("total")))
    term = F.round(
        F.col("tf").cast("double")
        * -F.log(F.col("cnt").cast("double") / F.col("total")),
        6,
    ).cast("decimal(28,6)")
    per_doc = (
        tf.join(lm, "word")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_toks"),
            F.sum(term).alias("s_dec"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_toks").cast("int").alias("n_tokens"),
        F.round(
            F.col("s_dec").cast("double") / F.col("n_toks").cast("double"),
            6,
        ).alias("surprisal"),
    )


def text_profile(documents: DataFrame, rep_n: int = 3) -> DataFrame:
    """The FULL per-document text-analysis profile as ONE row-local
    projection — the composite the consolidated driver query
    `text_profile` hash-checks (r4 verdict #1: six single-operator
    queries consolidated so the whole contract fits the driver's
    50-query correctness window).

    Columns are the union of text_stats + lang_id + token_counts +
    fingerprint + text_repetition + simhash, with each operator's
    original names kept (ws_tokens intentionally duplicates n_tokens —
    both operators' contracts are preserved). One scan, zero shuffle,
    zero joins: every signal is computed per row, which is also the
    right 100 TB shape (at scale these run fused into the same pass).
    The only Python is fingerprint's Arrow-batched Horner fold; the
    simhash fold is the measured-fastest formulation (BENCH.md r3)."""
    from ..operators.dedup import simhash_col

    ws = _words()
    n_tok = F.size(ws)
    n_chars = F.length("text")
    stop = _stop_hits(ws)
    n_gr = F.greatest(n_tok - (rep_n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_gr - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(ws, i + 1, rep_n), " "),
    )
    n_dist = F.when(n_gr == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(grams))
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        # text_stats
        n_tok.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars"),
        F.round(
            (n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double"), 5
        ).alias("avg_token_len"),
        F.round(stop.cast("double") / n_tok.cast("double"), 5).alias(
            "stopword_ratio"
        ),
        quality_score_col().alias("quality_score"),
        # lang_id
        F.col("lang").alias("lang"),
        F.when(stop > 0, F.lit("en")).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        F.round(stop.cast("double") / n_tok.cast("double"), 5).alias(
            "lang_conf"
        ),
        # token_counts
        n_tok.cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[^ ]{1,4}"))
        .cast("int")
        .alias("subword_tokens"),
        # fingerprint
        fingerprint_udf()("text").alias("fp"),
        F.md5("text").alias("text_md5"),
        # text_repetition
        n_gr.cast("int").alias("n_grams"),
        n_dist.cast("int").alias("n_distinct"),
        F.when(n_gr == 0, F.lit(0.0))
        .otherwise(
            F.round((n_gr - n_dist).cast("double") / n_gr.cast("double"), 5)
        )
        .alias("dup_ratio"),
        # simhash
        simhash_col().alias("simhash"),
    )
