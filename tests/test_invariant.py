"""Per-row invariant (BASELINE input_hint): span-sequence equality on
(kind, text, media_ref, order) preserved through every stage."""

from pyspark.sql import functions as F

from renet2_spark.corpus import (
    derive_spans,
    media_from_spans,
    sentences_from_spans,
    spans_fingerprint,
)
from tests.conftest import SF_SMOKE


def _spans(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return derive_spans(docs)


def test_fingerprint_stable_across_recompute(spark):
    s1 = _spans(spark).select("doc_id", spans_fingerprint().alias("fp"))
    s2 = _spans(spark).select("doc_id", spans_fingerprint().alias("fp2"))
    joined = s1.join(s2, "doc_id")
    assert joined.filter(F.col("fp") != F.col("fp2")).count() == 0


def test_sentence_media_split_reconstructs_span_sequence(spark):
    """Splitting into sentences + media and re-zipping by offset must
    reproduce the original (kind, text, media_ref, order) sequence."""
    spans = _spans(spark)
    flat = spans.select(
        "doc_id", F.posexplode("spans").alias("ord", "span")
    ).select(
        "doc_id",
        "ord",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    sents = sentences_from_spans(spans).select(
        "doc_id",
        F.col("kind"),
        F.col("sentence").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        "offset",
    )
    media = media_from_spans(spans).select(
        "doc_id",
        F.lit("figure").alias("kind"),
        F.lit("").alias("text"),
        "media_ref",
        "offset",
    )
    def seq_hash(df, ord_cols, out):
        payload = F.concat_ws(
            "\x01", "kind", "text", F.coalesce("media_ref", F.lit("-"))
        )
        arr = F.sort_array(
            F.collect_list(F.struct(*[F.col(c) for c in ord_cols], payload.alias("p")))
        )
        return df.groupBy("doc_id").agg(
            F.md5(F.array_join(F.transform(arr, lambda s: s["p"]), "\x02")).alias(out)
        )

    a = seq_hash(flat, ["ord"], "h")
    # a media span shares its offset with the FOLLOWING text span and
    # precedes it in the original sequence -> figure sorts first
    rebuilt = sents.unionByName(media).withColumn(
        "tie", F.when(F.col("kind") == "figure", 0).otherwise(1)
    )
    b = seq_hash(rebuilt, ["offset", "tie"], "h2")
    bad = a.join(b, "doc_id").filter(F.col("h") != F.col("h2")).count()
    assert bad == 0


def test_offsets_match_doc_text(spark):
    """Every sentence's offset slices the reconstructed doc text to the
    sentence itself — offsets survive the span derivation."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    sents = sentences_from_spans(_spans(spark))
    j = sents.join(docs, "doc_id").withColumn(
        "cut",
        F.expr("substring(text, offset + 1, length(sentence))"),
    )
    assert j.filter(F.col("cut") != F.col("sentence")).count() == 0


def test_sentences_direct_equals_span_path(spark):
    from renet2_spark.corpus import sentences_direct

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = sentences_direct(docs)
    b = sentences_from_spans(derive_spans(docs))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
