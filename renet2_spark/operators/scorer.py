"""Deterministic ensemble scorer + vote + edge materialization.

The reference scores every candidate pair with an ensemble of 10
CNN+BiGRU classifiers, one sequential full pass per model with a TSV
round-trip between them (src/renet2/predict.py:63-118), then
outer-merges the 10 result frames, computes hit_cnt and prob_avg, and
thresholds hit_cnt >= max(1, N//2) (predict.py:104-140, cutoff at
122-124).

This module keeps the exact ensemble/vote/format semantics but with a
**calibrated piecewise-linear scorer** whose logit is a deterministic
function of the pair evidence features — fully expressible in ANSI SQL
so the DuckDB oracle can verify it bit-for-bit (pure IEEE arithmetic,
no libm). The real neural scorer (NumPy CNN+BiGRU over Arrow batches,
reference model.py:289-450) lives in operators/neural.py and plugs
into the same vote/materialize stages.

Spark-first restructure (SURVEY §4): instead of N passes + N files +
N-way outer join, all N model scores are computed in ONE row-local
array expression (`transform(sequence(0, N-1), ...)`) — zero shuffle,
zero extra scans; the ensemble collapse that was the reference's
biggest algorithmic cost disappears into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_MODELS = 10  # reference predict.py:316
# vote cutoff max(1, N//2); sensitive mode uses 1 (predict.py:122-124)
CUTOFF = max(1, N_MODELS // 2)

# logit coefficients of the deterministic ensemble member i
W_COOC, W_CNT, BIAS, MODEL_STEP = 1.2, 0.2, -3.0, -0.3


def model_logit(n_cooc: Column, n_g: Column, n_d: Column, i: Column) -> Column:
    return (
        F.lit(W_COOC) * n_cooc
        + F.lit(W_CNT) * (n_g + n_d)
        + F.lit(BIAS)
        + F.lit(MODEL_STEP) * i
    )


def _prob_col(i: float) -> Column:
    """Model i's piecewise-linear probability as an ordinary
    (whole-stage-codegen) expression — float semantics identical to
    the transform/aggregate HOF formulation and the DuckDB oracle."""
    logit = model_logit(
        F.col("n_cooc_sents").cast("double"),
        F.col("n_g").cast("double"),
        F.col("n_d").cast("double"),
        F.lit(i),
    )
    return F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.lit(0.5) + logit / F.lit(8.0))
    )


def score_and_vote(pairs: DataFrame, cutoff: int = CUTOFF) -> DataFrame:
    """Fused deterministic scorer + ensemble vote with zero lambda
    HOFs (Spark evaluates HOF lambdas interpreted — measured hot in
    the reduce stage). Adds hit_cnt, prob_avg, prob_X; filters by the
    vote cutoff. Bit-identical to ensemble_vote(score_pairs(...)):
    the prob sum keeps the same left-fold association."""
    probs = [_prob_col(float(i)) for i in range(N_MODELS)]
    hit = None
    for p in probs:
        term = F.when(p > F.lit(0.5), F.lit(1)).otherwise(F.lit(0))
        hit = term if hit is None else hit + term
    s = F.lit(0.0)
    for p in probs:
        s = s + p
    prob_x = F.concat_ws(";", *[F.format_number(p, 5) for p in probs])
    return (
        pairs.withColumn("hit_cnt", hit.cast("int"))
        .withColumn("prob_avg", F.round(s / F.lit(float(N_MODELS)), 5))
        .withColumn("prob_X", prob_x)
        .filter(F.col("hit_cnt") >= F.lit(cutoff))
    )


def score_pairs(pairs: DataFrame) -> DataFrame:
    """pairs(+features) -> + probs array<double>, per-model piecewise-
    linear 'sigmoid' clamp(0.5 + logit/8, 0, 1). Row-local, codegen."""
    probs = F.transform(
        F.sequence(F.lit(0), F.lit(N_MODELS - 1)),
        lambda i: F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                + model_logit(
                    F.col("n_cooc_sents").cast("double"),
                    F.col("n_g").cast("double"),
                    F.col("n_d").cast("double"),
                    i.cast("double"),
                )
                / F.lit(8.0),
            ),
        ),
    )
    return pairs.withColumn("probs", probs)


def ensemble_vote(scored: DataFrame, cutoff: int = CUTOFF) -> DataFrame:
    """hit_cnt / prob_avg / prob_X + vote filter (reference
    predict.py:104-140). prob_X keeps per-model order with ';' join and
    5-decimal formatting (predict.py:131-136, format '{:,.5f}')."""
    hit_cnt = F.size(F.filter(F.col("probs"), lambda p: p > F.lit(0.5)))
    prob_avg = F.round(
        F.aggregate(
            F.col("probs"), F.lit(0.0), lambda a, p: a + p
        )
        / F.lit(float(N_MODELS)),
        5,
    )
    prob_x = F.concat_ws(
        ";", F.transform(F.col("probs"), lambda p: F.format_number(p, 5))
    )
    return (
        scored.withColumn("hit_cnt", hit_cnt.cast("int"))
        .withColumn("prob_avg", prob_avg)
        .withColumn("prob_X", prob_x)
        .filter(F.col("hit_cnt") >= F.lit(cutoff))
    )


def attach_names(edges: DataFrame, entity_info: DataFrame) -> DataFrame:
    """Name attachment (reference predict.py:162-203): join the shared
    per-(doc, entity) info table, '|'-joined distinct surfaces. The
    reference keeps first-seen order; distributed execution makes that
    nondeterministic, so we impose sorted order (documented in
    SURVEY §7.2d) — comparisons treat names as sets."""
    g = entity_info.filter(F.col("type") == "Gene").select(
        "doc_id", F.col("entity_id").alias("gene_id"), F.col("name").alias("g_name")
    )
    d = entity_info.filter(F.col("type") != "Gene").select(
        "doc_id",
        F.col("entity_id").alias("disease_id"),
        F.col("name").alias("d_name"),
    )
    return edges.join(g, ["doc_id", "gene_id"]).join(d, ["doc_id", "disease_id"])


def materialize_edges(voted: DataFrame, entity_info: DataFrame) -> DataFrame:
    """Final triple table (reference gda_rst.tsv 7 columns,
    predict.py:203-213 / README.md:227-234) + fixed predicate."""
    return attach_names(voted, entity_info).select(
        "doc_id",
        "gene_id",
        F.lit("associated_with").alias("predicate"),
        "disease_id",
        "g_name",
        "d_name",
        "prob_avg",
        "hit_cnt",
    )


def dedupe_edges(edges: DataFrame) -> DataFrame:
    """Window-ranked confidence dedup (north_star: 'deduplicated with
    window-ranked confidence aggregation'; reference analogue
    drop_duplicates + mean, predict.py:120-140): keep the
    highest-confidence row per (doc_id, gene_id, disease_id)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id", "gene_id", "disease_id").orderBy(
        F.desc("prob_avg"), F.desc("hit_cnt")
    )
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
