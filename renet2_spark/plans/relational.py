"""Generic relational operator coverage (SURVEY §2.2-2.7 classes) over
the TPC-H-ish testdata, plus the P/R metrics join (J5).

Each function is the Spark side of an oracle-checked query; together
they exercise the operator classes the KG pipeline uses — left join +
fillna (J1, reference raw_handler.py:45-47), semi/anti joins (J7,
raw.py:1142-1166; set membership sequence_utils.py:291), grouped
aggregation + threshold (A1, predict.py:120-128), window ranking (W3,
predict.py:120-140), lag-shaped windows (W1), union+distinct
(predict.py:434-438 / raw.py:1146), sort+limit top-k (raw.py:1172),
and the metrics inner join (J5,
benchmark/calculate_metrics_with_input.py:21-26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rel_agg_filter(spark, sf_dir) -> DataFrame:
    """A1/F-class: filtered grouped aggregation (Q1-shaped)."""
    li = _t(spark, sf_dir, "lineitem")
    # doubles are summed as DECIMAL: double addition is order-dependent
    # and Spark's partial aggregation order differs from DuckDB's —
    # decimal sums are exact, hence engine- and partitioning-invariant
    rev_term = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(rev_term).cast("double"), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )


def rel_join_left_fillna(spark, sf_dir) -> DataFrame:
    """J1: left equi join + null fill (labels-join shape)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("c_name", F.lit("UNKNOWN")).alias("cust_name"),
            F.coalesce("c_acctbal", F.lit(0.0)).alias("acctbal"),
        )
    )


def rel_semi(spark, sf_dir) -> DataFrame:
    """left_semi: customers having >= 1 order (set membership)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey")


def rel_anti(spark, sf_dir) -> DataFrame:
    """left_anti: customers with no orders (exclusion-list shape J7)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_nationkey")


def rel_window_rank(spark, sf_dir) -> DataFrame:
    """W3: top-3 orders per customer by price (window-ranked dedup
    shape)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
    )


def rel_window_lag(spark, sf_dir) -> DataFrame:
    """W1-shaped lag comparison: per-user event value deltas."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.col("value") - F.lag("value", 1, 0.0).over(w), 5
        ).alias("value_delta"),
    )


def rel_union_distinct(spark, sf_dir) -> DataFrame:
    """Set op: union + distinct over two key sources."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"), F.lit("order").alias("src")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("src")
    )
    return o.unionByName(c).distinct()


def rel_topk(spark, sf_dir) -> DataFrame:
    """Sort + limit with a total order (deterministic top-k)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def rel_grouping_top_nation(spark, sf_dir) -> DataFrame:
    """Join + agg + having: revenue-bearing customers per nation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            # no round(): round-half behavior differs between engines at
            # exact .5 boundaries; the raw double quotient is identical
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_acctbal"),
        )
        .filter(F.col("n_customers") > 1)
    )


def rel_json_extract(spark, sf_dir) -> DataFrame:
    """T10: JSON field access (reference parse_data.py:149-170 walks
    BioC-JSON passages) + grouped agg over the extracted value."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


# ---- consolidated operator suites (r4 verdict #1) ------------------------
# The ten single-operator rel_* queries above stay as the library
# surface; the driver contract exercises them through three COMPOSED
# plans so the whole contract fits the driver's 50-query correctness
# window. Each suite is one genuinely-composed DataFrame plan with one
# exact DuckDB oracle.


def rel_suite_join(spark, sf_dir) -> DataFrame:
    """Join suite: semi + anti + union + left join + fillna + grouped
    aggregation in ONE plan (J1/J7/J8 + §2.7). Customer grain: status
    from a semi/anti split, per-customer order stats left-joined with
    null fill for the order-less customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "status", F.lit("active")
    )
    inactive = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "status", F.lit("none")
    )
    base = active.unionByName(inactive).select(
        "c_custkey", "c_name", "status"
    )
    stats = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("_total"),
    )
    return base.join(
        stats, base.c_custkey == stats.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        "status",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("_total", F.lit(0.0)).alias("total_spent"),
    )


def rel_suite_window(spark, sf_dir) -> DataFrame:
    """Window suite: row_number rank + lag delta + deterministic
    top-k limit in ONE plan (W1/W3 + §2.6). Both window functions
    share one (o_custkey, price desc, orderkey) window — one sort."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "price_delta",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w),
                5,
            ),
        )
        .filter(F.col("rank") <= 3)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice",
                "price_delta")
    )


def rel_suite_setagg(spark, sf_dir) -> DataFrame:
    """Set-op/aggregation suite: three grouped aggregations (JSON
    extraction over events, broadcast join + having over
    customer x nation, the Q1-shaped decimal-exact lineitem agg)
    harmonized to one schema and UNION + DISTINCT'd — the events
    branch is unioned TWICE so the distinct is observable (it must
    collapse the duplicate branch)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    ev = (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("double").alias("v1"),
            F.max("k").cast("double").alias("v2"),
        )
        .select(
            F.lit("events").alias("src"),
            F.col("event_type").alias("grp"),
            "n", "v1", "v2",
        )
    )
    c = _t(spark, sf_dir, "customer")
    nt = _t(spark, sf_dir, "nation")
    nat = (
        c.join(F.broadcast(nt), c.c_nationkey == nt.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("v1"),
        )
        .filter(F.col("n") > 1)
        .select(
            F.lit("nation").alias("src"),
            F.col("n_name").alias("grp"),
            "n", "v1",
            F.lit(0.0).alias("v2"),
        )
    )
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    q1 = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("v1"),
            F.round(F.sum(rev).cast("double"), 2).alias("v2"),
        )
        .select(
            F.lit("lineitem").alias("src"),
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("grp"),
            "n", "v1", "v2",
        )
    )
    return ev.unionByName(ev).unionByName(nat).unionByName(q1).distinct()


# ---- P/R metrics join (J5) ----------------------------------------------


def pr_metrics(
    predicted: DataFrame, gold: DataFrame, keys: list[str]
) -> DataFrame:
    """Precision/recall/F1 via inner join on the id triple — exactly
    the reference's benchmark metric
    (benchmark/calculate_metrics_with_input.py:21-26). One row.

    ONE action: a full-outer join of the two distinct key sets with
    side markers, aggregated in a single pass (the previous 3x
    .count() formulation recomputed the full upstream pipeline three
    times per metrics call — round-1 verdict wrong-list #4)."""
    p = predicted.select(*keys).distinct().withColumn("_p", F.lit(1))
    g = gold.select(*keys).distinct().withColumn("_g", F.lit(1))
    row = (
        p.join(g, keys, "full_outer")
        .agg(
            F.sum(
                F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(F.coalesce("_p", F.lit(0))).alias("n_p"),
            F.sum(F.coalesce("_g", F.lit(0))).alias("n_g"),
        )
        .first()
    )
    tp, n_p, n_g = int(row["tp"] or 0), int(row["n_p"] or 0), int(row["n_g"] or 0)
    prec = tp / n_p if n_p else 0.0
    rec = tp / n_g if n_g else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    spark = predicted.sparkSession
    return spark.createDataFrame(
        [(tp, n_p, n_g, round(prec, 5), round(rec, 5), round(f1, 5))],
        "tp long, n_pred long, n_gold long, precision double, "
        "recall double, f1 double",
    )


def kg_pr_vs_strong_cooc(spark, sf_dir) -> DataFrame:
    """Metrics query: edges vs a 'gold' of strongly co-occurring pairs
    (n_cooc_sents >= 3) — demonstrates J5 end-to-end with an oracle."""
    from ..corpus import load_documents
    from ..operators.pairgen import sentence_pair_candidates
    from .pipeline import build_edges, build_mentions

    docs = load_documents(spark, sf_dir)
    edges = build_edges(spark, docs)
    gold = sentence_pair_candidates(build_mentions(spark, docs)).filter(
        F.col("n_cooc_sents") >= 3
    )
    return pr_metrics(edges, gold, ["doc_id", "gene_id", "disease_id"])


def kg_threshold_sweep(spark, sf_dir) -> DataFrame:
    """Decision-threshold sweep with argmax-F1 (reference
    model.py:811-823 sweeps 100 candidate thresholds and keeps the
    best): cross join of scored pairs x threshold grid, grouped
    metric, deterministic argmax. Gold = strong co-occurrence
    (n_cooc_sents >= 3)."""
    from ..corpus import load_documents
    from ..operators.pairgen import entity_info, sentence_pair_candidates
    from ..operators.scorer import score_and_vote
    from .pipeline import build_mentions

    m = build_mentions(spark, load_documents(spark, sf_dir))
    pairs = sentence_pair_candidates(m)
    info = entity_info(m)
    g = info.filter(F.col("type") == "Gene").select(
        "doc_id",
        F.col("entity_id").alias("gene_id"),
        F.col("n_mentions").alias("n_g"),
    )
    d = info.filter(F.col("type") != "Gene").select(
        "doc_id",
        F.col("entity_id").alias("disease_id"),
        F.col("n_mentions").alias("n_d"),
    )
    scored = score_and_vote(
        pairs.join(g, ["doc_id", "gene_id"]).join(d, ["doc_id", "disease_id"]),
        cutoff=0,
    ).select(
        "prob_avg", (F.col("n_cooc_sents") >= 3).alias("gold")
    )
    grid = spark.range(1, 19).select(
        (F.col("id") / F.lit(20.0)).alias("threshold")
    )
    swept = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when((F.col("prob_avg") > F.col("threshold")) & F.col("gold"), 1)
                .otherwise(0)
            ).cast("bigint").alias("tp"),
            F.sum(
                F.when(F.col("prob_avg") > F.col("threshold"), 1).otherwise(0)
            ).cast("bigint").alias("n_pred"),
            F.sum(F.when(F.col("gold"), 1).otherwise(0)).cast("bigint").alias("n_gold"),
        )
    )
    prec = F.col("tp") / F.col("n_pred")
    rec = F.col("tp") / F.col("n_gold")
    f1 = F.when(
        (F.col("tp") > 0), 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return (
        swept.withColumn("f1", f1)
        .orderBy(F.desc("f1"), F.asc("threshold"))
        .limit(1)
        .select("threshold", "tp", "n_pred", "n_gold", "f1")
    )
