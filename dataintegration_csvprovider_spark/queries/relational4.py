"""Fourth relational batch: cross join, distribution windows, regex
rewrite functions, sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(r.r_regionkey = n.n_regionkey AS INT) AS is_home
    FROM region r CROSS JOIN nation n
    """,
    doc="Cross join of the two smallest dims (125 pairs) with a derived "
        "membership flag.",
    tags=("join", "cross"),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") == F.col("n_regionkey")).cast("int").alias("is_home"),
    )


@register(
    "q_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CUME_DIST() OVER w AS cume,
           PERCENT_RANK() OVER w AS pct_rank
    FROM orders
    WHERE o_orderkey <= 3000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution window functions (cume_dist / percent_rank) with a "
        "deterministic total order.",
    tags=("window", "distribution"),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.cume_dist().over(w).alias("cume"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "q_regexp_rewrite",
    oracle="""
    SELECT doc_id,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked,
           regexp_replace(substr(text, 1, 50), '\\s+', '_', 'g') AS head_snake,
           CAST(regexp_matches(text, 'spark|query') AS INT) AS mentions_engine,
           split_part(source, 'c', 1) AS source_head
    FROM documents
    WHERE doc_id < 300
    """,
    doc="Regex rewrite/extract family: global replace, whitespace "
        "normalization, boolean match, split_part.",
    tags=("scalar", "regex"),
)
def q_regexp_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return docs.select(
        "doc_id",
        F.regexp_replace("text", "[0-9]+", "#").alias("digits_masked"),
        F.regexp_replace(F.substring("text", 1, 50), "\\s+", "_").alias(
            "head_snake"
        ),
        F.regexp_like("text", F.lit("spark|query")).cast("int").alias(
            "mentions_engine"
        ),
        F.split_part("source", F.lit("c"), F.lit(1)).alias("source_head"),
    )


@register(
    "q_stratified_sample",
    # seeded Bernoulli sampling is engine- AND partitioning-specific, so
    # the sampled ROW SET has no cross-engine oracle — but its laws do:
    # the sample is a duplicate-free subset of the input, and each
    # stratum's observed fraction sits inside a wide Bernoulli band
    # around its target (p/3 .. 2.5p, asserted only when the stratum has
    # >= 100 rows so tiny fixtures can't fail on variance; measured
    # 0.099-0.135 against p=0.1 and 0.505-0.54 against p=0.5 at
    # sf0.01/0.1). The exact-sample companion q_stratified_sample_det
    # (hash-rank based) is fully value-checked.
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS distinct_ok, TRUE AS frac_ok
    FROM customer GROUP BY c_mktsegment
    """,
    doc="Gate over the seeded stratified sample (50% of BUILDING, 10% "
        "of the rest): per-stratum subset distinctness and observed "
        "fraction within the Bernoulli band of its target.",
    tags=("sample", "quality"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    fractions = {"BUILDING": 0.5}
    other = {
        r.c_mktsegment: 0.1
        for r in cust.select("c_mktsegment").distinct().collect()
        if r.c_mktsegment != "BUILDING"
    }
    samp = cust.sampleBy(
        "c_mktsegment", {**fractions, **other}, seed=42
    ).select("c_custkey", "c_mktsegment")
    totals = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    sampled = samp.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_samp"),
        F.count_distinct("c_custkey").alias("n_distinct"),
    )
    p = F.when(F.col("c_mktsegment") == "BUILDING", F.lit(0.5)).otherwise(
        F.lit(0.1)
    )
    joined = totals.join(sampled, "c_mktsegment", "left").select(
        "c_mktsegment",
        "n_total",
        F.coalesce(F.col("n_samp"), F.lit(0)).alias("n_samp"),
        F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
        p.alias("p"),
    )
    return joined.select(
        "c_mktsegment",
        "n_total",
        (F.col("n_distinct") == F.col("n_samp")).alias("distinct_ok"),
        (
            (F.col("n_total") < 100)
            | (
                (F.col("n_samp") >= F.col("n_total") * F.col("p") / 3)
                & (F.col("n_samp") <= F.col("n_total") * F.col("p") * 2.5)
            )
        ).alias("frac_ok"),
    )


@register(
    "q_stratified_sample_det",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM (
      SELECT c_custkey, c_mktsegment,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY (c_custkey * 2654435761) % 4294967296, c_custkey
             ) AS rn
      FROM customer)
    WHERE rn <= 50
    """,
    doc="Deterministic stratified sample: exactly 50 customers per "
        "segment, chosen by Knuth-multiplicative-hash rank — identical "
        "across engines and runs (unlike RNG sampleBy), so the sample "
        "itself is oracle-checkable. One shuffle on the stratum key.",
    tags=("sample", "window"),
)
def q_stratified_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        (F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296),
        F.col("c_custkey"),
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("c_custkey", "c_mktsegment")
    )
