"""Fifth relational batch: lateral explode joins and aggregation-based
top-k-per-group (the window-sort-free plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "q_explode_join",
    oracle="""
    SELECT w.word, COUNT(*) AS n_docs, COUNT(DISTINCT d.lang) AS n_langs
    FROM documents d,
         unnest(list_distinct(string_split(d.text, ' '))) AS t(word)
    JOIN (VALUES ('spark'), ('query'), ('table'), ('join')) AS w(word)
      ON t.word = w.word
    GROUP BY w.word
    """,
    doc="Lateral explode (flatten tokens) joined to a tiny keyword dim — "
        "the flatten-then-equi-join shape.",
    tags=("join", "explode"),
)
def q_explode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keywords = spark.createDataFrame(
        [("spark",), ("query",), ("table",), ("join",)], "word string"
    )
    tokens = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    )
    return (
        tokens.join(F.broadcast(keywords), "word")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register(
    "q_posexplode",
    oracle="""
    SELECT doc_id, CAST(t.i - 1 AS INT) AS pos,
           string_split(d.text, ' ')[CAST(t.i AS INT)] AS word
    FROM documents d,
         unnest(range(1, least(len(string_split(d.text, ' ')), 5) + 1)) AS t(i)
    WHERE doc_id < 50
    """,
    doc="Positional explode: first five tokens with their ordinals.",
    tags=("explode",),
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .filter(F.col("pos") < 5)
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "word")
    )


@register(
    "q_topk_per_group_agg",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 2
    """,
    doc="Top-2 per group via partial-aggregating collect+sort+slice — no "
        "window sort over the full table; the oracle takes the window "
        "road, proving plan equivalence.",
    tags=("agg", "topk"),
)
def q_topk_per_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # pack (acctbal desc, custkey asc) into a sortable struct; collect per
    # group, sort, slice top-2, re-explode. Partial aggregation trims
    # candidates map-side — at scale this avoids the full window sort.
    packed = F.struct(
        (-F.col("c_acctbal")).alias("neg_bal"), F.col("c_custkey").alias("ck")
    )
    top = (
        cust.groupBy("c_nationkey")
        .agg(F.slice(F.sort_array(F.collect_list(packed)), 1, 2).alias("top"))
        .select("c_nationkey", F.posexplode("top").alias("pos", "row"))
    )
    return top.select(
        "c_nationkey",
        F.col("row.ck").alias("c_custkey"),
        (-F.col("row.neg_bal")).alias("c_acctbal"),
        (F.col("pos") + 1).cast("int").alias("rn"),
    )
