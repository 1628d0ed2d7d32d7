"""Data-profiling query surface.

The reference's only metadata operation is all-string schema inference
(CSVProvider.cs:281-315); a data-integration engine also needs column
profiling to validate feeds before loading. One Spark job profiles every
requested column: a single wide aggregate computes per-column null and
distinct counts (Catalyst plans multi-distinct via Expand — one pass over
the data, partial aggregation map-side), then ``stack`` pivots the
metrics into one row per column. No per-column jobs, no collect loop —
profiling 100 TB costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: total rows, nulls, null ratio, distinct count
    (exact). Single aggregate job regardless of column count."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{i}, __nd_{i}" for i, c in enumerate(cols)
    )
    tall = wide.select(
        F.col("__n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        ),
    )
    return tall.select(
        "col_name",
        F.col("__n").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        (F.col("n_nulls") / F.col("__n")).cast("double").alias("null_ratio"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


_PROFILE_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount"]


def _oracle_for(cols: list[str]) -> str:
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST((COUNT(*) - COUNT({c})) AS DOUBLE) / COUNT(*)
                 AS null_ratio,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM lineitem
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)


@register(
    "q_profile_table",
    oracle=_oracle_for(_PROFILE_COLS),
    doc="Per-column profiling (rows/nulls/null-ratio/exact distinct) in "
        "ONE aggregate job over all columns — Catalyst's Expand-based "
        "multi-distinct keeps it a single scan at any table size.",
    tags=("profiling", "agg"),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(
        load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS
    )


@register(
    "q_fuzzy_match",
    oracle="""
    WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 400)
    SELECT a.c_custkey AS a, b.c_custkey AS b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM c a JOIN c b ON a.c_custkey < b.c_custkey
    WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
      AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    doc="Fuzzy record matching: customer-name pairs within edit distance "
        "2. The length-difference prune is the standard lossless filter "
        "(|len(a)-len(b)| <= k bounds the distance from below), applied "
        "inside the self-join condition so most pairs never reach the "
        "O(len^2) levenshtein kernel — the same blocking discipline a "
        "100 TB entity-resolution pass needs (there, a proper blocking "
        "key replaces the residual O(n^2) pair space).",
    tags=("text", "fuzzy", "join"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 400
    ).select("c_custkey", "c_name")
    a = cust.select(F.col("c_custkey").alias("a"), F.col("c_name").alias("na"))
    b = cust.select(F.col("c_custkey").alias("b"), F.col("c_name").alias("nb"))
    dist = F.levenshtein(F.col("na"), F.col("nb"))
    return (
        a.join(
            b,
            (F.col("a") < F.col("b"))
            & (F.abs(F.length("na") - F.length("nb")) <= 1)
            & (dist <= 2),
        )
        .select("a", "b", dist.cast("int").alias("dist"))
    )
