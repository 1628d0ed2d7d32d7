"""Python UDTF surface (Spark 4 table functions).

The reference's extension hooks are row-level scalar scripts
(ProcessInputRow / ScriptType, SURVEY §2.9); the Spark-native
generalization of "one row in, many rows out" scripting is the Python
UDTF. It is deliberately the engine's *last-resort* tier — row-at-a-
time Python, no codegen — so the registered example keeps the input
bounded and the docstring points at explode()/inline() for anything
expressible as column math. The point here is API-surface parity plus
proof that the lateral-join plumbing (arguments from the outer row,
schema declaration, deterministic output) works end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..catalog import load_table
from .registry import register


@udtf(returnType="installment_no int, amount double")
class InstallmentSplit:
    """Split an order total into n equal installments; the last one
    absorbs the double-arithmetic remainder so the sum is exact."""

    def eval(self, total: float, n: int):  # noqa: D102
        if total is None or n is None or n <= 0:
            return
        per = total / n
        for i in range(1, n + 1):
            yield (i, per if i < n else total - (n - 1) * per)


@register(
    "q_udtf_installments",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 2 ELSE 3 END AS n
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           unnest(generate_series(1, n)) AS installment_no,
           n AS n_installments
    FROM base
    """,
    doc="Lateral Python UDTF: each order expands into its installment "
        "schedule (urgent orders pay in 2, others in 3). This oracle "
        "covers the row-expansion contract (keys x installment "
        "numbers); the amount arithmetic is covered by the in-query "
        "exactness gate in q_udtf_installment_amounts.",
    tags=("udtf", "explode"),
)
def q_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _installments(spark, sf_dir)
    return df.select("o_orderkey", "installment_no", "n_installments")


@register(
    "q_udtf_installment_amounts",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 2 ELSE 3 END AS n
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           unnest(generate_series(1, n)) AS installment_no,
           CASE WHEN unnest(generate_series(1, n)) < n
                THEN total / n
                ELSE total - (n - 1) * (total / n) END AS amount
    FROM base
    """,
    doc="The UDTF's emitted amounts, value-checked cell-for-cell: the "
        "Python kernel and the SQL oracle perform the identical IEEE "
        "double operations (total/n; last = total - (n-1)*(total/n)), "
        "so the hashes match bit-exactly — the strongest check a "
        "Python-side extension point can get.",
    tags=("udtf", "explode"),
)
def q_udtf_installment_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _installments(spark, sf_dir)
    return df.select("o_orderkey", "installment_no", "amount")


def _installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 2000
    )
    base = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 2)
        .otherwise(3)
        .cast("int")
        .alias("n_installments"),
    )
    spark.udtf.register("installment_split", InstallmentSplit)
    base.createOrReplaceTempView("_udtf_base")
    return spark.sql(
        """
        SELECT b.o_orderkey, b.n_installments, s.installment_no, s.amount
        FROM _udtf_base b,
             LATERAL installment_split(b.total, b.n_installments) s
        """
    )
