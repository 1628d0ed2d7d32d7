"""CSV-layer queries (SURVEY.md §2.1-§2.6): the reference's core surface,
oracle-checked end-to-end.

Each query exercises the real pipeline — fixture parquet → CsvSink (the
reference's quoting/NULL/newline semantics) → CsvSource scan → mapping
compile — and returns a DataFrame whose oracle is plain SQL over the
original table. A value that survives the round trip and still hash-matches
proves the CSV semantics are lossless where the reference's are.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.datetimefmt import format_reference_datetime
from ..plans.conditionals import Conditional
from ..plans.mapping_compiler import ColumnMapping, Mapping, compile_mapping
from ..sinks.csv_sink import CsvSink
from ..sources.csv_source import CsvSource, CsvSourceOptions
from .registry import dsum, register, sql_dsum


def _roundtrip(spark: SparkSession, df: DataFrame, table: str,
               src_options: CsvSourceOptions | None = None) -> DataFrame:
    """parquet df → CsvSink single-file write → CsvSource scan."""
    d = tempfile.mkdtemp(prefix=f"csvops_{table}_")
    CsvSink(folder=d).write(df, table)
    src = CsvSource(folder=d, options=src_options or CsvSourceOptions())
    return src.read(spark, table)


@register(
    "q_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="S1/K1/K3: write nation through the sink, scan it back, re-type.",
    tags=("csv",),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    back = _roundtrip(spark, nation, "nation")
    return back.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        F.col("n_name").alias("n_name"),
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


@register(
    "q_csv_mapping_pipeline",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS cust_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal, 'csv' AS src
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
    doc="P1/F1/T3/T4: conditionals + project/rename/retype + constant via "
        "the mapping compiler over a CSV scan.",
    tags=("csv", "mapping"),
)
def q_csv_mapping_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    back = _roundtrip(spark, cust, "customer")
    mapping = Mapping(
        source_table="customer",
        column_mappings=[
            ColumnMapping(source_column="c_custkey", destination_column="custkey",
                          dest_type="bigint"),
            ColumnMapping(source_column="c_name", destination_column="cust_name"),
            ColumnMapping(source_column="c_acctbal", destination_column="acctbal",
                          dest_type="double"),
            ColumnMapping(destination_column="src", constant="csv"),
        ],
        conditionals=[Conditional("c_mktsegment", "eq", "BUILDING")],
    )
    return compile_mapping(back, mapping)


@register(
    "q_csv_null_sentinel",
    oracle="""
    SELECT COALESCE(NULLIF(o_orderstatus, 'O'), '<null>') AS status,
           COUNT(*) AS n
    FROM orders
    GROUP BY COALESCE(NULLIF(o_orderstatus, 'O'), '<null>')
    """,
    doc="F3/K3: SQL NULLs survive the unquoted-NULL sentinel round trip.",
    tags=("csv", "null"),
)
def q_csv_null_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    with_nulls = orders.select(
        F.nullif("o_orderstatus", F.lit("O")).alias("status_raw")
    )
    back = _roundtrip(spark, with_nulls, "orders_nulls")
    return (
        back.select(F.coalesce("status_raw", F.lit("<null>")).alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_csv_decimal_comma",
    oracle=f"""
    SELECT l_returnflag, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="T1/T2: comma-decimal CSV cells parse back to the exact doubles.",
    tags=("csv", "decimal"),
)
def q_csv_decimal_comma(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # render quantities with ',' decimals, as a European-locale file would
    commas = li.select(
        "l_returnflag",
        F.replace(F.col("l_quantity").cast("string"), F.lit("."), F.lit(","))
        .alias("l_quantity"),
    )
    back = _roundtrip(spark, commas, "lineitem_commas")
    mapping = Mapping(
        source_table="lineitem_commas",
        column_mappings=[
            ColumnMapping(source_column="l_returnflag"),
            ColumnMapping(source_column="l_quantity", dest_type="double"),
        ],
    )
    typed = compile_mapping(back, mapping, decimal_separator=",")
    return typed.groupBy("l_returnflag").agg(dsum(F.col("l_quantity")).alias("sum_qty"))


@register(
    "q_csv_dialects",
    oracle="""
    SELECT 'tab' AS dialect, COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM supplier
    UNION ALL
    SELECT 'comma', COUNT(*),
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE)
    FROM supplier
    """,
    doc="S1 dialect coverage: the same table round-tripped through "
        "tab-delimited/'-quoted and comma-delimited variants must agree.",
    tags=("csv", "dialect"),
)
def q_csv_dialects(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sinks.csv_sink import CsvSinkOptions

    supplier = load_table(spark, sf_dir, "supplier")
    out = []
    for dialect, sep, quote in [("tab", "\t", "'"), ("comma", ",", '"')]:
        d = tempfile.mkdtemp(prefix=f"dialect_{dialect}_")
        CsvSink(
            folder=d, options=CsvSinkOptions(delimiter=sep, quote=quote)
        ).write(supplier, "supplier")
        src = CsvSource(
            folder=d,
            options=CsvSourceOptions(delimiter=sep, quote=quote),
        )
        back = src.read(spark, "supplier")
        out.append(
            back.agg(
                F.lit(dialect).alias("dialect"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("s_acctbal").cast("decimal(18,6)"))
                .cast("double")
                .alias("total"),
            )
        )
    return out[0].unionByName(out[1])


@register(
    "q_csv_datetime_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d-%m-%Y %H:%M:%S:%g') AS rendered
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    doc="T5: reference dd-MM-yyyy HH:mm:ss:fff render of order dates.",
    tags=("csv", "datetime"),
)
def q_csv_datetime_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        format_reference_datetime(F.col("o_orderdate")).alias("rendered"),
    )
