"""Storage-layout operators: hive-partitioned writes, partition
pruning (static and dynamic), and small-file compaction.

At 100 TB the dominant cost is what you *don't* read: a fact table
partitioned on a low-cardinality predicate column lets the scan skip
whole directories (static pruning when the predicate is literal,
dynamic partition pruning when it arrives through a dim join), and
compaction keeps file counts from exploding the driver's split
planning. These queries make each effect *observable*: the physical
plan (or the file census via ``input_file_name``) is distilled into a
boolean/count column the DuckDB oracle pins, so a regression that
silently stops pruning or compacting flips the value hash.

Reference parity: the reference's only layout notion is one-CSV-per-
table in a folder (CSVProvider.cs:641-656); partitioned directories
are the Spark-native generalization of that file-per-unit model.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, register, sql_dsum


def _partition_filter_applied(df: DataFrame, col: str) -> bool:
    """True iff ``df``'s scan carries a partition filter on ``col``.

    Reads the executed-plan string: a pruned scan shows
    ``PartitionFilters: [... col ...]``; an unpruned one has an empty
    list (the filter would instead appear post-scan). Lazy — no job
    runs.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    for part in plan.split("PartitionFilters:")[1:]:
        if col in part[: part.find("]") + 1]:
            return True
    return False


def _has_dynamic_pruning(df: DataFrame) -> bool:
    """True iff the executed plan contains a dynamic-partition-pruning
    expression (a dim-join-derived runtime partition filter)."""
    return "dynamicpruning" in (
        df._jdf.queryExecution().executedPlan().toString().lower()
    )


@register(
    "q_partition_prune_static",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS total_value,
           TRUE AS partition_pruned
    FROM events
    WHERE event_type = 'click'
    """,
    doc="Hive-partitioned parquet write (partitionBy event_type) read "
        "back with a literal partition predicate; the plan's "
        "PartitionFilters entry — directory-level skipping, the scan "
        "never opens the other partitions — is surfaced as a boolean "
        "the oracle pins TRUE.",
    tags=("layout", "source", "parquet"),
)
def q_partition_prune_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="layout_static_")
    try:
        ev.write.mode("overwrite").partitionBy("event_type").parquet(f"{d}/fact")
        pruned = spark.read.parquet(f"{d}/fact").filter(
            F.col("event_type") == "click"
        )
        ok = _partition_filter_applied(pruned, "event_type")
        return (
            pruned.agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(F.col("value")).alias("total_value"),
            )
            .withColumn("partition_pruned", F.lit(ok))
            # materialize before the temp dir vanishes
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "q_partition_prune_dynamic",
    oracle=f"""
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('e.value')} AS total_value,
           TRUE AS dpp_used
    FROM events e
    JOIN (SELECT DISTINCT event_type FROM events
          WHERE length(event_type) <= 5) dim
      ON e.event_type = dim.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Dynamic partition pruning: the partition predicate is not a "
        "literal but arrives through a broadcast dim join, so Catalyst "
        "injects a runtime dynamicpruning subquery into the fact scan's "
        "PartitionFilters — the 100 TB fact reads only dim-surviving "
        "partitions. The plan's DPP marker is pinned TRUE by the oracle.",
    tags=("layout", "source", "join", "parquet"),
)
def q_partition_prune_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="layout_dpp_")
    try:
        ev.write.mode("overwrite").partitionBy("event_type").parquet(f"{d}/fact")
        fact = spark.read.parquet(f"{d}/fact")
        dim = (
            ev.select("event_type")
            .distinct()
            .filter(F.length("event_type") <= 5)
        )
        joined = fact.join(F.broadcast(dim), "event_type")
        agg = (
            joined.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(F.col("value")).alias("total_value"),
            )
            .orderBy("event_type")
        )
        ok = _has_dynamic_pruning(agg)
        return agg.withColumn("dpp_used", F.lit(ok)).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "q_compact_small_files",
    oracle=f"""
    SELECT CAST(4 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS total_value
    FROM events
    """,
    doc="Small-file compaction: a fragmented write (32 shuffle "
        "partitions → 32 files) is rewritten through repartition(4) "
        "into exactly 4 larger files; the rewritten table's file census "
        "(count of distinct input_file_name) and content totals are "
        "checked against the source. At scale the repartition width "
        "comes from target_bytes / avg_row_size, not a constant.",
    tags=("layout", "sink", "parquet"),
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="layout_compact_")
    try:
        # fragment: force a wide shuffle before writing
        ev.repartition(32).write.mode("overwrite").parquet(f"{d}/small")
        small = spark.read.parquet(f"{d}/small")
        small.repartition(4).write.mode("overwrite").parquet(f"{d}/compact")
        compact = spark.read.parquet(f"{d}/compact")
        return (
            compact.withColumn("_file", F.input_file_name())
            .agg(
                F.countDistinct("_file").alias("n_files"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                dsum(F.col("value")).alias("total_value"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
