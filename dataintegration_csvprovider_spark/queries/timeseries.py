"""Time-series surface: regular-grid gap filling with
last-observation-carried-forward (LOCF).

Sensor/event feeds are sparse on the hour grid; downstream features
want one row per (series, bucket). The plan: per-series bucket sums →
per-series hour spine (``sequence`` + ``explode``, generated
distributed, never on the driver) → left join → LOCF via
``last(ignorenulls)`` over an unbounded-preceding row frame. One
shuffle keys everything by series, and the window reuses that
partitioning; at 100 TB the spine explode is embarrassingly parallel
and the state per series is one running value.

The reference has no time-series surface (batch row pump only,
CSVProvider.cs:563-601); this extends the engine's events coverage
alongside sessionization and the streaming windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, register, sql_dsum


@register(
    "q_gap_fill_locf",
    oracle=f"""
    WITH buckets AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_hour,
             {sql_dsum('value')} AS v
      FROM events
      WHERE user_id < 10
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS bucket_hour
      FROM (SELECT user_id, MIN(bucket_hour) AS hmin, MAX(bucket_hour) AS hmax
            FROM buckets GROUP BY user_id)
    )
    SELECT s.user_id, s.bucket_hour,
           last_value(b.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket_hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           b.v IS NULL AS was_gap
    FROM spine s
    LEFT JOIN buckets b
      ON b.user_id = s.user_id AND b.bucket_hour = s.bucket_hour
    """,
    doc="Hourly per-user grid over the events feed: missing buckets are "
        "materialized from a distributed sequence() spine and filled "
        "with the last observed hourly sum (LOCF); was_gap marks "
        "synthesized rows. Leading gaps before a series' first "
        "observation cannot occur (the spine starts at each series' "
        "own min bucket).",
    tags=("timeseries", "window", "join"),
)
def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    buckets = (
        ev.withColumn("bucket_hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("user_id", "bucket_hour")
        .agg(dsum(F.col("value")).alias("v"))
    )
    spine = (
        buckets.groupBy("user_id")
        .agg(
            F.min("bucket_hour").alias("hmin"),
            F.max("bucket_hour").alias("hmax"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket_hour"),
        )
    )
    joined = spine.join(buckets, ["user_id", "bucket_hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket_hour",
        F.last("v", ignorenulls=True).over(w).alias("filled_value"),
        F.col("v").isNull().alias("was_gap"),
    )
