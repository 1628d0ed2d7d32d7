"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's default parallelism — expression-heavy
    per-row operators (hashing, regex batteries, array folds) otherwise run
    on however few splits the input file had; a single small parquet file
    means one core does all the work."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)
