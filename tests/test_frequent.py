"""Heavy hitters: MG candidates + exact recount equals the naive answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.frequent import heavy_hitters


def test_heavy_hitters_equals_exact(spark):
    # zipf-ish: item i appears 200//(i+1) times; many partitions so the
    # per-partition MG superset guarantee actually gets exercised
    rows = [(i,) for i in range(40) for _ in range(200 // (i + 1))]
    df = spark.createDataFrame(rows, "item long").repartition(8)
    total = len(rows)
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters(df, "item", min_frac=0.05, total=total).collect()
    }
    exact = {
        (r["item"], r["n"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 0.05 * total)
        .collect()
    }
    assert got == exact and got  # non-empty, identical


def test_heavy_hitters_empty_when_uniform(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "item long")
    assert heavy_hitters(df, "item", min_frac=0.05).count() == 0


def test_heavy_hitters_null_key_reported(spark):
    # SQL GROUP BY has a NULL group; a frequent-enough NULL key must be
    # reported with its exact count, like HAVING count(*) > threshold.
    rows = [(None,)] * 30 + [("a",)] * 25 + [(str(i),) for i in range(45)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters(
            df, "item", min_frac=0.2, total=len(rows)
        ).collect()
    }
    assert got == {(None, 30), ("a", 25)}
