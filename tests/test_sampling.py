"""Temperature sampling: deterministic quotas, caps, and repeatability."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.sampling import (
    temperature_sample,
)


def _corpus(spark):
    # three domains with strongly skewed sizes: 600 / 60 / 6
    rows = (
        [(i, "big") for i in range(600)]
        + [(1000 + i, "mid") for i in range(60)]
        + [(2000 + i, "tiny") for i in range(6)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_flattens_the_mix(spark):
    df = _corpus(spark)
    out = temperature_sample(df, "source", "doc_id", alpha=0.5, target_total=100)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # sqrt weights: 24.49 / 7.75 / 2.45 -> quotas ~70 / 22 / 7 of 100.
    # alpha=1 proportional sampling would give tiny ~1 row; temperature
    # lifts it, and no group exceeds its own size
    assert got["tiny"] >= 5
    assert got["big"] <= 75
    assert sum(got.values()) <= 100
    # deterministic: same call, same rows
    again = temperature_sample(df, "source", "doc_id", alpha=0.5,
                               target_total=100)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_alpha_zero_is_uniform_quotas(spark):
    df = _corpus(spark)
    out = temperature_sample(df, "source", "doc_id", alpha=0.0, target_total=9)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # equal weights -> floor(9/3) = 3 each
    assert got == {"big": 3, "mid": 3, "tiny": 3}


def test_quota_capped_at_group_size(spark):
    df = _corpus(spark)
    out = temperature_sample(df, "source", "doc_id", alpha=0.5,
                             target_total=5000)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["tiny"] == 6  # capped at the group's size
