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


# -- largest-remainder mixture apportionment -------------------------------


def test_apportion_quota_sums_to_budget(spark):
    from dataintegration_csvprovider_spark.operators.sampling import (
        apportion_mixture,
    )

    rows = [(i, "a" if i % 3 else "b", i) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
    out = apportion_mixture(
        df, {"a": 2.0, "b": 1.0}, total=31, group_col="grp",
        id_col="doc_id", order_col="score",
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    # 31 * 2/3 = 20.667 -> base 20 rem .667; 31 * 1/3 = 10.333 -> base 10
    # rem .333; leftover 1 goes to 'a'
    assert len(by_grp["a"]) == 21 and len(by_grp["b"]) == 10
    assert len(out) == 31
    # selection is top-by-score desc within each group
    assert min(r["score"] for r in by_grp["a"]) > 25


def test_apportion_caps_at_population(spark):
    from dataintegration_csvprovider_spark.operators.sampling import (
        apportion_mixture,
    )

    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, "big"), (4, "big"), (5, "big"),
         (6, "big")],
        "doc_id long, grp string",
    )
    out = apportion_mixture(
        df, {"tiny": 0.9, "big": 0.1}, total=6, group_col="grp",
        id_col="doc_id",
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["grp"], 0)
        got[r["grp"]] += 1
    # tiny's quota (5.4 -> 5+leftover) caps at its population of 2; the
    # shortfall is NOT redistributed (explicit policy), big keeps 1
    assert got == {"tiny": 2, "big": 1}
    caps = {r["grp"]: (r["quota"], r["n_available"]) for r in out}
    assert caps["tiny"] == (2, 2)


def test_apportion_unweighted_group_excluded_and_validation(spark):
    import pytest

    from dataintegration_csvprovider_spark.operators.sampling import (
        apportion_mixture,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, grp string"
    )
    out = apportion_mixture(
        df, {"a": 1.0, "b": 1.0}, total=2, group_col="grp", id_col="doc_id"
    ).collect()
    assert {r["grp"] for r in out} == {"a", "b"}
    with pytest.raises(ValueError):
        apportion_mixture(df, {}, total=2, group_col="grp")
    with pytest.raises(ValueError):
        apportion_mixture(df, {"a": -1.0, "b": -1.0}, total=2, group_col="grp")


def test_negative_samples_deterministic_and_self_free(spark):
    import pytest

    from dataintegration_csvprovider_spark.operators.sampling import (
        negative_samples,
    )

    ids = [10, 20, 30, 41, 55, 60, 77]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out1 = sorted(
        (r["anchor"], r["j"], r["neg"])
        for r in negative_samples(df, "doc_id", k=3).collect()
    )
    out2 = sorted(
        (r["anchor"], r["j"], r["neg"])
        for r in negative_samples(df, "doc_id", k=3).collect()
    )
    assert out1 == out2  # deterministic
    assert len(out1) == len(ids) * 3
    assert all(a != n for a, _, n in out1)  # never draws itself
    assert {a for a, _, _ in out1} == set(ids)
    # salt changes the draw
    out3 = sorted(
        (r["anchor"], r["j"], r["neg"])
        for r in negative_samples(df, "doc_id", k=3, salt=1).collect()
    )
    assert out3 != out1
    with pytest.raises(ValueError):
        negative_samples(df, "doc_id", k=0)


def test_budget_curation_greedy_prefix(spark):
    import pytest

    from dataintegration_csvprovider_spark.operators.sampling import (
        budget_curation,
    )

    rows = [
        # (id, group, tokens, score) — scores descending by id for g1
        (1, "g1", 50, 9.0),
        (2, "g1", 40, 8.0),
        (3, "g1", 30, 7.0),
        (4, "g1", 10, 6.0),
        (5, "g2", 100, 5.0),
        (6, "g3", 10, 5.0),  # group without a budget: dropped
    ]
    df = spark.createDataFrame(rows, "id long, g string, w long, s double")
    out = {
        r["id"]: r
        for r in budget_curation(
            df, "g", "id", "w", "s", budgets={"g1": 95, "g2": 100}
        ).collect()
    }
    # g1: prefix 50+40=90 fits; +30 would be 120 -> blocks there; the
    # 10-token doc does NOT sneak in (greedy prefix, not knapsack)
    assert set(out) == {1, 2, 5}
    assert out[2]["cum_weight"] == 90 and out[2]["keep_rank"] == 2
    assert out[5]["cum_weight"] == 100
    with pytest.raises(ValueError):
        budget_curation(df, "g", "id", "w", "s", budgets={})
