"""Round-9 query laws at the smoke fixture (sf0.001).

Covers the restart-proof percentile monitor, the grouped KMV datacard,
the KMV-driven join planner and incremental IVF maintenance — each law
here is the query's own claim re-derived independently (per-group
rebuilds, plan markers, set identities), not a re-run of the oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_stream_percentile_restart_all_laws_hold(spark, qs):
    rows = qs["q_stream_percentile_restart"](spark, SF).collect()
    assert rows, "restart query must emit (window, probe) rows"
    wins = {r.win for r in rows}
    assert len(wins) >= 2  # multiple event days in the fixture
    for r in rows:
        assert r.weight_ok, f"ledger weight != COUNT for {r.win}"
        assert r.rank_ok, f"rank error > 0.05 at ({r.win}, {r.q})"
        assert r.restart_equal, (
            f"crashed+restarted estimate diverged at ({r.win}, {r.q})"
        )
        assert r.redelivery_skipped, "re-delivery was not skipped exactly once"


def test_grouped_kmv_matches_per_group_build(spark):
    from dataintegration_csvprovider_spark.operators.sketches import (
        collect_grouped_kmv,
        grouped_kmv_sketch_rows,
        kmv_sketch,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderstatus", "o_custkey"
    )
    grouped = collect_grouped_kmv(
        grouped_kmv_sketch_rows(orders, "o_orderstatus", "o_custkey")
    )
    statuses = [
        r.o_orderstatus
        for r in orders.select("o_orderstatus").distinct().collect()
    ]
    assert set(grouped) == set(statuses)
    for st in statuses:
        solo = kmv_sketch(
            orders.filter(F.col("o_orderstatus") == st).select(
                F.col("o_custkey").alias("key")
            ),
            "key",
        )
        assert grouped[st][0] == solo[0], f"sketch mismatch for {st}"
        assert grouped[st][1] == solo[1], f"n_hashes mismatch for {st}"


def test_kmv_join_planner_decisions_and_plans(spark, qs):
    rows = {r.which: r for r in qs["q_kmv_join_planner"](spark, SF).collect()}
    assert set(rows) == {"hot_building", "all_customers"}
    for r in rows.values():
        assert r.hint_respected, f"{r.which}: chosen join absent from plan"
        assert r.strategy in ("broadcast", "shuffle_hash")
        assert r.n_rows > 0
        # the decision is exactly the threshold rule applied to the est
        want = "broadcast" if r.est_distinct <= 500 else "shuffle_hash"
        assert r.strategy == want
    # the filtered dim is strictly smaller than the full dim
    assert (
        rows["hot_building"].est_distinct
        < rows["all_customers"].est_distinct
    )


def test_ivf_incremental_gates(spark, qs):
    row = qs["q_ivf_incremental"](spark, SF).collect()[0]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert row.n_snapshot == emb.filter(F.col("vec_id") % 5 != 0).count()
    assert row.n_delta == emb.filter(F.col("vec_id") % 5 == 0).count()
    assert row.all_delta_assigned
    assert row.recall_floor_ok
    assert row.drift_bound_ok
    assert row.retrain_recommended  # the signal fires on random vectors


def test_minhash_md5_family_pairs_subset_of_exact_truth(spark):
    """Every md5-family LSH pair at est >= 0.5 must be a true near-dup
    under the EXACT trigram Jaccard at a relaxed floor (precision), and
    the md5 and xxhash64 families must agree on the heavy hitters (both
    contain every exact-Jaccard >= 0.9 pair — the near-identical docs
    no seed choice may miss)."""
    from dataintegration_csvprovider_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    md5_pairs = {
        (r.a, r.b)
        for r in minhash_near_dup_pairs(
            docs, threshold=0.5, base_hash="md5"
        ).collect()
    }
    xx_pairs = {
        (r.a, r.b)
        for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()
    }
    exact = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    for pair in md5_pairs:
        assert pair in exact, f"md5-family false positive {pair}"
    strong = {p for p, j in exact.items() if j >= 0.9}
    assert strong <= md5_pairs
    assert strong <= xx_pairs


def test_corpus_datacard_full_laws(spark, qs):
    rows = {r.lang: r for r in qs["q_corpus_datacard_full"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(rows) == langs
    n_total = docs.count()
    assert sum(r.n_docs for r in rows.values()) == n_total
    for lang, r in rows.items():
        assert r.weight_ok and r.rank_ok_p50 and r.rank_ok_p95
        assert r.vocab_exact > 0
        # the estimator law: exact when vocab < 64, else within 50%
        # (k=64 KMV rel-error ~ 1/sqrt(62) ≈ 0.13; 50% is a loose roof)
        assert abs(r.vocab_est - r.vocab_exact) <= 0.5 * r.vocab_exact
        if lang == "en":
            assert r.en_overlap_est is None and r.en_containment is None
        else:
            assert r.en_overlap_est is not None
            assert 0.0 <= r.en_containment <= 1.5  # est ratio, noisy roof


def test_stream_countmin_restart_all_laws_hold(spark, qs):
    rows = qs["q_stream_countmin_restart"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.est >= r.true_n and r.over_ok  # one-sided error law
        assert r.restart_equal, "crashed+restarted sketch != control"
        assert r.redelivery_skipped, "re-delivery was not refused once"
