"""Property tests for the round-6 query surface — invariants the SQL
oracles can't express as naturally (cross-row conservation laws,
bounds), run at sf0.001."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_bm25_rank_sequence_and_positive_scores(spark, qs):
    rows = qs["q_bm25_topk"](spark, SF).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_rank_fusion_bounds(spark, qs):
    rows = qs["q_rank_fusion"](spark, SF).collect()
    # rrf of two rankings with k=60: each term <= 1/61, so sum <= 2/61
    for r in rows:
        assert 0 < r.rrf <= 2 / 61 + 1e-12


def test_lexical_diversity_range(spark, qs):
    rows = qs["q_lexical_diversity"](spark, SF).collect()
    for r in rows:
        # gini in [0, 1 - 1/dl]; all-distinct docs hit the max exactly
        assert 0.0 <= r.gini <= 1.0 - 1.0 / r.dl + 1e-12
        if r.n_types == r.dl:
            assert abs(r.gini - (1.0 - 1.0 / r.dl)) < 1e-12


def test_upsample_epochs_exact_totals(spark, qs):
    out = qs["q_upsample_epochs"](spark, SF)
    per_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 150 for n in per_lang.values()), per_lang
    # epoch indices are dense from 0 per doc
    bad = (
        out.groupBy("doc_id", "lang")
        .agg(F.count("*").alias("k"), F.max("epoch").alias("mx"))
        .filter(F.col("mx") != F.col("k") - 1)
        .count()
    )
    assert bad == 0


def test_interleave_positions_in_unit_interval_and_monotone(spark, qs):
    rows = qs["q_interleave_order"](spark, SF).collect()
    assert len(rows) == 100
    for r in rows:
        assert 0.0 < r.pos < 1.0
    per_source = {}
    for r in sorted(rows, key=lambda r: (r.pos, r.source)):
        last = per_source.get(r.source, 0)
        assert r.rn == last + 1  # each source appears in rank order
        per_source[r.source] = r.rn


def test_chi2_drift_nonnegative_and_zero_on_self(spark, qs):
    row = qs["q_drift_chi2"](spark, SF).collect()[0]
    assert row.chi2 >= 0.0
    from dataintegration_csvprovider_spark.queries.profiling import (
        chi2_drift_docs,
    )
    from dataintegration_csvprovider_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    self_row = chi2_drift_docs(docs, "src1", "src1").collect()[0]
    assert self_row.chi2 == 0.0


def test_position_attribution_conserves_revenue(spark, qs):
    from dataintegration_csvprovider_spark.catalog import load_table

    out = qs["q_position_attribution"](spark, SF)
    credited = out.agg(
        F.sum("attributed_revenue").alias("s")
    ).collect()[0]["s"]
    ev = load_table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts"
    )
    touched = (
        purchases.join(
            touches,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("ts") <= F.col("p_ts"))
            & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
            "left_semi",
        )
        .agg(F.sum("revenue").alias("s"))
        .collect()[0]["s"]
    )
    # per-purchase weights sum to exactly 1, so credited revenue equals
    # the revenue of purchases with at least one touch (6-dp reporting)
    assert abs(credited - touched) < 1e-3


def test_seasonal_anomaly_flags_are_extreme(spark, qs):
    rows = qs["q_seasonal_anomaly"](spark, SF).collect()
    for r in rows:
        assert abs(r.z) >= 2.0
        assert r.n_obs >= 1


def test_curation_pipeline_full_manifest_laws(spark, qs):
    rows = qs["q_curation_pipeline_full"](spark, SF).collect()
    assert rows, "pipeline produced no shards"
    # contiguous non-overlapping doc_id ranges, every shard non-empty
    spans = sorted((r.first_doc, r.last_doc, r.n_docs) for r in rows)
    for (a1, b1, n1), (a2, _b2, _n2) in zip(spans, spans[1:]):
        assert b1 < a2
    assert sum(n for _, _, n in spans) <= 200  # the apportionment budget


def test_round6_cores_tolerate_empty_inputs(spark):
    """Registry convention: empty sources must yield empty results, not
    crashes (bm25 previously divided by zero computing avgdl)."""
    from dataintegration_csvprovider_spark.queries.profiling import (
        chi2_drift_docs,
    )
    from dataintegration_csvprovider_spark.queries.textmining import (
        _bm25_scores_docs,
    )

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert _bm25_scores_docs(docs).count() == 0
    assert chi2_drift_docs(docs).count() == 0
