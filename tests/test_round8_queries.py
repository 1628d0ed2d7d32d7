"""Property tests for the round-8 query surface — invariants the SQL
oracles can't express as naturally (cross-row conservation laws,
bounds, incremental-vs-frozen discipline), run at sf0.001."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_quantile_sketch_gate_all_true(spark, qs):
    rows = qs["q_quantile_sketch"](spark, SF).collect()
    assert len(rows) == 7
    n = rows[0].n
    for r in rows:
        assert r.n == n and r.weight_ok and r.rank_ok


def test_quantile_sketch_grouped_covers_every_group(spark, qs):
    rows = qs["q_quantile_sketch_grouped"](spark, SF).collect()
    groups = {r.grp for r in rows}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expect = {
        r.l_returnflag
        for r in li.select("l_returnflag").distinct().collect()
    }
    assert groups == expect
    # per-group n equals the true group size; all gates hold
    sizes = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n == sizes[r.grp]
        assert r.weight_ok and r.rank_ok


def test_stream_percentile_monitor_covers_every_day(spark, qs):
    rows = qs["q_stream_percentile_monitor"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    days = {
        r.win
        for r in ev.select(
            F.date_format(
                F.date_trunc("day", "ts"), "yyyy-MM-dd"
            ).alias("win")
        )
        .distinct()
        .collect()
    }
    assert {r.win for r in rows} == days
    assert {r.q for r in rows} == {0.5, 0.95, 0.99}
    assert all(r.weight_ok and r.rank_ok for r in rows)


def test_kmv_sketch_scope_consistency(spark, qs):
    rows = {r.scope: r for r in qs["q_kmv_sketch"](spark, SF).collect()}
    assert set(rows) == {"a_not_b", "building", "intersect", "orders",
                         "union"}
    # exact-count set algebra: |A| = |A∩B| + |A\B|; |A∪B| = |A|+|B|-|A∩B|
    assert (
        rows["orders"].exact_distinct
        == rows["intersect"].exact_distinct
        + rows["a_not_b"].exact_distinct
    )
    assert (
        rows["union"].exact_distinct
        == rows["orders"].exact_distinct
        + rows["building"].exact_distinct
        - rows["intersect"].exact_distinct
    )
    # BUILDING (34 keys at sf0.001) sits below k=64 -> exact mode;
    # orders (150) is in estimate mode -> k=64 keeps it within ~3/sqrt(k)
    assert rows["building"].est == float(rows["building"].exact_distinct)
    for r in rows.values():
        assert r.est >= 0
        if r.exact_distinct > 0:
            assert abs(r.est - r.exact_distinct) <= max(
                0.5 * r.exact_distinct, 8
            )


def test_stream_kmv_matches_batch_sketch(spark, qs):
    # the merge is lossless, so the streamed estimate must VALUE-equal
    # the batch-built sketch's estimate over the same keys
    from dataintegration_csvprovider_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    row = qs["q_stream_kmv"](spark, SF).collect()[0]
    assert row.scope == "orders_stream"
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_custkey").alias("key")
    )
    batch_est = kmv_estimate(*kmv_sketch(orders, "key"))
    assert abs(row.est - batch_est) < 1e-6


def test_curation_incremental_manifest_diff_laws(spark, qs):
    rows = qs["q_curation_incremental"](spark, SF).collect()
    assert rows, "manifest diff must be non-empty"
    total_quota = 0
    for r in rows:
        # counts compose and never go negative
        assert r.n_after == r.n_before + r.n_added
        assert r.n_added >= 0 and r.n_before >= 0
        assert r.tokens_added >= 0
        assert 0 <= r.quota_after <= r.n_after
        total_quota += r.quota_after
    # Hamilton quotas: replay the exact apportionment law from the
    # query's weight map. quota_raw = wt*200 is integral for every
    # weight here (100/25/25/25/25), so rem = 0, leftover = 0 and each
    # weighted language's quota is exactly min(wt*200, n_after);
    # unweighted languages get 0. No escape hatch: exact equality.
    weights = {"en": 0.5, "de": 0.125, "zh": 0.125, "fr": 0.125,
               "es": 0.125}
    by_lang = {r.lang: r for r in rows}
    expected_total = 0
    for lang, r in by_lang.items():
        want = (
            min(int(weights[lang] * 200), r.n_after)
            if lang in weights
            else 0
        )
        assert r.quota_after == want, (lang, r.quota_after, want)
        expected_total += want
    assert total_quota == expected_total
    # the frozen-snapshot discipline: n_before equals yesterday's
    # survivor count, independent of the delta — recompute it directly
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    snap_ids = {
        r.doc_id
        for r in docs.filter(
            (F.col("n_chars") >= 60)
            & ~F.col("source").isin(
                "src0", "src1", "src2", "src3", "src4"
            )
        )
        .select("doc_id")
        .collect()
    }
    n_funneled_snapshot = len(snap_ids)
    assert sum(r.n_before for r in rows) <= n_funneled_snapshot
