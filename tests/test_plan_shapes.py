"""Physical-plan regression tripwires: the *shape* of key plans is part
of the 100 TB contract (broadcast where a dim is small, pushdown where a
predicate is literal, no Python on relational hot paths). These assert
plan facts the explain audit only reports."""

from __future__ import annotations

import pytest

from dataintegration_csvprovider_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_inner_broadcasts_the_dim(spark):
    # customer x nation x region: the dims must broadcast, not shuffle
    plan = _plan(spark, "q_join_inner")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_is_two_phase_hash_aggregate(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan


def test_scan_pruning_facts_hold(spark):
    from dataintegration_csvprovider_spark.queries.layout import (
        _scan_has_pushed_filter,
        _scan_read_columns,
    )
    from dataintegration_csvprovider_spark.catalog import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, SF, "lineitem")
    q = li.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")).agg(
        F.sum("l_extendedprice").alias("s")
    )
    assert set(_scan_read_columns(q)) == {"l_shipdate", "l_extendedprice"}
    assert _scan_has_pushed_filter(q, "l_shipdate")


def test_relational_hot_paths_have_no_python(spark):
    for name in (
        "q_agg_stats",
        "q_window_topk_per_group",
        "q_dedup_ngram_jaccard",
        "q_knn_bruteforce",
        "q_tfidf_top_terms",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        # Arrow-batched Python (mapInPandas/mapInArrow) is allowed; the
        # row-at-a-time evaluator is not


def test_semijoin_stays_semijoin(spark):
    # left_semi must not degrade to inner-join + distinct
    plan = _plan(spark, "q_semijoin")
    assert "LeftSemi" in plan


def test_mapping_pipeline_is_shuffle_free(spark):
    # the reference-parity path (scan -> conditionals filter -> column
    # mappings) must compile to a pure narrow plan: zero exchanges, one
    # codegen stage — per-row work only, any input size streams through
    from dataintegration_csvprovider_spark.plans.conditionals import (
        Conditional,
    )
    from dataintegration_csvprovider_spark.plans.mapping_compiler import (
        ColumnMapping,
        Mapping,
        compile_mapping,
    )

    df = spark.createDataFrame(
        [("a", "1,5", "x"), ("b", "2,5", "y")], "name string, amt string, z string"
    )
    m = Mapping(
        source_table="t",
        column_mappings=[
            ColumnMapping(source_column="name", destination_column="n"),
            ColumnMapping(source_column="amt", dest_type="double"),
        ],
        conditionals=[Conditional("z", "neq", "q")],
    )
    out = compile_mapping(df, m, decimal_separator=",")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_weighted_median_has_no_group_keyed_cumulative_window(spark):
    # round-8 regression guard: the per-language cumulative weight must
    # ride the grouped distributed prefix sum, NOT a window partitioned
    # solely on the low-cardinality lang key (which funnels
    # corpus/|langs| rows through one task at scale). The only
    # lang-partitioned window allowed is the tiny per-(lang, partition)
    # OFFSETS window, which also orders by __pid.
    plan = _plan(spark, "q_weighted_median")
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    for spec in specs:
        head = spec.split(",")[0].strip()
        if head.startswith("lang"):
            # offsets window over the per-(pid, lang) totals relation:
            # ordered by __pid, bounded by the partition count per lang
            assert "__pid" in spec
        elif head.startswith("__pid"):
            pass  # local cumsum window, partition-parallel
    # and the data-scaled window must include the physical partition id
    assert any(s.split(",")[0].strip().startswith("__pid") for s in specs)
