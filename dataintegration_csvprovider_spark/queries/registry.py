"""Query registry: the oracle-checkable operator inventory.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express the semantics) an equivalent ANSI-SQL oracle string that DuckDB
runs over the same parquet tables. ``__spark_entry__.py`` exposes this
registry to the driver.

Cross-engine determinism rules (so order-insensitive value hashes match):

- Money/measure sums go through exact decimal arithmetic:
  ``sum(cast(x as decimal(18,6)))`` then cast back to double. Per-row
  double expressions are IEEE-identical across engines; decimal sums are
  order-independent; the final decimal->double cast is deterministic.
- Averages are derived as exact-decimal-sum / count in double.
- Every computed column is explicitly aliased, identically in both the
  Spark plan and the oracle SQL (driver compares by sorted column name).
- Ties in top-k / window ranks are broken by a unique key column.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

#: exact-decimal accumulator type used for cross-engine-stable sums
DEC = "decimal(18,6)"


@dataclass
class Query:
    """One oracle-checkable query."""

    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


#: Names surfaced first to the driver's correctness gate (which grades a
#: bounded prefix of the registry per round). Rounds 1+2 graded 98 distinct
#: names (relational, TPC-H core, CSV/JSONL, LLM headline, streaming core)
#: — all green. This round-3 prefix rotates the window to families with no
#: driver verdict yet: graph, cdc, layout, timeseries, product, profiling,
#: sqlapi, mlprep, udtf, multimodal, quality gates, and a TPC-H sample.
#: Remaining never-graded names follow in registration order for round 4.
_GRADE_FIRST = [
    # ---- driver grades a bounded (~50-name) prefix: the window below
    # holds every never-driver-graded family AND every operator that is
    # new this round, so CORRECTNESS_r03 verdicts cover the highest-
    # uncertainty surface first. Remaining never-graded names follow in
    # priority order for a larger window / round 4.
    # graph (never graded)
    "q_pagerank",
    "q_triangle_count",
    "q_bfs_levels",
    # cdc (never graded)
    "q_upsert_changeset",
    "q_scd2_history",
    "q_incremental_agg",
    # layout / scan (never graded; plan-marker heavy hitters)
    "q_partition_prune_static",
    "q_partition_prune_dynamic",
    "q_compact_small_files",
    "q_zorder_layout",
    "q_scan_pruning",
    # timeseries (never graded + new interp)
    "q_gap_fill_locf",
    "q_ewma",
    "q_rolling_median",
    "q_gap_fill_interp",
    # product analytics (never graded)
    "q_funnel",
    "q_retention_cohorts",
    "q_last_touch_attribution",
    # profiling / data quality (never graded)
    "q_profile_table",
    "q_constraint_audit",
    "q_entity_resolution",
    # sql api surface (never graded + new sql udf)
    "q_python_datasource",
    "q_parameterized_sql",
    "q_sql_scripting",
    "q_sql_udf",
    # ml prep (never graded)
    "q_corr_matrix",
    "q_minmax_scale",
    "q_train_test_split",
    "q_kmeans",
    # sampling (never graded + new temperature mix)
    "q_stratified_sample_det",
    "q_temperature_sample",
    # T6 culture rendering (new this round)
    "q_csv_culture_render",
    # llm-pipeline gates, fixed-this-round, and new-this-round operators
    "q_knn_recall_gate",
    "q_dedup_quality_gate",
    "q_dedup_components",
    "q_sequence_packing",
    "q_multimodal_features",
    "q_multimodal_decode_real",
    "q_multimodal_audio_rms",
    "q_multimodal_video_decode",
    "q_repetition_stats",
    "q_span_dedup",
    "q_stream_late_drop",
    "q_stream_state_metrics",
    "q_pq_quality_gate",
    "q_ivfpq_recall_gate",
    "q_embedding_neardup_trained",
    "q_dedup_incremental",
    "q_leakage_safe_split",
    "q_knn_batch",
    # ---- ~position 50: remaining never-graded names in priority order,
    # so a larger driver prefix grades more of them
    "q_tfidf_cosine_pairs",
    "q_knn_filtered",
    "q_degree_distribution",
    "q_anomaly_zscore",
    "q_rolling_corr",
    "q_fuzzy_match",
    "q_aqe_coalesce",
    "q_parquet_codecs",
    "q_parquet_schema_evolution",
    "q_collation_group",
    "q_multimodal_frames",
    "q_multimodal_resize",
    "q_udtf_installments",
    "q_udtf_installment_amounts",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q17_small_qty_revenue",
    "q18_large_volume_customer",
    "q21_waiting_suppliers",
    "q_knn_ivf",
    "q_knn_lsh",
    "q_dedup_minhash",
    "q_dedup_minhash_full",
    "q_dedup_simhash",
    "q_embedding_neardup_ivf",
    "q_doc_fingerprint",
    "q_hll_sketch",
    "q_hll_union",
    "q_bitmap_distinct",
    "q_embedding_quantize",
    "q_doc_chunking",
    "q_contamination",
    "q_arrow_score",
    "q_semantic_dedup",
    "q_tfidf_top_terms",
    "q_term_lift_pairs",
    "q_stream_stateful",
    "q_stream_upsert",
    "q_stream_topk",
    "q_stream_exactly_once",
    "q_python_stream_source",
    "q_approx_percentile",
    "q_asof_forward_tolerance",
    "q_variant_shred",
    "q_join_strategy_hints",
    "q_runtime_bloom_filter",
    "q_heavy_hitters",
    "q_interval_overlap_join",
    "q_drift_tvd",
    "q_orc_roundtrip",
    "q_impute_group_mean",
    "q_winsorize",
    "q_relational_division",
    "q_mad",
    "q_text_source_logs",
    "q_join_nullsafe",
    "q_skyline",
    "q4_order_priority",
    "q7_nation_volume",
    "q9_product_profit",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q22_idle_customers",
]


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the
    full registry, ordered so :data:`_GRADE_FIRST` names come first."""
    from . import relational  # noqa: F401
    from . import relational2  # noqa: F401
    from . import relational3  # noqa: F401
    from . import relational4  # noqa: F401
    from . import relational5  # noqa: F401
    from . import relational6  # noqa: F401
    from . import relational7  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpch2  # noqa: F401
    from . import csvops  # noqa: F401
    from . import jsonlops  # noqa: F401
    from . import sqlapi  # noqa: F401
    from . import sql_advanced  # noqa: F401
    from . import cdcops  # noqa: F401
    from . import layout  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import udtfops  # noqa: F401
    from . import product  # noqa: F401
    from . import mlprep  # noqa: F401
    from . import profiling  # noqa: F401
    from . import graphops  # noqa: F401
    from . import llm  # noqa: F401
    from . import textmining  # noqa: F401
    from . import streaming  # noqa: F401

    missing = [n for n in _GRADE_FIRST if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_GRADE_FIRST names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _GRADE_FIRST}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def dsum(col: Column) -> Column:
    """Order-independent sum of a double expression: exact decimal
    accumulation, double result (see module docstring)."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent mean: exact decimal sum / count, double result."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
