"""PySpark-native analytics engine with the query and data-processing
capabilities of ``dynamicweb/DataIntegration.CsvProvider``.

The reference (survey at /root/repo/SURVEY.md) is a CSV source/destination
ETL connector: CSV scan with configurable dialect, all-string schema
inference, per-table mapping pipelines (filter -> project/rename ->
scalar transforms -> CSV sink), plus robustness semantics (skip-defective
rows, duplicate-header rejection, NULL sentinel, newline scrub).

This engine re-expresses that contract Spark-first — declarative DataFrame
plans compiled from the same job/mapping abstractions — and extends it with
the full relational surface (joins/aggs/windows/set-ops), LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns) and
a Structured Streaming slice, all designed for 100 TB scale.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import load_table, load_tables, TABLES  # noqa: F401
from .engine import Engine  # noqa: F401
from .jobs import JobSpec, run_job  # noqa: F401
from .sources.csv_source import CsvSource, CsvSourceOptions  # noqa: F401
from .sinks.csv_sink import CsvSink, CsvSinkOptions  # noqa: F401
from .plans.mapping_compiler import ColumnMapping, Mapping  # noqa: F401
from .plans.conditionals import Conditional  # noqa: F401
