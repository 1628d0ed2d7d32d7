"""Scalar expression library (SURVEY.md §2.4) — all JVM-side Column
expressions, no Python UDFs on the hot path."""

from .numeric import normalize_decimal  # noqa: F401
from .datetimefmt import format_reference_datetime  # noqa: F401
from .text import scrub_newlines, csv_quote  # noqa: F401
