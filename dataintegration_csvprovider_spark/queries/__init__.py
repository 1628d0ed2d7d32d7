"""Oracle-checkable query inventory. See ``registry.all_queries``."""

from .registry import Query, all_queries, register  # noqa: F401
