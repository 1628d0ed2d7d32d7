"""Structured Streaming queries (SURVEY.md §2.8) — populated with M4."""

from __future__ import annotations
