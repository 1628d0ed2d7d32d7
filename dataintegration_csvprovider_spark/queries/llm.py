"""LLM-data-pipeline queries (SURVEY.md §2.10) — populated with M3."""

from __future__ import annotations
