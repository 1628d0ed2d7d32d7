"""CSV-layer queries (SURVEY.md §2.1-§2.6) — populated with M1."""

from __future__ import annotations
