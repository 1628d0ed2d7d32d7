"""SURVEY.md §2.11 table lint (round 12, r11 verdict item 4).

SURVEY.md names the registry as the source of truth for the implemented
query inventory; the §2.11 category table is now GENERATED from it
(tools/gen_survey_table.py). These tests pin the derivation so the
table can never drift again: every registered name appears exactly
once, every row's count matches its entry list, and every name sits in
the row of its first registry tag. No SparkSession involved.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import gen_survey_table as gst  # noqa: E402
from dataintegration_csvprovider_spark.queries.registry import (  # noqa: E402
    all_queries,
)


def _table_rows():
    text = gst.SURVEY.read_text()
    _, _, rows = gst.parse_table(text)
    return rows


def test_table_names_equal_registry_names():
    rows = _table_rows()
    table_names = [n for entries in rows.values() for n, _ in entries]
    assert len(table_names) == len(set(table_names)), "duplicate names"
    assert set(table_names) == set(all_queries())


def test_table_counts_match_lists():
    lines = gst.SURVEY.read_text().splitlines()
    start = lines.index(gst.HEADER)
    i = start + 2
    rows = _table_rows()
    for cat, entries in rows.items():
        cols = lines[i].split("|")
        assert cols[1].strip() == cat
        assert int(cols[2].strip()) == len(entries), cat
        i += 1


def test_category_is_first_tag_and_sorted():
    rows = _table_rows()
    qs = all_queries()
    for cat, entries in rows.items():
        names = [n for n, _ in entries]
        assert names == sorted(names), cat
        for n in names:
            tags = qs[n].tags
            assert (tags[0] if tags else "untagged") == cat, n
    assert list(rows) == sorted(rows)


def test_generator_reports_current():
    """The table in the working tree must be the generator's output."""
    text = gst.SURVEY.read_text()
    start, end, rows = gst.parse_table(text)
    old = {n: e for entries in rows.values() for n, e in entries}
    assert text.splitlines()[start:end] == gst.render(old)
