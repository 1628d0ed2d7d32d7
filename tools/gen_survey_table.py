#!/usr/bin/env python3
"""Generate SURVEY.md §2.11's category table FROM the query registry.

SURVEY.md claims the registry is the source of truth for the implemented
query inventory, but the hand-maintained §2.11 table drifted (round-11
verdict: 18 registered names missing, 4 category counts wrong). This
tool makes the table derived data:

- category  = the query's FIRST registry tag,
- n         = number of registry names in that category,
- queries   = the names, alphabetically sorted, each rendered with the
  prose annotation harvested from the PREVIOUS table text when one
  exists (annotations are documentation worth keeping; a name that
  never had one renders bare).

Run ``python3 tools/gen_survey_table.py`` to rewrite the table in place,
``--check`` to exit non-zero when SURVEY.md is stale (the no-Spark lint
test drives the same parser, so table-names == registry-names is pinned
by pytest).
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SURVEY = REPO / "SURVEY.md"
HEADER = "| category | n | queries |"
_NAME_RE = re.compile(r"^`(q[0-9a-z_]+)`")


def split_entries(cell: str) -> list[tuple[str, str]]:
    """Split one table cell into (name, rendered-entry) pairs.

    Entries are separated by ", " at paren depth 0; an entry is
    "`name`" optionally followed by an annotation. Backticked names
    INSIDE an annotation's parens never start a new entry because the
    split is depth-aware.
    """
    parts: list[str] = []
    depth = 0
    cur: list[str] = []
    i = 0
    while i < len(cell):
        ch = cell[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if depth == 0 and cell.startswith(", `", i):
            parts.append("".join(cur))
            cur = []
            i += 2  # skip ", " — keep the backtick for the next entry
            continue
        cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    out: list[tuple[str, str]] = []
    for p in parts:
        p = p.strip()
        m = _NAME_RE.match(p)
        if m:
            out.append((m.group(1), p))
        elif out:
            # trailing cell text (e.g. a shared "— `file.py`" pointer)
            # belongs to the previous entry's annotation
            name, prev = out[-1]
            out[-1] = (name, f"{prev}, {p}")
        else:
            raise ValueError(f"unparseable table entry: {p[:80]!r}")
    return out


def parse_table(text: str) -> tuple[int, int, dict[str, list[tuple[str, str]]]]:
    """Locate the §2.11 table; return (start_line, end_line_exclusive,
    {category: [(name, entry), ...]}) over the file's line list."""
    lines = text.splitlines()
    try:
        start = lines.index(HEADER)
    except ValueError:
        raise SystemExit(f"SURVEY.md: header line {HEADER!r} not found")
    end = start + 2  # header + |---|---|---| separator
    rows: dict[str, list[tuple[str, str]]] = {}
    while end < len(lines) and lines[end].startswith("|"):
        cols = lines[end].split("|")
        # "| cat | n | entries |" -> ['', ' cat ', ' n ', ' entries ', '']
        cat = cols[1].strip()
        cell = "|".join(cols[3:-1]).strip()
        rows[cat] = split_entries(cell)
        end += 1
    return start, end, rows


def registry_by_category() -> dict[str, list[str]]:
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    from dataintegration_csvprovider_spark.queries.registry import (
        all_queries,
    )

    cats: dict[str, list[str]] = {}
    for name, q in all_queries().items():
        cat = q.tags[0] if q.tags else "untagged"
        cats.setdefault(cat, []).append(name)
    return {c: sorted(ns) for c, ns in sorted(cats.items())}


def render(old_entries: dict[str, str]) -> list[str]:
    lines = [HEADER, "|---|---|---|"]
    for cat, names in registry_by_category().items():
        cell = ", ".join(old_entries.get(n, f"`{n}`") for n in names)
        lines.append(f"| {cat} | {len(names)} | {cell} |")
    return lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if SURVEY.md's table is stale")
    args = ap.parse_args()
    text = SURVEY.read_text()
    start, end, rows = parse_table(text)
    old_entries = {n: e for entries in rows.values() for n, e in entries}
    new_table = render(old_entries)
    lines = text.splitlines()
    if lines[start:end] == new_table:
        print(f"SURVEY.md table current ({len(old_entries)} names)")
        return 0
    if args.check:
        print("SURVEY.md table is STALE — run tools/gen_survey_table.py")
        return 1
    lines[start:end] = new_table
    SURVEY.write_text("\n".join(lines) + "\n")
    n = sum(len(v) for v in registry_by_category().values())
    print(f"SURVEY.md table rewritten: {n} names, "
          f"{len(registry_by_category())} categories")
    return 0


if __name__ == "__main__":
    sys.exit(main())
