#!/usr/bin/env python3
"""Summarize a check_oracle sf1 sweep log into the BASELINE.md status
table (r12 verdict item 7): one line per NON-green name with its
classification, plus aggregate counts.

Usage: python tools/sf1_table.py /tmp/sf1_sweep_r13.raw
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

#: names whose non-green sf1 status has a standing classification
CLASSIFIED = {
    "q_compression_quality": "SKIP(fixture) — census pinned to driver "
    "fixture signatures; off-fixture both sides return empty (clean skip)",
    "q_bpe_tokenize": "SKIP(fixture) — same signature gate",
}


def main() -> None:
    path = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_sweep_r13.raw")
    ok, fail, skip, rows = [], [], [], []
    times = {}
    for line in path.read_text().splitlines():
        m = re.match(r"^(ok|FAIL|SKIP|ROWS)\s+(\S+?):\s*(.*)$", line)
        if not m:
            continue
        tag, name, rest = m.group(1), m.group(2), m.group(3)
        tm = re.search(r"\[(\d+(?:\.\d+)?)s\]", rest)
        if tm:
            times[name] = float(tm.group(1))
        {"ok": ok, "FAIL": fail, "SKIP": skip, "ROWS": rows}[tag].append(
            (name, rest)
        )
    print(f"green: {len(ok)}  fail: {len(fail)}  skip: {len(skip)}  "
          f"rows-only: {len(rows)}")
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:8]
    print("slowest green:", ", ".join(f"{n} {t:.0f}s" for n, t in slow))
    for name, rest in fail + skip:
        cls = CLASSIFIED.get(name, "UNCLASSIFIED")
        print(f"| {name} | {rest[:120]} | {cls} |")


if __name__ == "__main__":
    main()
