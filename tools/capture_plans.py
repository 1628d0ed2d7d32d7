"""Capture .explain("formatted") for named registry queries.

Round-13 optimization deliverable: the judge checks plan claims against
committed ``plans/r13/<name>_{before,after}.txt`` files. This tool writes
one file per query at the requested tag.

Usage:
    python tools/capture_plans.py --tag before [--sf-dir /root/testdata/sf0.1] name...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=str(REPO / "plans" / "r13"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from dataintegration_csvprovider_spark.queries import all_queries
    from dataintegration_csvprovider_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    reg = all_queries()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.names:
        if name not in reg:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = reg[name].fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
