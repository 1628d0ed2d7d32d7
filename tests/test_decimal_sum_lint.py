"""No-Spark lint: reject new old-form decimal sums (r12 verdict item 1).

The class: ``CAST(SUM(CAST(x AS DECIMAL(p,s>0))) AS DOUBLE)`` (oracle
SQL) and ``F.sum(col.cast("decimal(p,s>0)")).cast("double")`` (Spark
side) convert a fractional-scale decimal sum to double — and the two
engines implement decimal->double DIFFERENTLY (DuckDB: int128->double
then a second rounding division by 10^scale; Spark: BigDecimal
.doubleValue, one rounding), so results diverge by 1 ulp once a double
ulp exceeds the decimal quantum (|sum| > 2^33 for 6-dp, ~2^12 for
12-dp). TPC-H Q1's sum_charge flipped at the round-12 sf1 fixture.

Sanctioned forms (not flagged):
- the micros/pico/nano integer pipeline (``dsum``/``dsum12``/
  ``sql_dsum``/``sql_dsum_shared``/``dsum_win`` and inline
  equivalents): per-row exact integer units summed on a 128-bit
  accumulator (``DECIMAL(38,0)`` / HUGEINT), ONE int->double
  conversion — identical in both engines at any scale;
- exact-integer accumulators (``SUM(CAST(x AS DECIMAL(p,0)))``,
  integer sums cast to BIGINT);
- sites carrying a ``decimal-sum-ok:`` / ``bounded-sum:`` annotation
  within the 8 preceding lines, stating why the sum is structurally
  bounded below the divergence threshold (fixed window frames,
  per-document groups, rank-normalized masses) or why the old form is
  load-bearing (the documented dyadic-midpoint reporting class).

Every site is either migrated or annotated; a new unannotated site
fails this test.
"""
from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "dataintegration_csvprovider_spark"

ANNOT = re.compile(r"decimal-sum-ok|bounded-sum")

#: oracle-side old form: CAST(SUM(CAST( ... )) AS DOUBLE) where the
#: inner cast is a fractional-scale decimal
SQL_SITE = re.compile(r"CAST\s*\(\s*SUM\s*\(\s*CAST\s*\(", re.I)

#: Spark-side old form: F.sum( ... .cast("decimal(p,s)") ... ) with a
#: fractional scale (s > 0) in the same call segment
PY_SITE = re.compile(r"F\.sum\s*\(")
PY_DEC = re.compile(r"""\.cast\(\s*["']decimal\(\s*\d+\s*,\s*([1-9]\d*)\s*\)""")


def _exempt_sql(seg: str) -> bool:
    """128-bit / exact-integer accumulator forms."""
    head = seg[:300]
    if re.search(r"AS\s+DECIMAL\(38,0\)\)\)", head, re.I):
        return True  # micros/pico pipeline (per-row integral units)
    if re.search(r"AS\s+BIGINT\)\)\s*AS\s+HUGEINT", head, re.I):
        return True  # sql_dsum's HUGEINT accumulator
    if re.search(r"\)\s*AS\s+DECIMAL\(38,0\)\)", head, re.I):
        return True  # SUM(...) cast to the 128-bit exact accumulator
    if re.search(r"AS\s+DECIMAL\(\d+,0\)\)", head, re.I):
        return True  # exact-integer per-row cast (scale 0)
    if re.search(
        r"CAST\s*\(\s*SUM\s*\(\s*CAST\s*\(\s*[^()]*AS\s+(U?INT|BIGINT|INTEGER)",
        head, re.I,
    ):
        return True  # integer counting sums
    return False


def _sites() -> list[str]:
    offenders = []
    for p in sorted(PKG.rglob("*.py")):
        src = p.read_text()
        lines = src.splitlines()
        rel = p.relative_to(PKG.parent)
        for m in SQL_SITE.finditer(src):
            seg = src[m.start():m.start() + 400].replace("\n", " ")
            if _exempt_sql(seg):
                continue
            ln = src[:m.start()].count("\n") + 1
            ctx = "\n".join(lines[max(0, ln - 9):ln])
            if ANNOT.search(ctx) or ANNOT.search(lines[ln - 1]):
                continue
            offenders.append(f"{rel}:{ln} [sql] {seg[:90]}")
        for m in PY_SITE.finditer(src):
            seg = src[m.start():m.start() + 260].replace("\n", " ")
            dm = PY_DEC.search(seg)
            if not dm:
                continue
            # exact accumulators: decimal(38,0)/decimal(19,0) per-row
            if re.search(r"decimal\(38,0\)|decimal\(\d+,0\)", seg):
                continue
            # the sanctioned inline micros forms multiply into integer
            # units before a 128-bit cast
            if "1_000_000" in seg or "1000000" in seg:
                continue
            ln = src[:m.start()].count("\n") + 1
            ctx = "\n".join(lines[max(0, ln - 9):ln])
            if ANNOT.search(ctx) or ANNOT.search(lines[ln - 1]):
                continue
            offenders.append(f"{rel}:{ln} [py] {seg[:90]}")
    return offenders


def test_no_unannotated_old_form_decimal_sums():
    offenders = _sites()
    assert not offenders, (
        "old-form decimal->double sum sites without a decimal-sum-ok/"
        "bounded-sum annotation (migrate to dsum/dsum12/sql_dsum or "
        "annotate why the sum is bounded forever):\n"
        + "\n".join(offenders)
    )
