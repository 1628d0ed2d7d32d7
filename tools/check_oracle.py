"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash. Stricter than the
driver is likely to be (exact float bits via repr), so green here should
imply green there.

Usage:
    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    """Canonical string for one cell, identical across engines."""
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def hugeint_columns(con, sql: str) -> list[str]:
    """Names of output columns whose DECLARED DuckDB type is int128.

    DuckDB widens integer SUM() to HUGEINT; the driver's fetch renders
    int128 differently from Spark's bigint, so such a column can never
    hash-match even when every value is equal.
    """
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        r[0] for r in rows
        if "HUGEINT" in str(r[1]).upper()
    ]


def result_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), sorted_cols, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="driver-replica session: plain local[32] builder with NONE "
        "of the engine confs (catalog.load_table's defensive pinning is "
        "the only thing standing) — catches conf-dependent results "
        "before the grading driver does",
    )
    ap.add_argument(
        "--budget-seconds",
        type=float,
        default=None,
        help="per-name wall budget: when exceeded, cancel the Spark "
        "jobs and interrupt the DuckDB query, record the name as "
        "SKIP(budget) and move on — lets a full-registry sweep at a "
        "large SF finish instead of blocking hours on the handful of "
        "deliberately brute-force (all-pairs) oracles whose operators "
        "are already verified at the gate SF",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as ent

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("check_oracle_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from dataintegration_csvprovider_spark.session import get_spark

        spark = get_spark(app_name="check_oracle")

    con = duckdb.connect()
    # Cap the oracle's spill so a quadratic replay at a large SF skips
    # cleanly instead of exhausting the machine's disk (round 12:
    # q_hybrid_retrieval_eval's sf1 replay filled local temp). The cap
    # only bounds DuckDB's own temp usage — a resource-capped oracle
    # reports SKIP(resource), never a value verdict.
    try:
        con.execute("SET max_temp_directory_size = '40GiB'")
    except duckdb.Error:
        pass  # older DuckDB without the setting
    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    names = args.names or list(qs)

    import threading

    class _Watchdog:
        """Per-name wall budget: cancels Spark jobs + interrupts the
        DuckDB query when it fires. Token-guarded so a timer racing a
        name's completion can't kill the next name's work.

        Known limitation (measured, r10: q_quality_classifier ran
        12.4s to completion under a 3s budget): cancelAllJobs only
        kills jobs IN FLIGHT at a fire instant, so a driver-paced
        query — many sub-second Spark jobs separated by Python work,
        e.g. a gradient loop — can thread the 2s re-fire gaps and
        overshoot. Long single jobs and DuckDB oracles (the cases the
        budget exists for) are bounded reliably; a hard guarantee for
        driver-paced names would need per-name subprocess isolation,
        which isn't worth the JVM-per-name cost here."""

        def __init__(self) -> None:
            self.timer: threading.Timer | None = None
            self.token = 0
            self.fired_for = -1

        def arm(self, budget: float | None) -> int:
            self.token += 1
            tok = self.token
            if budget is not None:
                self.timer = threading.Timer(budget, self._fire, (tok,))
                self.timer.daemon = True
                self.timer.start()
            return tok

        def _fire(self, tok: int) -> None:
            if tok != self.token:
                return
            self.fired_for = tok
            try:
                spark.sparkContext.cancelAllJobs()
            except Exception:  # noqa: BLE001
                pass
            try:
                con.interrupt()
            except Exception:  # noqa: BLE001
                pass
            # A one-shot interrupt can land in the gap between the
            # Spark collect finishing and the DuckDB query starting,
            # where it is spent on nothing and the oracle then runs
            # unbounded. Keep re-firing every 2s until this name is
            # disarmed so whichever phase becomes active is hit too.
            self.timer = threading.Timer(2.0, self._fire, (tok,))
            self.timer.daemon = True
            self.timer.start()

        def disarm(self, tok: int) -> bool:
            """Cancel; return True if the budget fired for this name."""
            # Invalidate the token FIRST: a _fire racing this cancel
            # re-checks `tok != self.token` before interrupting, so it
            # can never hit the NEXT name's Spark/DuckDB work.
            self.token += 1
            if self.timer is not None:
                self.timer.cancel()
                self.timer = None
            return self.fired_for == tok

    dog = _Watchdog()

    n_pass = n_fail = n_rows_only = n_skip = 0
    for name in names:
        t0 = time.time()
        tok = dog.arm(args.budget_seconds)
        try:
            sdf = qs[name](spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            sn, scols_sorted, shash = result_fingerprint(scols, srows)
        except Exception as e:  # noqa: BLE001
            if dog.disarm(tok):
                print(f"SKIP  {name}: budget exceeded "
                      f"[{time.time()-t0:.1f}s]")
                n_skip += 1
                continue
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue

        if name not in oracles:
            dog.disarm(tok)
            status = "ROWS" if sn >= 0 else "FAIL"
            n_rows_only += 1
            print(f"{status}  {name}: rows={sn} (no oracle) [{time.time()-t0:.1f}s]")
            continue

        # Bind t_spark BEFORE anything in the oracle try block can raise:
        # if the watchdog interrupts DuckDB inside hugeint_columns' DESCRIBE,
        # the except handler below prints t_spark — an assignment further down
        # would leave it unbound and crash the sweep instead of SKIPping.
        t_spark = time.time() - t0
        try:
            bad = hugeint_columns(con, oracles[name])
            if bad:
                dog.disarm(tok)
                # Value-level canon() renders Python ints identically
                # regardless of DuckDB's internal width, so an int128
                # output column passes HERE but hash-fails in the
                # driver's fetch path (Arrow renders HUGEINT differently
                # from Spark's bigint). Reject on declared type.
                print(f"FAIL  {name}: oracle emits HUGEINT column(s) "
                      f"{bad} — CAST(... AS BIGINT) in the oracle SQL")
                n_fail += 1
                continue
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            dn, dcols_sorted, dhash = result_fingerprint(dcols, drows)
        except Exception as e:  # noqa: BLE001
            if dog.disarm(tok):
                # the watchdog fired during the oracle phase, but most
                # of the budget may have gone to the Spark side — report
                # both so the adjudication is a field lookup (the r10
                # monitor-suite skip read "oracle side" when DuckDB's
                # share was 0.6s of a 120s budget)
                print(f"SKIP  {name}: budget exceeded during oracle "
                      f"[spark={t_spark:.1f}s of "
                      f"{time.time()-t0:.1f}s total]")
                n_skip += 1
                continue
            msg = str(e)
            if (
                "No space left" in msg
                or "max_temp_directory_size" in msg
                or "Out of Memory" in msg
                or "OutOfMemory" in msg
            ):
                # resource exhaustion in the ORACLE phase is a harness
                # limit, not an engine-correctness verdict — same class
                # as a budget skip
                print(f"SKIP  {name}: oracle resource limit "
                      f"[{type(e).__name__}: {msg[:120]}]")
                n_skip += 1
                continue
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue

        dog.disarm(tok)
        ok = (sn == dn) and (scols_sorted == dcols_sorted) and (shash == dhash)
        if ok:
            n_pass += 1
            print(f"ok    {name}: rows={sn} hash={shash[:10]} [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            print(f"FAIL  {name}: spark(rows={sn}, cols={scols_sorted})")
            print(f"      vs duck(rows={dn}, cols={dcols_sorted}) hash "
                  f"{shash[:10]} vs {dhash[:10]}")
            if args.show_diff:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(canon(r[i]) for i in order_s) for r in srows}
                dset = {tuple(canon(r[i]) for i in order_d) for r in drows}
                for label, diff in (
                    ("spark-only", sset - dset),
                    ("duck-only", dset - sset),
                ):
                    for row in list(diff)[:5]:
                        print(f"      {label}: {row}")

    skip_note = f", {n_skip} skipped(budget)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
          f"{skip_note}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
