"""Registry-wide oracle lints that run WITHOUT Spark.

The round-4 adjudication found that every driver hash-fail ever recorded
traced to a single cause: a DuckDB oracle whose declared output type was
HUGEINT (int128).  DuckDB widens integer ``SUM()`` to HUGEINT; the
driver's fetch path renders int128 differently from Spark's bigint, so
``rows_match``/``schema_match`` pass while ``hash_match`` can never
pass.  Value-level comparison (tools/check_oracle.py ``canon()``)
masks the width difference, which is why the bug survived two rounds.

This lint makes the failure class structurally impossible: DuckDB
``DESCRIBE`` over every ``oracle_sql()`` entry at sf0.01, failing on
any HUGEINT/UHUGEINT output column.  Fix is always a one-line
``CAST(SUM(...) AS BIGINT)`` in the oracle SQL — never engine work.
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

SF_DIR = Path(os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.01"))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = SF_DIR / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def _oracles() -> dict[str, str]:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as ent

    return ent.oracle_sql()


@pytest.mark.skipif(not SF_DIR.exists(), reason="testdata not present")
def test_no_hugeint_oracle_columns(duck):
    """No oracle may declare an int128 output column (driver hash trap)."""
    offenders: dict[str, list[str]] = {}
    for name, sql in _oracles().items():
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        bad = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "HUGEINT oracle columns (driver can never hash-match these; "
        f"CAST(... AS BIGINT) in the oracle SQL): {offenders}"
    )


@pytest.mark.skipif(not SF_DIR.exists(), reason="testdata not present")
def test_all_oracles_describe_cleanly(duck):
    """Every oracle must at least plan against the sf0.01 views."""
    errors: dict[str, str] = {}
    for name, sql in _oracles().items():
        try:
            duck.execute(f"DESCRIBE {sql}")
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"
    assert not errors, f"oracles that fail to plan: {errors}"
