"""As-of join + batch sessionization operators."""

from __future__ import annotations

import datetime as dt

from dataintegration_csvprovider_spark.operators.asof import asof_join
from dataintegration_csvprovider_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(30)), (2, _ts(10))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(20), "b"), (2, _ts(50), "c")],
        "k long, ts timestamp, payload string",
    )
    out = {
        (r.k, r.ts.minute): (r.payload, r.asof_ts.minute if r.asof_ts else None)
        for r in asof_join(left, right, "k", "ts", "ts").collect()
    }
    assert out == {
        (1, 10): ("a", 5),   # latest right <= 00:10 is 00:05
        (1, 30): ("b", 20),  # latest right <= 00:30 is 00:20
        (2, 10): (None, None),  # right row is in the future
    }


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), "same")], "k long, ts timestamp, payload string"
    )
    r = asof_join(left, right, "k", "ts", "ts").collect()[0]
    assert r.payload == "same"  # <= semantics: equal ts matches


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(30))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), "old")], "k long, ts timestamp, payload string"
    )
    with_tol = asof_join(
        left, right, "k", "ts", "ts", tolerance="10 minutes"
    ).collect()[0]
    assert with_tol.payload is None  # 25 min gap > 10 min tolerance
    without = asof_join(left, right, "k", "ts", "ts").collect()[0]
    assert without.payload == "old"


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), "past"), (1, _ts(20), "next")],
        "k long, ts timestamp, payload string",
    )
    r = asof_join(left, right, "k", "ts", "ts", direction="forward").collect()[0]
    assert r.payload == "next"


def test_sessionize_gap_boundary(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(29)), (1, _ts(59)), (2, _ts(0))],
        "user_id long, ts timestamp",
    )
    out = {
        (r.user_id, r.ts.minute): r.session_id
        for r in sessionize(df, gap="30 minutes").collect()
    }
    # 0→29 gap < 30 min: same session; 29→59 gap == 30 min: new session
    assert out == {(1, 0): 0, (1, 29): 0, (1, 59): 1, (2, 0): 0}


def test_session_stats_end_is_last_plus_gap(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(10), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    r = session_stats(df, gap="30 minutes").collect()[0]
    assert r.session_start == _ts(0)
    assert r.session_end == _ts(40)  # last event 00:10 + 30 min
    assert r.n_events == 2 and r.total == 3.0


def test_asof_null_timestamps_never_match(spark):
    import datetime as dt

    from dataintegration_csvprovider_spark.operators.asof import asof_join

    T = dt.datetime(2020, 1, 1)
    left = spark.createDataFrame(
        [(1, "k", T), (2, "k", None)], "id bigint, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "k", T), (11, "k", None)], "rid bigint, k string, rts timestamp"
    )
    for direction in ("backward", "forward"):
        out = {
            r.id: r.rid
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                direction=direction,
            ).collect()
        }
        assert out[1] == 10  # equal-ts right row is visible
        assert out[2] is None  # null left ts -> no match, not rid 11


def test_asof_null_keys_never_match(spark):
    # equi-join/ASOF semantics: NULL keys never match, even though window
    # partitioning would group NULL-key left and right rows together
    import datetime as dt

    from dataintegration_csvprovider_spark.operators.asof import asof_join

    T = dt.datetime(2020, 1, 1)
    left = spark.createDataFrame(
        [(1, "k", T), (2, None, T)], "id bigint, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "k", T), (11, None, T)], "rid bigint, k string, rts timestamp"
    )
    for direction in ("backward", "forward"):
        out = {
            r.id: r.rid
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="rts",
                direction=direction,
            ).collect()
        }
        assert out[1] == 10
        assert out[2] is None  # null-key left row: no match, not rid 11


def test_asof_nearest_prefers_backward_on_ties(spark):
    from pyspark.sql import functions as F

    from dataintegration_csvprovider_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:00:00")], "id long, k string, ts string"
    ).select("id", "k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            ("k", "2024-01-01 09:00:00", "back"),
            ("k", "2024-01-01 11:00:00", "fwd"),
        ],
        "k string, ts string, v string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_payload=["v"], direction="nearest",
    ).collect()
    assert out[0]["v"] == "back"  # equidistant -> backward wins

    # strictly closer forward row wins
    right2 = spark.createDataFrame(
        [
            ("k", "2024-01-01 08:00:00", "back"),
            ("k", "2024-01-01 10:30:00", "fwd"),
        ],
        "k string, ts string, v string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out2 = asof_join(
        left, right2, on="k", left_ts="ts", right_ts="ts",
        right_payload=["v"], direction="nearest",
    ).collect()
    assert out2[0]["v"] == "fwd"

    # tolerance applies in BOTH directions for nearest
    out3 = asof_join(
        left, right2, on="k", left_ts="ts", right_ts="ts",
        right_payload=["v"], direction="nearest", tolerance="10 MINUTES",
    ).collect()
    assert out3[0]["v"] is None
