"""CDC operator semantics (operators/cdc.py): upsert edge cases and SCD2
version collapse, including NULL attribute transitions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.cdc import (
    apply_changeset,
    scd2,
)


def test_changeset_insert_update_delete(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "U", 1),   # update existing
            (3, None, "D", 1),   # delete existing
            (4, "d", "I", 1),    # insert new key
            (5, None, "D", 1),   # delete of absent key: no-op
        ],
        "k bigint, v string, op string, seq int",
    )
    out = {
        r.k: r.v
        for r in apply_changeset(base, changes, ["k"], seq_col="seq").collect()
    }
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_changeset_latest_seq_wins(spark):
    base = spark.createDataFrame([(1, "a")], "k bigint, v string")
    changes = spark.createDataFrame(
        [(1, "v1", "U", 1), (1, "v2", "U", 2), (1, "v0", "U", 0)],
        "k bigint, v string, op string, seq int",
    )
    out = apply_changeset(base, changes, ["k"], seq_col="seq").collect()
    assert [(r.k, r.v) for r in out] == [(1, "v2")]
    # a later delete beats an earlier update
    changes2 = spark.createDataFrame(
        [(1, "v1", "U", 1), (1, None, "D", 2)],
        "k bigint, v string, op string, seq int",
    )
    assert apply_changeset(base, changes2, ["k"], seq_col="seq").count() == 0


def test_scd2_collapses_unchanged_runs(spark):
    T = dt.datetime(2020, 1, 1)

    def at(h):
        return T + dt.timedelta(hours=h)

    log = spark.createDataFrame(
        [
            (1, at(0), "bronze"),
            (1, at(1), "bronze"),   # unchanged -> same version
            (1, at(2), "silver"),
            (1, at(3), None),       # change to NULL is a new version
            (1, at(4), None),       # unchanged NULL -> same version
            (1, at(5), "gold"),
            (2, at(0), "gold"),
        ],
        "user_id bigint, ts timestamp, tier string",
    )
    hist = scd2(log, ["user_id"], "ts", ["tier"]).collect()
    u1 = sorted(
        [(r.tier, r.valid_from.hour, r.valid_to.hour if r.valid_to else None)
         for r in hist if r.user_id == 1]
    , key=lambda t: t[1])
    assert u1 == [
        ("bronze", 0, 2),
        ("silver", 2, 3),
        (None, 3, 5),
        ("gold", 5, None),
    ]
    u2 = [r for r in hist if r.user_id == 2]
    assert len(u2) == 1 and u2[0].valid_to is None


def test_pagerank_cycle_and_mass(spark):
    from dataintegration_csvprovider_spark.operators.graph import pagerank

    # 3-cycle: perfectly symmetric, every rank stays 1/3 at any iteration
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src bigint, dst bigint"
    )
    ranks = {r.node: r.rank for r in pagerank(cyc, iterations=5).collect()}
    assert all(abs(v - 1 / 3) < 1e-9 for v in ranks.values()), ranks
    # asymmetric graph: rank mass is conserved (no dangling nodes) and the
    # hub (everyone points at 1) outranks the spokes
    star = spark.createDataFrame(
        [(2, 1), (3, 1), (1, 2), (1, 3), (2, 3)], "src bigint, dst bigint"
    )
    out = {r.node: r.rank for r in pagerank(star, iterations=10).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert out[1] > out[2] and out[1] > out[3]
