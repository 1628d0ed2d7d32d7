"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, left_ts, right_ts)`` attaches to every left
row the most recent right row with the same key whose timestamp is <= the
left timestamp (backward as-of; the standard time-series/point-in-time
lookup).

Implementation: the union-sort-window technique, not a per-group
pandas merge_asof — one shuffle on the key, one sort within partitions,
``last(ignorenulls)`` over an unbounded-preceding window to carry the
latest right payload forward onto left rows. Scales like any windowed
aggregation (partition by key; no broadcast, no cross product, no Python
boundary) and AQE handles key skew. ``tolerance`` optionally discards
matches older than the given interval, SQL-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward/forward as-of join.

    Returns ``left`` with ``right_payload`` columns (default: every right
    column except key/timestamp) from the matched right row, NULL when no
    right row qualifies (left-outer semantics).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in (*keys, right_ts)
        ]
    # a NULL right timestamp can never satisfy the as-of inequality, and
    # under nulls-first ordering it would otherwise be carried onto
    # null-ts left rows as a bogus match
    right = right.filter(F.col(right_ts).isNotNull())
    # NULL keys never match under equi-join/ASOF semantics, but window
    # partitioning groups NULLs together — drop NULL-key right rows so a
    # NULL-key left row keeps left-outer no-match nulls
    for k in keys:
        right = right.filter(F.col(k).isNotNull())

    # tag and align the two sides on (key, event time); right rows sort
    # before left rows at identical timestamps so an equal-ts right row
    # is visible to the left row (standard asof <= semantics)
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("__rts"),
                    *[F.col(c) for c in right_payload],
                ).alias("s")
            ).schema["s"].dataType
        ).alias("__right_row"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in right_payload],
        ).alias("__right_row"),
    )
    unioned = lhs.unionByName(rhs)

    w_back = (
        W.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if direction == "backward":
        carried = F.last("__right_row", ignorenulls=True).over(w_back)
    elif direction == "forward":
        carried = F.last("__right_row", ignorenulls=True).over(w_fwd)
    else:
        # nearest: carry BOTH candidates (two windows over the same
        # keyed sort — one shuffle, two in-partition sorts) and pick the
        # smaller |Δt|; equal distances prefer the backward match
        # (pandas merge_asof convention)
        back = F.last("__right_row", ignorenulls=True).over(w_back)
        fwd = F.last("__right_row", ignorenulls=True).over(w_fwd)
        d_back = F.col("__ts").cast("double") - back["__rts"].cast("double")
        d_fwd = fwd["__rts"].cast("double") - F.col("__ts").cast("double")
        carried = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_fwd < d_back, fwd)
            .otherwise(back)
        )

    matched = (
        # a NULL left timestamp matches nothing (left-outer semantics) —
        # without the guard, forward mode's nulls-last sort would hand it
        # the final carried payload
        unioned.withColumn(
            "__match", F.when(F.col("__ts").isNotNull(), carried)
        )
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        if direction == "nearest":
            in_range = (
                F.col("__match.__rts")
                >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
            ) & (
                F.col("__match.__rts")
                <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
            )
        else:
            bound = (
                F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
                if direction == "backward"
                else F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
            )
            in_range = (
                (F.col("__match.__rts") >= bound)
                if direction == "backward"
                else (F.col("__match.__rts") <= bound)
            )
        matched = matched.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )

    out_cols = [F.col(f"__left_row.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(c) for c in right_payload
    ] + [F.col("__match.__rts").alias(f"asof_{right_ts}")]
    return matched.select(*out_cols)
