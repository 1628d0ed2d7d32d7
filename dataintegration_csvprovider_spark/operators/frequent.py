"""Distributed heavy hitters: Misra-Gries candidates + exact recount.

`groupBy(x).count()` already finds exact frequencies with map-side
partial aggregation — but at 100 TB with a high-cardinality key the
shuffle carries every distinct key. The sketch route bounds that: each
partition keeps a k-counter Misra-Gries summary (mergeable-summaries
reduction, Agarwal et al. PODS 2012), so only O(k · partitions)
candidate keys leave the scan, and a second pass recounts *only the
candidates* exactly (broadcast semi-join, no wide shuffle).

Soundness: per partition p, MG with k counters retains every item whose
partition count exceeds n_p/(k+1). An item with global count
> N/(k+1) must exceed n_p/(k+1) in at least one partition (pigeonhole),
so choosing k with N/(k+1) below the report threshold makes the
candidate set a guaranteed superset — the exact recount then returns
precisely the SQL `HAVING count(*) > threshold` answer.

The reference has no aggregation surface at all (CSVProvider.cs row pump
only); this is §2.10 scale-extension territory.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(k: int, col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # vectorized per Arrow batch, then one MG merge: add batch
            # counts, and if over k counters subtract the (k+1)-th
            # largest and drop non-positives (mergeable-summaries rule)
            # dropna=False keeps a NULL candidate: SQL GROUP BY has a NULL
            # group, so a frequent-enough NULL key must be reportable too.
            # NaN is normalized to None so repeated batches hit one counter
            # (distinct float('nan') objects would hash to separate keys).
            for item, c in pdf[col].value_counts(dropna=False).items():
                if pd.isna(item):
                    item = None
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - cut for i, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return run


def heavy_hitters(
    df: DataFrame, col: str, min_frac: float, total: int | None = None
) -> DataFrame:
    """Items of ``df[col]`` occurring in more than ``min_frac`` of rows,
    with their exact counts — computed sketch-first (MG candidates),
    then exactly (candidate-only recount)."""
    if total is None:
        total = df.count()
    threshold = min_frac * total
    # N/(k+1) must sit strictly below the threshold for the superset
    # guarantee; 2/min_frac leaves a 2x safety margin
    k = math.ceil(2.0 / min_frac)
    src = df.select(col)
    candidates = (
        src.mapInPandas(_mg_partition(k, col), schema=src.schema)
        .distinct()
    )
    # Null-safe semi-join (<=>) so a NULL candidate still matches its
    # rows in the recount — EqualNullSafe is a hash-joinable equi-key,
    # and groupBy natively keeps the NULL group, matching SQL GROUP BY
    # / HAVING semantics exactly.
    cand = candidates.withColumnRenamed(col, "__hh_key")
    return (
        src.join(F.broadcast(cand), F.col(col).eqNullSafe(F.col("__hh_key")),
                 "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
    )
