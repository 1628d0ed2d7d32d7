"""Skyline (Pareto-dominance) operator — an OLAP operator Spark lacks.

``skyline(df, minimize=[...], maximize=[...])`` returns the rows not
dominated by any other row: r' dominates r when r' is <= r on every
minimized criterion, >= on every maximized one, and strictly better on at
least one. Rows equal on every criterion do not dominate each other, so
exact ties all survive. Rows with a NULL criterion are excluded (their
dominance is undefined, matching SQL's NOT EXISTS semantics where NULL
comparisons are never true — such rows would trivially survive the oracle,
so the operator filters them first and the caller decides).

Distributed plan (the standard two-phase scheme; cf. "Integration of
Skyline Queries into Spark SQL", EDBT 2023 — PAPERS.md): a local skyline
per partition via ``mapInPandas`` (vectorized numpy dominance test, no
shuffle), then one final local pass over the union of the local skylines.
Correct because dominance is transitive: any globally dominated row is
dominated by some local-skyline row, so skyline(union of local skylines)
equals the global skyline. Skylines are typically tiny relative to input
(dozens from millions), so phase 2's single partition is metadata-sized;
at 100 TB the heavy lifting is phase 1, which is embarrassingly parallel
and prunes each partition to its skyline before anything moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pareto_mask(pdf: pd.DataFrame, minimize: list[str], maximize: list[str]):
    import numpy as np

    n = len(pdf)
    # minimize-all convention: flip maximized criteria (numeric negate;
    # datetimes and other ordered types compare via rank instead)
    cols = []
    for c in minimize:
        cols.append(pdf[c].rank(method="dense").to_numpy(dtype="float64"))
    for c in maximize:
        cols.append((-pdf[c].rank(method="dense")).to_numpy(dtype="float64"))
    V = np.column_stack(cols)  # n x k, smaller-is-better everywhere
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            # a dominated row can't be the only dominator of another row:
            # its dominator dominates transitively, so skipping is safe
            continue
        le_all = (V <= V[i]).all(axis=1)
        lt_any = (V < V[i]).any(axis=1)
        dominated_by_i = (V[i] <= V).all(axis=1) & (V[i] < V).any(axis=1)
        keep &= ~dominated_by_i
        keep[i] = not bool((le_all & lt_any).any())
    return keep


def skyline(
    df: DataFrame,
    minimize: list[str] | None = None,
    maximize: list[str] | None = None,
) -> DataFrame:
    """Two-phase distributed skyline over the given criteria columns."""
    minimize = list(minimize or [])
    maximize = list(maximize or [])
    if not minimize and not maximize:
        raise ValueError("at least one minimize/maximize column required")
    criteria = minimize + maximize
    clean = df.na.drop(subset=criteria)

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per Arrow batch, not per partition — still a sound pruning pass,
        # since any batch-skyline is a superset of its global contribution
        for pdf in batches:
            if len(pdf):
                yield pdf[_pareto_mask(pdf, minimize, maximize)]

    def final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the global pass MUST see all survivors at once: concatenate the
        # (small) batches before the dominance test
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            yield pdf[_pareto_mask(pdf, minimize, maximize)]

    schema = clean.schema
    phase1 = clean.mapInPandas(local, schema=schema)
    # the union of local skylines is small; one partition finishes the job
    return phase1.repartition(1).mapInPandas(final, schema=schema)
