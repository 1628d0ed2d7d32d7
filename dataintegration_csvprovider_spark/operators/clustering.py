"""Iterative k-means over an embedding column — the canonical iterative
algorithm on Spark (small model state on the driver, data never leaves
the cluster).

Per iteration:
1. assign: broadcast the k×d centroid table into a literal expression and
   argmin squared distance per row — pure column math, JVM-side, no
   shuffle, no Python;
2. update: posexplode the embedding to (cluster, dim, value) rows and
   recompute per-dimension means with exact-decimal sums (one shuffle on
   (cluster, dim); order-independent floats, so runs are bit-reproducible).

Only the k×d centroid matrix is collected to the driver between
iterations (k-means' model state is inherently tiny); the point set is
persisted once and reused across iterations. At 100 TB the same loop
holds: assignment is a map-only stage over the scan, the update shuffle
carries k*d*partitions partial rows, and init should swap argmin-on-id
for k-means|| sampling.

Deterministic by construction: init picks the k vectors with the
smallest ids, distance ties break toward the lower cluster index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _assign_clusters_arrow(pts: DataFrame, centroids: list[list[float]]):
    """Nearest-centroid assignment as one Arrow-batched map stage.

    The expression form (k literal-array HOF folds per row) is
    interpreted per element AND its plan grows with k — at k=40 the
    assignment scan alone measured ~7 s/iteration on 20k×64 vectors,
    and at IVF-scale k (thousands) the expression tree itself becomes
    the bottleneck. Here the centroid matrix rides the closure
    (broadcast-sized: k×d doubles) and each batch computes all k
    distances vectorized.

    Determinism contract: squared distances accumulate DIMENSION-
    SEQUENTIALLY in float64 (``acc += (x_i - c_i)²`` — vectorized over
    rows×clusters, sequential over dims), bit-equal to the
    ``aggregate``-fold the expression path computed; ``np.argmin``
    returns the FIRST minimum, matching array_position's tie-break to
    the lower cluster index. Row-chunking bounds the per-task distance
    matrix at 1024×k float64."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)  # k × d
    k, d = C.shape

    id_field = pts.schema["id"]
    out_schema = (
        f"id {id_field.dataType.simpleString()}, v array<double>, "
        "cluster int, sq_dist double"
    )

    def assign(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            clusters = np.empty(m, dtype=np.int32)
            sq = np.empty(m, dtype=np.float64)
            for lo in range(0, m, 1024):
                Xc = X[lo : lo + 1024]
                acc = np.zeros((len(Xc), k))
                for i in range(d):
                    diff = Xc[:, i][:, None] - C[:, i][None, :]
                    acc = acc + diff * diff
                clusters[lo : lo + 1024] = np.argmin(acc, axis=1)
                sq[lo : lo + 1024] = acc[
                    np.arange(len(Xc)), clusters[lo : lo + 1024]
                ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "v": pdf["v"],
                    "cluster": clusters,
                    "sq_dist": sq,
                }
            )

    return pts.mapInPandas(assign, out_schema)


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
) -> tuple[DataFrame, list[dict]]:
    """Run ``n_iter`` Lloyd iterations; returns (assignments, history).

    ``assignments``: one row per input row — (id, cluster, sq_dist).
    ``history``: per-iteration dicts with ``inertia`` (total squared
    distance under the centroids that produced the assignment).
    """
    assigned, history = _kmeans_full(df, vec_col, id_col, k, n_iter)
    return assigned.select("id", "cluster", "sq_dist"), history


def _kmeans_full(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
) -> tuple[DataFrame, list[dict]]:
    """:func:`kmeans`, but the returned assignment keeps the widened
    ``v array<double>`` column — callers that aggregate over the vectors
    (e.g. the IVF centroid refinement) read it straight off the
    assignment instead of re-scanning the source and re-attaching
    vectors with an id-keyed shuffle join.

    Per iteration this runs ONE action, not two: the per-dimension
    centroid means and the inertia ride the same (cluster, dim)
    aggregation — the inertia total is the exact decimal sum of the
    per-cluster partials carried on the dim-0 rows (decimal addition is
    associative, so the value is bit-equal to the old single global
    sum). The final iteration skips the centroid update entirely (the
    updated centroids were computed and discarded — the returned
    assignment is against the PRE-update centroids). Net: n_iter
    assignment passes over the data instead of 2·n_iter.
    """
    from decimal import Decimal

    pts = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()

    # deterministic init: the k lowest-id vectors
    centroids = [
        list(r.v) for r in pts.orderBy("id").limit(k).collect()
    ]

    history: list[dict] = []
    assigned = None
    for it in range(n_iter):
        assigned = _assign_clusters_arrow(pts, centroids)
        if it == n_iter - 1:
            # last round: the centroid update would be dead work
            inertia = assigned.agg(
                F.sum(F.col("sq_dist").cast(DEC)).cast("double").alias("i")
            ).first()["i"]
            history.append({"inertia": float(inertia)})
            break

        upd = (
            assigned.select(
                "cluster", "sq_dist", F.posexplode("v").alias("dim", "x")
            )
            .groupBy("cluster", "dim")
            .agg(
                (F.sum(F.col("x").cast(DEC)).cast("double") / F.count(F.lit(1)))
                .alias("m"),
                # every point's sq_dist appears exactly once across the
                # dim-0 groups; summing those decimal partials in the
                # driver reproduces the old global decimal sum exactly
                F.sum(
                    F.when(F.col("dim") == 0, F.col("sq_dist")).cast(DEC)
                ).alias("pi"),
            )
            .collect()
        )
        inertia_dec = sum(
            (r["pi"] for r in upd if r["pi"] is not None), Decimal(0)
        )
        history.append({"inertia": float(inertia_dec)})
        new_centroids = [list(c) for c in centroids]
        for r in upd:
            new_centroids[r.cluster][r.dim] = float(r.m)
        centroids = new_centroids

    return assigned, history


def grouped_linear_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    order_col: str,
) -> DataFrame:
    """Per-group least-squares line fit via ``applyInPandas`` (grouped-map
    Pandas UDF): each group arrives as one Arrow batch; moments are
    accumulated as sequential Python-float folds in ``order_col`` order so
    results are order-deterministic (and match an engine that folds a
    sorted list left-to-right).

    The grouped-map pattern is the engine's slot for per-entity model
    fitting that SQL can't express; at scale each group must fit one
    task's memory — for giant groups, pre-aggregate moments in SQL
    instead (see q_corr_decimal for that route)."""
    import pandas as pd

    schema = (
        f"{group_col} string, n bigint, slope double, intercept double"
    )

    def fit(pdf):  # no hints: applyInPandas infers from schema arg
        pdf = pdf.sort_values(order_col)
        n = len(pdf)
        sx = sy = sxx = sxy = 0.0
        for x, y in zip(pdf[x_col].astype(float), pdf[y_col].astype(float)):
            sx += x
            sy += y
            sxx += x * x
            sxy += x * y
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return (
        df.select(group_col, order_col, x_col, y_col)
        .groupBy(group_col)
        .applyInPandas(fit, schema=schema)
    )
