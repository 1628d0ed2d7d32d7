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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _sq_dist(vec_col: str, centroid: list[float]) -> Column:
    """Squared L2 distance between an array<double> column and a literal
    centroid, as a sequential fold (deterministic element order)."""
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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
    for _ in range(n_iter):
        dists = F.array(*[_sq_dist("v", c) for c in centroids])
        # array_position finds the FIRST minimum → ties break to the
        # lower cluster index
        cluster = (
            F.array_position(dists, F.array_min(dists)).cast("int") - 1
        ).alias("cluster")
        assigned = pts.select(
            "id", "v", cluster, F.array_min(dists).alias("sq_dist")
        )
        inertia = assigned.agg(
            F.sum(F.col("sq_dist").cast(DEC)).cast("double").alias("i")
        ).first()["i"]
        history.append({"inertia": float(inertia)})

        upd = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                (F.sum(F.col("x").cast(DEC)).cast("double") / F.count(F.lit(1)))
                .alias("m")
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        for r in upd:
            new_centroids[r.cluster][r.dim] = float(r.m)
        centroids = new_centroids

    return assigned.select("id", "cluster", "sq_dist"), history


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

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
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
