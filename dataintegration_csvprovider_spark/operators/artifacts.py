"""Trained-artifact persistence: the "train once per corpus version,
reuse across jobs" contract as concrete API.

Three trained-operator families produce small driver/cluster artifacts
that are expensive to recompute and cheap to store:

- **IVF centroids** (`similarity.trained_ivf_centroids`) — a k-row
  DataFrame; reused by `embedding_near_dup_pairs(centroids=...)` and
  `knn_ivf(centroids=...)`, where the snapshot path skips both k-means
  training AND the adaptive-k corpus count.
- **PQ codebooks** (`pq.train_pq_codebooks`) — an m×k×sub nested list;
  reused by `pq_encode`/`knn_ivfpq`.
- **BPE merges** (`tokenizer.train_bpe_merges`) — an ordered pair list;
  reused by `bpe_token_counts`.

All three serialize to plain parquet (columnar, splittable, readable by
any engine — the same reasoning as the corpus itself; no pickles), with
explicit ordering columns so reload is bit-deterministic regardless of
file/row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# -- IVF centroids ---------------------------------------------------------


def save_centroids(centroids: DataFrame, path: str) -> str:
    """Persist a (centroid_id, centroid) snapshot as parquet."""
    centroids.select("centroid_id", "centroid").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def load_centroids(spark: SparkSession, path: str) -> DataFrame:
    """Reload a centroid snapshot (ordered by id for determinism)."""
    return spark.read.parquet(path).orderBy("centroid_id")


# -- PQ codebooks ----------------------------------------------------------


def save_pq_codebooks(
    books: list[list[list[float]]], spark: SparkSession, path: str
) -> str:
    """Persist m×k×sub codebooks as (subspace, code, center) rows."""
    rows = [
        (j, c, [float(x) for x in center])
        for j, book in enumerate(books)
        for c, center in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, center array<double>"
    ).write.mode("overwrite").parquet(path)
    return path


def load_pq_codebooks(
    spark: SparkSession, path: str
) -> list[list[list[float]]]:
    """Reload codebooks into the nested-list form the PQ operators take."""
    rows = spark.read.parquet(path).collect()
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    books: list[list[list[float]] | None] = [[None] * k for _ in range(m)]
    for r in rows:
        books[r["subspace"]][r["code"]] = [float(x) for x in r["center"]]
    for j, book in enumerate(books):
        for c, center in enumerate(book):
            if center is None:
                raise ValueError(f"codebook hole at subspace {j} code {c}")
    return books  # type: ignore[return-value]


# -- BPE merges ------------------------------------------------------------


def save_bpe_merges(
    merges: list[tuple[str, str]], spark: SparkSession, path: str
) -> str:
    """Persist the ordered merge list as (rank, left, right) rows."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).write.mode("overwrite").parquet(path)
    return path


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Reload merges in training order (rank column, not file order)."""
    return [
        (r["left"], r["right"])
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
