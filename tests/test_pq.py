"""Product quantization: exact-on-codebook vectors, determinism, ADC
consistency, and the empty-cluster fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_knn,
    train_pq_codebooks,
)


def _clustered(spark):
    # 4 tight clusters in 8-dim space: cluster c sits at 10*c per dim,
    # members jitter by (i % 3) * 0.01 — PQ should recover clusters
    rows = []
    for i in range(40):
        c = i % 4
        base = [10.0 * c + (i % 3) * 0.01] * 8
        rows.append((i, base))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_roundtrip_on_clustered_data(spark):
    df = _clustered(spark)
    books = train_pq_codebooks(df, m=4, k=4, n_iter=3)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    assert all(len(c) == 2 for b in books for c in b)
    codes = pq_encode(df, books)
    rows = codes.collect()
    # members of the same cluster share the same full code word, and the
    # reconstruction error is the tiny within-cluster jitter
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.vec_id % 4, set()).add(tuple(r.codes))
        assert r.recon_sq < 0.01
    for codes_seen in by_cluster.values():
        assert len(codes_seen) == 1


def test_pq_codes_deterministic(spark):
    df = _clustered(spark)
    books1 = train_pq_codebooks(df, m=4, k=4, n_iter=2)
    books2 = train_pq_codebooks(df, m=4, k=4, n_iter=2)
    assert books1 == books2
    c1 = sorted((r.vec_id, tuple(r.codes)) for r in pq_encode(df, books1).collect())
    c2 = sorted(
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(df.repartition(7), books1).collect()
    )
    assert c1 == c2


def test_pq_adc_finds_own_cluster(spark):
    df = _clustered(spark)
    books = train_pq_codebooks(df, m=4, k=4, n_iter=3)
    codes = pq_encode(df, books)
    # query at cluster 2's center: ADC top-10 must all be cluster 2
    out = pq_adc_topk(codes, books, [20.0] * 8, k=10).collect()
    assert len(out) == 10 and all(r.vec_id % 4 == 2 for r in out)


def test_pq_knn_matches_exact_on_clustered(spark):
    df = _clustered(spark)
    books = train_pq_codebooks(df, m=4, k=4, n_iter=3)
    codes = pq_encode(df, books)
    q = [30.0] * 8
    got = [r.vec_id for r in pq_knn(df, codes, books, q, k=5, shortlist=15).collect()]
    qlit = F.array(*[F.lit(x) for x in q])
    d = F.aggregate(
        F.zip_with("embedding", qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = [
        r.vec_id
        for r in df.select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(5)
        .collect()
    ]
    assert got == exact


def test_pq_dim_not_divisible_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(df, m=2, k=2)


def test_pq_empty_cluster_keeps_previous_centroid(spark):
    # 3 distinct points, k=4 -> at least one code never wins an
    # assignment; training must not KeyError and every code must stay
    # addressable
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    books = train_pq_codebooks(df, m=2, k=4, n_iter=2)
    assert all(len(b) == 4 for b in books)
    assert pq_encode(df, books).count() == 3
