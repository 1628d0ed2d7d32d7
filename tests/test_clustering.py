"""k-means: determinism, monotone inertia, full assignment coverage."""

from __future__ import annotations

from dataintegration_csvprovider_spark.catalog import load_table
from dataintegration_csvprovider_spark.operators.clustering import kmeans


def test_kmeans_converges_and_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    assigned, hist = kmeans(emb, k=4, n_iter=3)
    rows = assigned.collect()
    assert len(rows) == n
    assert {r.cluster for r in rows} <= set(range(4))
    # Lloyd's algorithm never increases inertia
    inertias = [h["inertia"] for h in hist]
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))
    # bit-reproducible across runs (decimal sums, deterministic init/ties)
    assigned2, hist2 = kmeans(emb, k=4, n_iter=3)
    assert [h["inertia"] for h in hist2] == inertias
    assert sorted(map(tuple, assigned2.collect())) == sorted(map(tuple, rows))


def test_grouped_linear_fit_exact_line(spark):
    # points on an exact line per group -> slope/intercept recovered
    from dataintegration_csvprovider_spark.operators.clustering import (
        grouped_linear_fit,
    )

    rows = [("g1", i, float(i), 2.0 * i + 1.0) for i in range(10)]
    rows += [("g2", i, float(i), -0.5 * i + 3.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, ord int, x double, y double")
    out = {
        r.g: r
        for r in grouped_linear_fit(
            df, group_col="g", x_col="x", y_col="y", order_col="ord"
        ).collect()
    }
    assert abs(out["g1"].slope - 2.0) < 1e-12
    assert abs(out["g1"].intercept - 1.0) < 1e-12
    assert abs(out["g2"].slope + 0.5) < 1e-12
    assert abs(out["g2"].intercept - 3.0) < 1e-12


def test_ivf_k_adaptive_sizing():
    from dataintegration_csvprovider_spark.operators.similarity import (
        IVF_MIN_CENTROIDS,
        IVF_TARGET_BUCKET,
        _ivf_k,
    )

    # small corpora clamp to the minimum (k-means needs enough points)
    assert _ivf_k(0) == IVF_MIN_CENTROIDS
    assert _ivf_k(2_000) == IVF_MIN_CENTROIDS
    # beyond min*target vectors, partitions stay ~target-sized: the
    # within-partition pair work k*(n/k)^2 = n*target is LINEAR in n
    assert _ivf_k(20_000) == -(-20_000 // IVF_TARGET_BUCKET)
    n = 10_000_000
    k = _ivf_k(n)
    assert abs(n / k - IVF_TARGET_BUCKET) <= 1
