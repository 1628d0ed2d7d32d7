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
