"""Linear-algebra operator invariants (operators/linalg.py): exact vs
Arrow covariance agreement, eigen identities, projection parity with
numpy, whitening, and the deterministic sign pin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.linalg import (
    covariance_exact,
    gram_arrow,
    pca_fit,
    pca_project,
    pca_variance_table,
)

D = 6
N = 400


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    # correlated data so PCA has real structure
    base = rng.randn(N, 3)
    mix = rng.randn(3, D)
    x = (base @ mix + 0.1 * rng.randn(N, D) + [1, -2, 0, 3, 0, 0]).astype(
        np.float32
    )
    rows = [(i, x[i].tolist()) for i in range(N)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        x.astype(np.float64),
    )


def test_covariance_exact_matches_numpy(spark, vec_df):
    df, x = vec_df
    got = {(r["i"], r["j"]): r for r in covariance_exact(df).collect()}
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    assert len(got) == D * (D + 1) // 2
    for (i, j), r in got.items():
        assert r["n"] == N
        assert abs(r["mean_i"] - mean[i]) < 1e-9
        assert abs(r["cov"] - cov[i, j]) < 1e-9


def test_gram_arrow_matches_exact(spark, vec_df):
    df, x = vec_df
    s, g, n = gram_arrow(df)
    assert n == N
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    ref = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(cov, ref, atol=1e-9)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-12)


def test_covariance_exact_rejects_ragged(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ragged"):
        covariance_exact(df)


def test_pca_fit_invariants(spark, vec_df):
    df, x = vec_df
    model = pca_fit(df, k=D)  # full decomposition
    ev = model["eigenvalues"]
    # eigenvalues descend and are non-negative (covariance is PSD)
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(D - 1))
    assert ev[-1] > -1e-9
    # trace identity: sum of ALL eigenvalues == total variance
    assert abs(ev.sum() - model["trace"]) < 1e-9
    # components are orthonormal rows
    c = model["components"]
    assert np.allclose(c @ c.T, np.eye(D), atol=1e-9)
    # deterministic sign pin: largest-|coord| entry of each row positive
    for row in c:
        assert row[int(np.argmax(np.abs(row)))] > 0
    # k out of range
    with pytest.raises(ValueError):
        pca_fit(df, k=D + 1)


def test_pca_project_matches_numpy_and_eigenvalue_variance(spark, vec_df):
    df, x = vec_df
    k = 3
    model = pca_fit(df, k=k)
    out = (
        pca_project(df, model, out_col="pc")
        .select("vec_id", "pc")
        .collect()
    )
    got = np.array(
        [r["pc"] for r in sorted(out, key=lambda r: r["vec_id"])]
    )
    ref = (x - model["mean"]) @ model["components"].T
    assert np.allclose(got, ref, atol=1e-8)
    # per-axis projected variance equals the eigenvalue
    var = got.var(axis=0)  # population, matching the fit convention
    assert np.allclose(var, model["eigenvalues"], rtol=1e-6)


def test_pca_whiten_unit_variance(spark, vec_df):
    df, _ = vec_df
    model = pca_fit(df, k=3)
    out = pca_project(df, model, out_col="pc", whiten=True).select("pc")
    got = np.array([r["pc"] for r in out.collect()])
    assert np.allclose(got.var(axis=0), np.ones(3), rtol=1e-6)


def test_pca_exact_and_arrow_paths_agree(spark, vec_df):
    df, _ = vec_df
    m1 = pca_fit(df, k=3, exact=True)
    m2 = pca_fit(df, k=3, exact=False)
    assert np.allclose(m1["eigenvalues"], m2["eigenvalues"], rtol=1e-9)
    assert np.allclose(m1["components"], m2["components"], atol=1e-7)
    assert m1["n"] == m2["n"] == N


def test_pca_variance_table_cumulative(spark, vec_df):
    df, _ = vec_df
    model = pca_fit(df, k=D)
    table = pca_variance_table(model)
    assert len(table) == D
    assert abs(table[-1][2] - 1.0) < 1e-9  # full k explains everything
    ratios = [r[2] for r in table]
    assert all(a <= b + 1e-12 for a, b in zip(ratios, ratios[1:]))


def test_scrub_boilerplate_lines_drops_shared_lines(spark):
    from dataintegration_csvprovider_spark.operators.textstats import (
        scrub_boilerplate_lines,
    )

    banner = "nav nav nav"
    rows = [
        (1, "s1", f"{banner} alpha beta gamma"),
        (2, "s1", f"{banner} delta epsilon zeta"),
        (3, "s1", f"{banner} eta theta iota"),
        (4, "s2", f"{banner} kappa lambda mu"),  # other source: only 1 doc
        (5, "s1", ""),  # empty doc survives as a row
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["doc_id"]: r
        for r in scrub_boilerplate_lines(
            df, words_per_line=3, min_docs=3
        ).collect()
    }
    assert len(out) == 5
    # the banner line is boilerplate within s1 (3 docs) and dropped
    assert out[1]["text_scrubbed"] == "alpha beta gamma"
    assert out[1]["n_lines"] == 2 and out[1]["n_lines_dropped"] == 1
    # s2 has only one doc with the banner — kept there
    assert out[4]["text_scrubbed"].startswith(banner)
    assert out[4]["n_lines_dropped"] == 0
    # empty doc: zero lines, empty output
    assert out[5]["n_lines"] == 0 and out[5]["text_scrubbed"] == ""


def test_snapshot_diff_statuses(spark):
    from dataintegration_csvprovider_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k long, v string"
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [], ["v"])


def test_prototype_prune_keeps_hardest(spark):
    from dataintegration_csvprovider_spark.operators.sampling import (
        prototype_prune,
    )

    # one bucket: 4 points on a line; centroid = 2.5 -> farthest are 0, 5
    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [2.0, 0.0]),
        (3, 0, [3.0, 0.0]),
        (4, 0, [5.0, 0.0]),
        (5, 1, [9.0, 9.0]),  # singleton bucket
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, bucket int, embedding array<float>"
    )
    out = {
        r["vec_id"]: r
        for r in prototype_prune(
            df, bucket_col="bucket", keep_frac=0.5
        ).collect()
    }
    # ceil(4*0.5)=2 kept in bucket 0: the two extremes
    assert out[1]["kept"] and out[4]["kept"]
    assert not out[2]["kept"] and not out[3]["kept"]
    assert out[1]["keep_rank"] == 1  # dist 2.5 ties -> vec_id breaks
    assert out[4]["keep_rank"] == 2
    assert out[1]["n_bucket"] == 4
    # singleton bucket always kept (ceil(1*0.5)=1)
    assert out[5]["kept"] and out[5]["dist2"] == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prototype_prune(df, bucket_col="bucket", keep_frac=0.0)


def test_span_corruption_t5_shape(spark):
    from dataintegration_csvprovider_spark.operators.textstats import (
        span_corruption,
    )

    # 24 words a0..a23 -> spans of 3; spans 3 and 7 masked
    words = [f"w{i}" for i in range(24)]
    rows = [(1, " ".join(words)), (2, "x y"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(df).collect()}
    r = out[1]
    assert r["n_words"] == 24 and r["n_masked"] == 6
    exp_input = (
        " ".join(words[0:9]) + " <extra_id_0> "
        + " ".join(words[12:21]) + " <extra_id_1>"
    )
    exp_target = (
        "<extra_id_0> " + " ".join(words[9:12])
        + " <extra_id_1> " + " ".join(words[21:24])
    )
    assert r["input"] == exp_input
    assert r["target"] == exp_target
    # short doc: no span reaches the masked stride
    assert out[2]["n_masked"] == 0 and out[2]["input"] == "x y"
    assert out[2]["target"] == ""
    # empty doc
    assert out[3]["n_words"] == 0 and out[3]["input"] == ""


def test_grouped_pca_summary_matches_numpy(spark, vec_df):
    from dataintegration_csvprovider_spark.operators.linalg import (
        grouped_pca_summary,
    )

    df, x = vec_df
    # two groups by parity of vec_id
    gdf = df.withColumn("g", (F.col("vec_id") % 2).cast("int"))
    out = grouped_pca_summary(gdf, "g", id_col="vec_id", k=2).collect()
    got = {(r["g"], r["comp"]): r for r in out}
    assert len(got) == 4
    for g in (0, 1):
        xs = x[g::2] if g == 0 else x[1::2]
        # numpy reference on the same rows (vec_id order == row order)
        idx = [i for i in range(len(x)) if i % 2 == g]
        xs = x[idx]
        cov = np.cov(xs, rowvar=False, bias=True)
        ev = np.sort(np.linalg.eigvalsh(cov))[::-1]
        for c in (0, 1):
            r = got[(g, c)]
            assert abs(r["eigenvalue"] - ev[c]) < 1e-8
            assert abs(r["explained_ratio"] - ev[c] / np.trace(cov)) < 1e-10
            assert r["n"] == len(idx)
    # deterministic across runs (worker-side sort pins the sum order)
    out2 = grouped_pca_summary(
        gdf.repartition(7), "g", id_col="vec_id", k=2
    ).collect()
    assert {(r["g"], r["comp"]): r["eigenvalue"] for r in out2} == {
        (r["g"], r["comp"]): r["eigenvalue"] for r in out
    }
    # tiny group skipped
    tiny = spark.createDataFrame(
        [(1, 0, [1.0, 2.0])], "vec_id long, g int, embedding array<float>"
    )
    assert grouped_pca_summary(tiny, "g").count() == 0


def test_round5_operators_tolerate_empty_input(spark):
    from pyspark.sql import functions as F

    from dataintegration_csvprovider_spark.operators.cdc import snapshot_diff
    from dataintegration_csvprovider_spark.operators.sampling import (
        budget_curation,
        negative_samples,
        prototype_prune,
    )
    from dataintegration_csvprovider_spark.operators.textstats import (
        scrub_boilerplate_lines,
        span_corruption,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    empty_vecs = spark.createDataFrame(
        [], "vec_id long, bucket int, embedding array<float>"
    )
    assert scrub_boilerplate_lines(empty_docs).count() == 0
    assert span_corruption(empty_docs).count() == 0
    assert prototype_prune(empty_vecs, "bucket").count() == 0
    assert negative_samples(empty_docs, "doc_id").count() == 0
    assert (
        budget_curation(
            empty_docs.withColumn("w", F.lit(1).cast("long")),
            "source", "doc_id", "w", "w", {"x": 10},
        ).count()
        == 0
    )
    assert snapshot_diff(empty_docs, empty_docs, ["doc_id"], ["text"]).count() == 0
