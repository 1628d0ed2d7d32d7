"""Scale toolkit: bucketed shuffle-free joins, salted skew joins,
parquet staging. Plan-shape assertions, not just results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.scale import (
    bucketed_join,
    convert_to_parquet,
    explain_has_exchange,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf — bucketed tables land in the default
    # spark-warehouse and are dropped in the finally block
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    write_bucketed(left, "t_left_bkt", 8, ["k"])
    write_bucketed(right, "t_right_bkt", 8, ["k"])
    # disable broadcast so a shuffle would otherwise be required
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_left_bkt", "t_right_bkt", ["k"])
        assert joined.count() == 10000
        assert not explain_has_exchange(joined), "bucketed join should not shuffle"
        # control: the same join on unbucketed frames does shuffle
        control = left.join(right, "k")
        control.count()
        assert explain_has_exchange(control)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_left_bkt")
        spark.sql("DROP TABLE IF EXISTS t_right_bkt")


def test_salted_join_matches_plain_join(spark):
    # heavy-hitter key 7: 5000 of 6000 rows
    left = spark.range(0, 6000).select(
        F.when(F.col("id") < 5000, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salt_buckets=8).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer_preserves_rows(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "x")], "k long, rv string")
    out = salted_join(left, right, "k", salt_buckets=4, how="left").collect()
    got = {(r.k, r.lv): r.rv for r in out}
    assert got == {(1, "a"): "x", (99, "b"): None}


def test_convert_to_parquet_prunes_partitions(spark, tmp_path):
    df = spark.range(0, 1000).select(
        (F.col("id") % 5).alias("part_col"), F.col("id").alias("v")
    )
    path = convert_to_parquet(df, str(tmp_path / "pq"), partition_by=["part_col"])
    back = spark.read.parquet(path).filter(F.col("part_col") == 3)
    assert back.count() == 200
    # partition pruning shows up as PartitionFilters in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_col" in plan.split("PartitionFilters")[1][:200]


def test_salted_join_rejects_right_and_full(spark):
    # right/full would replicate unmatched right rows once per salt —
    # refuse loudly instead of returning duplicated results
    import pytest

    from dataintegration_csvprovider_spark.operators.scale import salted_join

    left = spark.createDataFrame([(1, "x")], "k bigint, lv string")
    right = spark.createDataFrame([(1, "r")], "k bigint, rv string")
    for how in ("right", "full", "right_outer", "outer"):
        with pytest.raises(ValueError, match="multiplicity"):
            salted_join(left, right, on="k", how=how)


def test_salted_semi_anti_joins(spark):
    # semi/anti preserve left multiplicity: every salt copy of a present
    # right key exists, so the per-salt match decision equals the
    # unsalted one
    from dataintegration_csvprovider_spark.operators.scale import salted_join

    left = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, lv string")
    right = spark.createDataFrame([(1, "r1"), (3, "r3")], "k bigint, rv string")
    semi = salted_join(left, right, on="k", how="left_semi")
    assert [(r.k, r.lv) for r in semi.collect()] == [(1, "x")]
    anti = salted_join(left, right, on="k", how="left_anti")
    assert [(r.k, r.lv) for r in anti.collect()] == [(2, "y")]


def test_salted_left_join_preserves_unmatched(spark):
    from dataintegration_csvprovider_spark.operators.scale import salted_join

    left = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, lv string")
    right = spark.createDataFrame([(1, "r1"), (3, "r3")], "k bigint, rv string")
    rows = sorted(
        ((r.k, r.lv, r.rv) for r in
         salted_join(left, right, on="k", how="left").collect()),
        key=str,
    )
    assert rows == [(1, "x", "r1"), (2, "y", None)]


def test_distributed_cumsum_matches_window(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        distributed_cumsum,
    )

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), ((F.col("id") % 97) + 1).alias("v")
    )
    got = {
        r.k: r.c
        for r in distributed_cumsum(df, "k", "v", "c", num_partitions=16).collect()
    }
    # oracle: single-partition window (fine at test scale)
    from pyspark.sql import Window

    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: r.c for r in df.withColumn("c", F.sum("v").over(w)).collect()}
    assert got == want


def test_distributed_cumsum_deterministic_across_runs(spark):
    # Regression for the round-3 driver red row: the two internal jobs
    # (local window pass + totals pass) must see ONE set of range
    # boundaries. Before the eager localCheckpoint pin, Spark's range
    # partitioner re-sampled boundaries per job, so boundary-adjacent rows
    # could move between partitions and the broadcast offsets no longer
    # matched the local cumsums — correct counts, wrong sums, flaky.
    from dataintegration_csvprovider_spark.operators.scale import (
        distributed_cumsum,
    )

    # adversarial shape: many rows, values that make any misalignment
    # visible in the sums, and a partition count high enough that
    # boundaries fall inside dense key runs
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"), ((F.col("id") * 7919) % 1000 + 1).alias("v")
    )
    runs = [
        sorted(
            (r.k, r.c)
            for r in distributed_cumsum(
                df, "k", "v", "c", num_partitions=32
            ).collect()
        )
        for _ in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    # and the final value equals the plain total
    total = df.agg(F.sum("v")).collect()[0][0]
    assert runs[0][-1][1] == total


def test_write_range_clustered_disjoint_files(spark, tmp_path):
    # each output file must own a disjoint key range (that's what lets
    # row-group min/max stats prune whole files)
    import glob

    from dataintegration_csvprovider_spark.operators.scale import (
        write_range_clustered,
    )

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = str(tmp_path / "rc")
    write_range_clustered(df, out, ["k"], num_files=8)
    ranges = []
    for f in glob.glob(out + "/part-*.parquet"):
        part = spark.read.parquet(f).agg(
            {"k": "min"}
        ).collect()[0][0], spark.read.parquet(f).agg({"k": "max"}).collect()[0][0]
        ranges.append(part)
    ranges.sort()
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered ranges


def test_token_balanced_shards_contiguous_and_balanced(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        token_balanced_shards,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), ((F.col("id") % 50) + 1).alias("w")
    )
    out = token_balanced_shards(df, "k", "w", n_shards=4).collect()
    assert len(out) == 4000
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    # contiguity: shard key ranges are disjoint and ordered
    ranges = sorted(
        (min(r.k for r in rows), max(r.k for r in rows))
        for rows in by_shard.values()
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # balance: every shard within total/n +- max weight (the boundary doc)
    total = sum(r.w for r in out)
    for rows in by_shard.values():
        assert abs(sum(r.w for r in rows) - total / 4) <= 50


def test_concat_chunk_segments_exact_blocks(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        concat_chunk_segments,
    )

    # docs of 3, 5, 4, 2 tokens; block=4 -> stream of 14 tokens:
    # blocks: [0,4) [4,8) [8,12) [12,14)
    rows = [(1, 3), (2, 5), (3, 4), (4, 2), (5, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    segs = sorted(
        (r.block_id, r.doc_id, r.seg_start, r.seg_len)
        for r in concat_chunk_segments(
            df, "doc_id", "n_tokens", block=4
        ).collect()
    )
    # doc1 [0,3) -> b0; doc2 [3,8) -> b0 (tok 0), b1 (toks 1-4);
    # doc3 [8,12) -> b2; doc4 [12,14) -> b3; doc5 empty -> nothing
    assert segs == [
        (0, 1, 0, 3),
        (0, 2, 0, 1),
        (1, 2, 1, 4),
        (2, 3, 0, 4),
        (3, 4, 0, 2),
    ]


def test_concat_chunk_invariants(spark):
    from pyspark.sql import functions as F

    from dataintegration_csvprovider_spark.operators.scale import (
        concat_chunk_segments,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).cast("bigint").alias("n_tokens"),
    )
    segs = concat_chunk_segments(toks, "doc_id", "n_tokens", block=128)
    total_tokens = toks.agg(F.sum("n_tokens")).collect()[0][0]
    per_block = (
        segs.groupBy("block_id")
        .agg(F.sum("seg_len").alias("blk"))
        .collect()
    )
    # every block full except possibly the last; totals conserved
    n_blocks = len(per_block)
    assert sum(r["blk"] for r in per_block) == total_tokens
    full = [r for r in per_block if r["block_id"] < n_blocks - 1]
    assert all(r["blk"] == 128 for r in full)
    # per-doc segment lengths reassemble the doc exactly, contiguously
    per_doc = (
        segs.groupBy("doc_id")
        .agg(
            F.sum("seg_len").alias("tot"),
            F.min("seg_start").alias("first"),
        )
        .join(toks, "doc_id")
        .collect()
    )
    assert all(r["tot"] == r["n_tokens"] and r["first"] == 0 for r in per_doc)


def test_write_training_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from dataintegration_csvprovider_spark.sinks.shards import (
        write_training_shards,
    )

    rows = [(i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, path, n_shards=4, order_col="doc_id", weight_col="n_tokens"
    ).collect()
    m = {r["shard_id"]: r for r in manifest}
    assert set(m) == {0, 1, 2, 3}
    # all rows written, weights conserved
    assert sum(r["n_docs"] for r in manifest) == 200
    assert sum(r["shard_weight"] for r in manifest) == sum(w for _, w in rows)
    # contiguity: shard id ranges are disjoint and ordered
    spans = sorted((m[s]["first_id"], m[s]["last_id"]) for s in m)
    for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
        assert b1 < a2
    # balance: every shard within one max-doc-weight of the ideal
    total = sum(w for _, w in rows)
    for r in manifest:
        assert abs(r["shard_weight"] - total / 4) <= 7 + total / 4 * 0.1
    # written layout is actually partitioned by shard_id
    import os

    assert any(
        d.startswith("shard_id=") for d in os.listdir(path)
    )


def test_length_bucketed_batches(spark):
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from dataintegration_csvprovider_spark.operators.scale import (
        length_bucketed_batches,
    )

    rows = [(i, l) for i, l in enumerate([5, 8, 30, 33, 40, 70, 200, 7])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = length_bucketed_batches(
        df, "n_tokens", "doc_id", bucket_edges=[32, 64], batch_size=2
    ).collect()
    by_key = {(r["bucket"], r["batch_id"]): r for r in out}
    # bucket 0 (<=32): lengths 5,7,8,30 -> batches [5,7], [8,30]
    assert by_key[(0, 0)]["n_items"] == 2
    assert by_key[(0, 0)]["max_len"] == 7
    assert by_key[(0, 0)]["waste_tokens"] == 2 * 7 - 12
    assert by_key[(0, 1)]["max_len"] == 30
    # bucket 1 (33..64): 33,40 -> one batch
    assert by_key[(1, 0)]["n_items"] == 2 and by_key[(1, 0)]["max_len"] == 40
    # overflow bucket 2: 70,200
    assert by_key[(2, 0)]["padded_tokens"] == 2 * 200
    # conservation: every row lands in exactly one batch
    assert sum(r["n_items"] for r in out) == len(rows)
    with pytest.raises(ValueError):
        length_bucketed_batches(df, "n_tokens", "doc_id", [64, 32], 2)
    with pytest.raises(ValueError):
        length_bucketed_batches(df, "n_tokens", "doc_id", [32], 0)


def test_distributed_cumsum_multi_value(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from dataintegration_csvprovider_spark.operators.scale import (
        distributed_cumsum,
    )

    rows = [(i, i % 3 + 1, (i * 7) % 5) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out = distributed_cumsum(df, "k", ["a", "b"], ["ca", "cb"]).collect()
    got = {r["k"]: (r["ca"], r["cb"]) for r in out}
    ra = rb = 0
    for i, a, b in rows:
        ra += a
        rb += b
        assert got[i] == (ra, rb)
    # mismatched list lengths rejected
    import pytest

    with pytest.raises(ValueError):
        distributed_cumsum(df, "k", ["a", "b"], ["ca"])


def test_grouped_distributed_cumsum_matches_window(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        grouped_distributed_cumsum,
    )

    # 3 low-cardinality groups of uneven size — the exact shape where a
    # Window.partitionBy(group) funnels whole groups through one task
    df = spark.range(0, 6000).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("k"),
        ((F.col("id") % 97) + 1).alias("v"),
    )
    got = {
        (r.g, r.k): r.c
        for r in grouped_distributed_cumsum(
            df, "g", "k", "v", "c", num_partitions=16
        ).collect()
    }
    from pyspark.sql import Window

    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.g, r.k): r.c
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_grouped_distributed_cumsum_group_spans_partitions(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        grouped_distributed_cumsum,
    )

    # ONE group over many range partitions: per-(group, partition)
    # offsets must chain across every partition the group touches
    df = spark.range(0, 4000).select(
        F.lit("only").alias("g"), F.col("id").alias("k"), F.lit(1).alias("v")
    )
    out = grouped_distributed_cumsum(
        df, "g", "k", "v", "c", num_partitions=32
    ).collect()
    assert {r.k: r.c for r in out} == {i: i + 1 for i in range(4000)}


def test_grouped_distributed_cumsum_multi_order_cols(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        grouped_distributed_cumsum,
    )

    # ties in the first order col broken by the second (the weighted-
    # median shape: order by (n_chars, doc_id) within lang)
    rows = [(i % 2, (i * 3) % 7, i, 1 + i % 4) for i in range(500)]
    df = spark.createDataFrame(rows, "g long, a long, id long, v long")
    got = {
        (r.g, r.a, r.id): r.c
        for r in grouped_distributed_cumsum(
            df, "g", ["a", "id"], "v", "c", num_partitions=8
        ).collect()
    }
    want: dict = {}
    for g in (0, 1):
        run = 0
        for _, a, i, v in sorted(
            (r for r in rows if r[0] == g), key=lambda r: (r[1], r[2])
        ):
            run += v
            want[(g, a, i)] = run
    assert got == want


def test_ks_two_sample_known_values(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        ks_two_sample,
    )

    # a = {1..4}, b = {3..6}: F_a - F_b maximal at x=2 -> 2/4 - 0 = 0.5
    a = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4]], "v double")
    b = spark.createDataFrame([(float(x),) for x in [3, 4, 5, 6]], "v double")
    r = ks_two_sample(a, b, "v").collect()[0]
    assert r["ks_stat"] == 0.5
    assert r["n_a"] == 4 and r["n_b"] == 4
    # identical samples -> 0
    r2 = ks_two_sample(a, a, "v").collect()[0]
    assert r2["ks_stat"] == 0.0
