"""Round-11 law pins: the dedup-aware BM25 retrieval eval and the
streaming incremental-IVF twin."""

from __future__ import annotations


def test_bm25_dedup_eval_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_bm25_dedup_eval,
    )

    rows = {r["corpus"]: r for r in q_bm25_dedup_eval(spark, sf_dir).collect()}
    assert set(rows) == {"raw", "dedup"}
    raw, dd = rows["raw"], rows["dedup"]
    # dedup never grows the corpus, and the fixture has near-dups
    assert 0 < dd["n_docs"] < raw["n_docs"]
    # the deduplicated corpus holds exactly one doc per component, so
    # its top-k is component-distinct BY CONSTRUCTION — the law that
    # makes "dedup removes retrieval redundancy" a theorem, not a hope
    assert dd["topk_components"] == dd["n_topk"]
    # raw can only tie or waste slots
    assert raw["topk_components"] <= raw["n_topk"]
    # shared docs are a subset of both lists
    assert 0 <= raw["topk_shared"] <= min(raw["n_topk"], dd["n_topk"])
    assert raw["topk_shared"] == dd["topk_shared"]


def test_stream_ivf_incremental_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.streaming import (
        q_stream_ivf_incremental,
    )

    rows = {
        r["step"]: r
        for r in q_stream_ivf_incremental(spark, sf_dir).collect()
    }
    assert set(rows) == {"after_batch_0", "after_batch_1"}
    b0, b1 = rows["after_batch_0"], rows["after_batch_1"]
    # the natural delta must NOT fire the retrain signal; the
    # constructed single-direction drift batch MUST
    assert not b0["retrain_fired"]
    assert b1["retrain_fired"]
    # assignment mass conserves through the ledger at both checkpoints
    assert b0["mass_ok"] and b1["mass_ok"]
    assert 0 < b0["n_assigned"] < b1["n_assigned"]
    # crash-after-commit redelivery refused; crashed (manifest) and
    # control (listing) final states value-equal
    assert b0["redelivery_refused"] and b1["redelivery_refused"]
    assert b0["restart_equal"] and b1["restart_equal"]


def test_skew_join_planner_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.relational6 import (
        q_skew_join_planner,
    )

    rows = {
        r["which"]: r for r in q_skew_join_planner(spark, sf_dir).collect()
    }
    assert set(rows) == {"small_dim", "hot_key", "uniform"}
    # the decision rule is a pure function of the replayed statistics
    for r in rows.values():
        if r["dim_rows"] <= 10_000:
            assert r["strategy"] == "broadcast"
        elif r["max_share_pct"] >= 20:
            assert r["strategy"] == "aqe_skew"
        else:
            assert r["strategy"] == "shuffle_merge"
        # the executed plan matches the decision: broadcast iff chosen
        assert r["broadcast_used"] == (r["strategy"] == "broadcast")
    # the 51-row dim always broadcasts; the constructed hot key always
    # concentrates >= 20% of lineitem rows (l_linenumber <= 2 covers
    # first-and-second lines of every order)
    assert rows["small_dim"]["strategy"] == "broadcast"
    assert rows["hot_key"]["max_share_pct"] >= 20
    # every strategy returns the same row count (plan choice never
    # changes semantics)
    ns = {r["n_rows"] for r in rows.values()}
    assert len(ns) == 1


def test_stream_bm25_index_matches_batch(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.streaming import (
        q_stream_bm25_index,
    )
    from dataintegration_csvprovider_spark.queries.textmining import (
        q_bm25_topk,
    )

    inc = q_stream_bm25_index(spark, sf_dir).collect()
    batch = q_bm25_topk(spark, sf_dir).collect()
    # the incrementally-maintained index reproduces the from-scratch
    # batch build BIT-FOR-BIT — scores, order and ranks
    assert [
        (r["doc_id"], r["score"], r["rank"]) for r in inc
    ] == [(r["doc_id"], r["score"], r["rank"]) for r in batch]
    # the torn-composite crash healed: stats refused the re-delivery,
    # postings applied it, final state equal to the control build
    for r in inc:
        assert r["restart_equal"]
        assert r["stats_refused"]
        assert r["postings_applied"]


def test_incremental_components_merges_across_batches(spark):
    from dataintegration_csvprovider_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    e0 = spark.createDataFrame([(1, 2), (3, 4), (10, 11)],
                               "src long, dst long")
    lab0 = {
        r["node"]: r["component"]
        for r in incremental_components(None, e0).collect()
    }
    assert lab0 == {1: 1, 2: 1, 3: 3, 4: 3, 10: 10, 11: 10}
    # batch 1 bridges the two chains, adds a fresh singleton pair and
    # an edge internal to an existing component (a no-op merge)
    lab0_df = spark.createDataFrame(
        list(lab0.items()), "node long, component long"
    )
    e1 = spark.createDataFrame(
        [(2, 3), (20, 21), (10, 11)], "src long, dst long"
    )
    lab1 = {
        r["node"]: r["component"]
        for r in incremental_components(lab0_df, e1).collect()
    }
    assert lab1 == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20}
    # the incremental fixed point equals a from-scratch contraction
    # over the accumulated edges
    full = {
        r["node"]: r["component"]
        for r in connected_components(
            e0.unionByName(e1).selectExpr("src as a", "dst as b"),
            src="a", dst="b",
        ).collect()
    }
    assert lab1 == full


def test_classifier_incremental_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_classifier_incremental,
    )

    rows = {
        (r["variant"], r["label"]): r
        for r in q_classifier_incremental(spark, sf_dir).collect()
    }
    assert set(rows) == {
        ("warm", 0), ("warm", 1), ("cold", 0), ("cold", 1)
    }
    # both variants score the SAME corpus — label populations equal
    for lbl in (0, 1):
        assert rows[("warm", lbl)]["n"] == rows[("cold", lbl)]["n"]
    # the warm restart separates at least as well as equal cold work,
    # and the flag is consistent across all rows
    flags = {r["warm_better"] for r in rows.values()}
    assert flags == {True}
    sep_w = (
        rows[("warm", 1)]["mean_score"] - rows[("warm", 0)]["mean_score"]
    )
    sep_c = (
        rows[("cold", 1)]["mean_score"] - rows[("cold", 0)]["mean_score"]
    )
    assert sep_w >= sep_c
    # scores live in the sigmoid's (0, 1) range
    for r in rows.values():
        assert 0.0 <= r["mean_score"] <= 1.0
        assert 0.0 <= r["frac_ge_half"] <= 1.0


def test_semdedup_knn_eval_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_semdedup_knn_eval,
    )

    rows = {
        r["corpus"]: r for r in q_semdedup_knn_eval(spark, sf_dir).collect()
    }
    raw, dd = rows["raw"], rows["dedup"]
    # planted twins exist, so dedup strictly shrinks the corpus
    assert 0 < dd["n_vectors"] < raw["n_vectors"]
    assert raw["n_queries"] == dd["n_queries"] > 0
    # the deduplicated corpus holds one vector per cluster, so its
    # top-k can NEVER waste a slot — the theorem the ablation rests on
    assert dd["redundant_slots"] == 0
    # the raw corpus provably wastes slots: every query has a planted
    # twin pair near it in cosine space on this constructed corpus
    assert raw["redundant_slots"] > 0
    assert 0 <= raw["shared_slots"] <= min(
        raw["topk_slots"], dd["topk_slots"]
    )
    assert raw["shared_slots"] == dd["shared_slots"]
    # round 12: the IVF-blocked candidate stage recovered every planted
    # pair and invented none — the recall gate the bucketed SemDeDup
    # swap is pinned by
    assert raw["pair_recall_ok"] and raw["pair_exact_ok"]


def test_semantic_dedup_bucketed_gate(spark, sf_dir):
    """q_semantic_dedup (round 12: IVF-blocked candidates): planted
    twins cluster with their originals, representatives are min-id, and
    the blocking gate holds."""
    from dataintegration_csvprovider_spark.queries.llm import (
        q_semantic_dedup,
    )

    rows = q_semantic_dedup(spark, sf_dir).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert all(r["pair_recall_ok"] and r["pair_exact_ok"] for r in rows)
    twins = [r for r in rows if r["vec_id"] >= 10_000_000]
    assert twins  # non-vacuous: the corpus has planted twins
    for t in twins:
        orig = by_id[t["vec_id"] - 10_000_000]
        # each twin clusters with its original, whose id is smaller, so
        # the original is the representative and the twin never is
        assert t["cluster"] == orig["cluster"] == orig["vec_id"]
        assert orig["is_representative"] and not t["is_representative"]
    # untwinned sample vectors are their own singleton cluster
    for r in rows:
        if r["vec_id"] < 10_000_000 and r["vec_id"] % 3 != 0:
            assert r["cluster"] == r["vec_id"] and r["is_representative"]
