"""Pins the exact-Jaccard strategy auto-selection and its rationale.

Measured basis (sf0.1 fixture: 5000 docs, 931 distinct bigrams, median
df 285 — every gram is a stopword-gram, Σdf² = 73M):

- ``index`` (full inverted-index join): 7.3 s warm — join size is Σdf²,
  which grows ~quadratically in corpus size when the vocabulary stays
  uniform (measured 29 s at a 15k-doc 3× blow-up).
- ``prefix`` (PPJoin): 22 s on the same fixture — a uniform vocabulary
  has no rare-gram tail, so the prefix is ~half of each set and the
  per-doc df-rank window dominates. It wins precisely when the
  vocabulary is Zipfian (web-scale corpora), which is why it is the
  non-dense default.
- ``dense`` (broadcast packed bitset + blocked matmul): ~1 s of scoring
  on the same fixture — the tiny-uniform-vocabulary regime is exactly
  where inverted indexes degenerate to the same O(n²) with shuffle-join
  constants, so the O(n²)-by-construction scorer with BLAS constants
  wins. Bounded by DENSE_MAX_DOCS / DENSE_MAX_CELLS / DENSE_MAX_MULS so
  it can never be chosen at 100 TB scale (the driver collect is capped
  at ~64 MB of packed bits and the vocabulary collect is LIMIT-capped).
"""

from pyspark.sql import functions as F

from dataintegration_csvprovider_spark.operators.dedup import (
    DENSE_MAX_CELLS,
    DENSE_MAX_DOCS,
    DENSE_MAX_MULS,
    _choose_jaccard_method,
    ngram_jaccard_pairs,
)


def test_choose_dense_for_small_uniform_corpus():
    # the bench fixture's regime at sf0.01 / sf0.1 / a 15k-doc blow-up
    assert _choose_jaccard_method(500, 916) == "dense"
    assert _choose_jaccard_method(5_000, 931) == "dense"
    assert _choose_jaccard_method(15_000, 931) == "dense"


def test_choose_prefix_at_scale():
    # any web-scale corpus: billions of docs and/or a vocabulary whose
    # bitset matrix cannot broadcast
    assert _choose_jaccard_method(1_000_000, 50_000) == "prefix"
    assert _choose_jaccard_method(2_000_000_000, 10_000_000) == "prefix"
    # doc-count bound alone
    assert _choose_jaccard_method(DENSE_MAX_DOCS + 1, 10) == "prefix"
    # bitset-broadcast bound: docs * vocab bits > DENSE_MAX_CELLS
    docs = 100_000
    assert docs * (DENSE_MAX_CELLS // docs + 1) > DENSE_MAX_CELLS
    assert _choose_jaccard_method(docs, DENSE_MAX_CELLS // docs + 1) == "prefix"
    # matmul-work bound: docs² * vocab > DENSE_MAX_MULS
    docs = 150_000
    v = DENSE_MAX_MULS // (docs * docs) + 1
    assert _choose_jaccard_method(docs, v) == "prefix"


def test_bounds_are_broadcast_and_seconds_scale():
    # the gates encode "fits in one broadcast" and "a few seconds of
    # BLAS": packed bits <= 64 MB, multiply-adds <= 2e12
    assert DENSE_MAX_CELLS // 8 <= 64 * 1024 * 1024
    assert DENSE_MAX_MULS <= 2_000_000_000_000


def test_auto_selects_dense_and_matches_index(spark):
    rows = [
        (i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7} w{i % 5} w{(i + 3) % 7}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = sorted(
        (r.a, r.b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.5).collect()
    )
    idx = sorted(
        (r.a, r.b, r.jaccard)
        for r in ngram_jaccard_pairs(
            docs, n=2, threshold=0.5, method="index"
        ).collect()
    )
    assert auto == idx and auto


def test_dense_handles_empty_and_degenerate(spark):
    # all docs below min_words -> no gram sets at all
    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = ngram_jaccard_pairs(docs, n=2, threshold=0.5, method="dense")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["a", "b", "jaccard"]


def test_dense_string_ids(spark):
    docs = spark.createDataFrame(
        [("d1", "a b c d"), ("d2", "a b c d"), ("d3", "x y z w")],
        "doc_id string, text string",
    )
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", n=2, threshold=0.5, method="dense"
    ).collect()
    assert [(r.a, r.b, r.jaccard) for r in pairs] == [("d1", "d2", 1.0)]


# --------------------------------------------------------------------------
# Asymmetric containment (decontamination)
# --------------------------------------------------------------------------


def test_containment_prefix_equals_index(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        containment_pairs,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated training text with private words"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "short overlap quick brown only here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (100, "benchmark says the quick brown fox jumps over the lazy "
                  "dog today and tomorrow"),
            (101, "another eval doc about nothing shared"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for m in ("prefix", "index"):
        got[m] = sorted(
            (r.t_id, r.e_id, round(r.containment, 9))
            for r in containment_pairs(
                train, ev, threshold=0.8, method=m
            ).collect()
        )
    assert got["prefix"] == got["index"]
    # docs 1 and 3's bigram sets are fully inside eval 100's set
    # (eval 100 extends the shared sentence, so even "dog today" is
    # covered) -> containment 1.0; doc 2 shares nothing, doc 4 shares
    # only "quick brown" (1/5 < 0.8)
    hits = {(t, e): c for t, e, c in got["prefix"]}
    assert hits == {(1, 100): 1.0, (3, 100): 1.0}


def test_containment_threshold_pigeonhole_edge(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        containment_pairs,
    )

    # 10 bigrams, exactly 8 shared -> containment 0.8 sits ON the
    # threshold; the prefix (10 - ceil(8) + 1 = 3 rarest grams) must
    # still surface the pair
    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j k")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(2, "a b c d e f g h i zz yy")], "doc_id long, text string"
    )
    out = containment_pairs(train, ev, threshold=0.8, method="prefix").collect()
    assert len(out) == 1 and abs(out[0].containment - 0.8) < 1e-9


def test_span_dedup_keeps_first_occurrence(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        dedup_spans_across_corpus,
    )

    # span unit = 3 words; "a b c" appears in doc 1 (pos 0), doc 1 again
    # (pos 1), and doc 2 (pos 0) — only doc 1 pos 0 survives
    df = spark.createDataFrame(
        [
            (1, "a b c a b c x y z"),
            (2, "a b c q r s"),
            (3, "unique words only here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_spans_kept, r.n_spans_total)
        for r in dedup_spans_across_corpus(df, span_words=3).collect()
    }
    assert out[1] == ("a b c x y z", 2, 3)
    assert out[2] == ("q r s", 1, 2)
    # 4 words -> spans "unique words only" + tail "here", both unique
    assert out[3] == ("unique words only here", 2, 2)


def test_span_dedup_fully_duplicated_doc_empties(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        dedup_spans_across_corpus,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r.clean_text for r in
           dedup_spans_across_corpus(df, span_words=3).collect()}
    assert out == {1: "a b c", 2: ""}


def test_choose_index_mid_band():
    from dataintegration_csvprovider_spark.operators.dedup import (
        index_max_work,
    )

    # the 10x scale-probe regime: 50k docs, ~9.3k uniform grams — dense
    # is muls-bound, but the exact join size (~640M) is bounded on a
    # 32-core node, so the inverted index wins (measured 33.6 s vs
    # prefix's 156.7 s)
    assert (
        _choose_jaccard_method(
            50_000, 9_310, sum_df2=640_000_000, parallelism=32
        )
        == "index"
    )
    # unbounded join size (stopword-grams on a web corpus): prefix
    assert (
        _choose_jaccard_method(
            50_000, 9_310, sum_df2=index_max_work(32) + 1, parallelism=32
        )
        == "prefix"
    )
    # the bound is CLUSTER-PROPORTIONAL: the same Σdf² that overflows 32
    # cores is comfortably inside the index regime on a 1000-executor
    # fleet (2e9 joined rows is minutes there)
    assert (
        _choose_jaccard_method(
            50_000, 9_310, sum_df2=index_max_work(32) + 1, parallelism=16_000
        )
        == "index"
    )
    # no stat provided (pre-gate callers): conservative prefix default
    assert _choose_jaccard_method(1_000_000, 50_000) == "prefix"
    # dense box still wins ahead of the mid-band gate
    assert _choose_jaccard_method(5_000, 931, sum_df2=73_000_000) == "dense"
    # skip_dense states the auto path already rejected the dense box —
    # the stats fall through to the index/prefix gate even inside the box
    assert (
        _choose_jaccard_method(
            5_000, 931, sum_df2=73_000_000, skip_dense=True
        )
        == "index"
    )
    # degenerate corpora never resolve "dense" implicitly via skip_dense
    assert _choose_jaccard_method(1, 0, sum_df2=None, skip_dense=True) == "prefix"


def test_incremental_near_dup_flags(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        incremental_near_dup_flags,
        minhash_signatures,
        _with_content,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different words about spark plans"),
         (3, "yet another unrelated corpus document entirely")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, base + " tail"),      # near-dup of corpus doc 1
         (101, "fresh novel content sharing nothing with the corpus")],
        "doc_id long, text string",
    )
    flags = incremental_near_dup_flags(corpus, batch, threshold=0.5)
    rows = {r.doc_id: r for r in flags.collect()}
    assert set(rows) == {100}
    assert rows[100].max_est_jaccard >= 0.5
    assert rows[100].n_corpus_dups == 1

    # precomputed-signature path (the production snapshot reuse) gives
    # the identical answer without touching corpus text again
    sigs = minhash_signatures(_with_content(corpus, "text", 3), "text")
    flags2 = incremental_near_dup_flags(
        corpus.limit(0), batch, threshold=0.5, corpus_sigs=sigs
    )
    assert {r.doc_id: r.n_corpus_dups for r in flags2.collect()} == {100: 1}

    # batch docs never pair with each other: two identical batch docs
    # with no corpus twin stay unflagged
    twin_batch = spark.createDataFrame(
        [(200, "twin text unique to this batch only"),
         (201, "twin text unique to this batch only")],
        "doc_id long, text string",
    )
    assert incremental_near_dup_flags(corpus, twin_batch).count() == 0


def test_ngram_jaccard_cross_pairs(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        ngram_jaccard_cross_pairs,
        ngram_jaccard_pairs,
    )

    left = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w q")],
        "doc_id long, text string",
    )
    right = spark.createDataFrame(
        [(10, "a b c d f"), (11, "totally different words here now")],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_cross_pairs(
            left, right, n=2, threshold=0.3
        ).collect()
    }
    # bigrams of doc1: {ab,bc,cd,de}; doc10: {ab,bc,cd,df} -> J = 3/5
    assert set(got) == {(1, 10)}
    assert abs(got[(1, 10)] - 0.6) < 1e-12
    # cross operator never pairs within one corpus: the self-join op on
    # the union finds the same cross pair, and the cross op finds no
    # (left,left) or (right,right) pairs by construction
    union_pairs = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(
            left.unionByName(right), n=2, threshold=0.3
        ).collect()
    }
    assert (1, 10) in union_pairs


# -- exact substring dedup (ExactSubstr / suffix-array family) -------------


def _essd_rows(spark, docs, **kw):
    from dataintegration_csvprovider_spark.operators.dedup import (
        exact_substring_dedup,
    )

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r["doc_id"]: r.asDict()
        for r in exact_substring_dedup(df, **kw).collect()
    }


def test_exact_substring_cross_doc_removal(spark):
    # the 5-token phrase appears in both docs: ALL copies are removed
    # (ExactSubstr removes every occurrence, originals included)
    phrase = "a b c d e"
    docs = [
        (1, f"x1 x2 {phrase} y1 y2"),
        (2, f"z1 {phrase} z2 z3 z4"),
    ]
    out = _essd_rows(spark, docs, min_tokens=5)
    assert out[1]["n_spans"] == 1 and out[1]["n_dup_tokens"] == 5
    assert out[2]["n_spans"] == 1 and out[2]["n_dup_tokens"] == 5
    assert out[1]["clean_text"] == "x1 x2 y1 y2"
    assert out[2]["clean_text"] == "z1 z2 z3 z4"


def test_exact_substring_long_duplicate_merges_windows(spark):
    # a 7-token duplicate with L=5 marks windows at pos 0,1,2 of the
    # span — the island merge must fuse them into ONE 7-token span
    phrase = "p q r s t u v"
    docs = [(1, f"{phrase} tail1 tail2"), (2, f"head {phrase}")]
    out = _essd_rows(spark, docs, min_tokens=5)
    assert out[1]["n_spans"] == 1 and out[1]["n_dup_tokens"] == 7
    assert out[1]["clean_text"] == "tail1 tail2"
    assert out[2]["clean_text"] == "head"


def test_exact_substring_within_doc_duplicate(spark):
    # duplication WITHIN one doc counts (count>=2 over occurrences)
    docs = [(1, "m n o p m n o p xx")]
    out = _essd_rows(spark, docs, min_tokens=4)
    # the two marked windows [0,3] and [4,7] touch but don't overlap, so
    # they stay two spans (the island merge fuses OVERLAPS only — the
    # removed token set is identical either way, and the oracle agrees)
    assert out[1]["n_spans"] == 2
    assert out[1]["n_dup_tokens"] == 8
    assert out[1]["clean_text"] == "xx"


def test_exact_substring_whole_doc_removed_and_short_docs(spark):
    docs = [
        (1, "dup dup2 dup3 dup4 dup5"),
        (2, "dup dup2 dup3 dup4 dup5"),
        (3, "short doc"),  # shorter than L: no windows, untouched
    ]
    out = _essd_rows(spark, docs, min_tokens=5)
    assert out[1]["clean_text"] == "" and out[1]["n_dup_tokens"] == 5
    assert out[2]["clean_text"] == ""
    assert out[3]["n_spans"] == 0
    assert out[3]["clean_text"] == "short doc"


def test_exact_substring_disjoint_spans(spark):
    # two separated duplicated regions stay two spans
    docs = [
        (1, "a1 a2 a3 a4 mid1 mid2 mid3 b1 b2 b3 b4"),
        (2, "a1 a2 a3 a4 q1 q2 q3 q4 b1 b2 b3 b4"),
    ]
    out = _essd_rows(spark, docs, min_tokens=4)
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_tokens"] == 8
    assert out[1]["clean_text"] == "mid1 mid2 mid3"


def test_exact_substring_hash_grams_equivalent(spark):
    # the scale path (xxhash64 gram keys) must agree with exact text
    # keys on a real sample
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    from dataintegration_csvprovider_spark.operators.dedup import (
        exact_substring_dedup,
    )

    exact = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_dedup(docs, min_tokens=8).collect()
    }
    hashed = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_dedup(
            docs, min_tokens=8, hash_grams=True
        ).collect()
    }
    assert exact == hashed


def test_exact_substring_decontaminate(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        exact_substring_decontaminate,
    )

    leak = "e1 e2 e3 e4 e5"
    train = spark.createDataFrame(
        [
            (1, f"t1 t2 {leak} t3"),   # contains the eval phrase
            (2, "clean doc with no overlap at all"),
            (3, "tiny"),               # shorter than L
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, f"header {leak} footer")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_decontaminate(
            train, ev, min_tokens=5
        ).collect()
    }
    assert out[1]["n_contaminated_tokens"] == 5
    assert out[1]["clean_text"] == "t1 t2 t3"
    assert abs(out[1]["contamination"] - 5 / 8) < 1e-12
    assert out[2]["n_contaminated_tokens"] == 0
    assert out[2]["clean_text"] == "clean doc with no overlap at all"
    assert out[3]["n_spans"] == 0 and out[3]["contamination"] == 0.0
    # eval docs themselves are NOT in the output (train-side scrub)
    assert set(out) == {1, 2, 3}


def test_plan_lsh_bands_scurve_planner():
    import pytest

    from dataintegration_csvprovider_spark.operators.dedup import (
        plan_lsh_bands,
    )

    b5, r5 = plan_lsh_bands(0.5, 64)
    b8, r8 = plan_lsh_bands(0.8, 64)
    assert b5 * r5 <= 64 and b8 * r8 <= 64
    # higher threshold -> steeper curve -> more rows per band
    assert r8 > r5
    # the planned geometry's S-curve midpoint sits near the threshold:
    # P(threshold) between 0.2 and 0.8 for the chosen (b, r)
    for t, (b, r) in ((0.5, (b5, r5)), (0.8, (b8, r8))):
        p = 1.0 - (1.0 - t**r) ** b
        assert 0.2 < p < 0.85, (t, b, r, p)
    with pytest.raises(ValueError):
        plan_lsh_bands(0.0)
    with pytest.raises(ValueError):
        plan_lsh_bands(0.5, 1)


def test_soft_dedup_weights(spark):
    from dataintegration_csvprovider_spark.operators.dedup import (
        soft_dedup_weights,
    )

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # cluster {1,2,3}, cluster {4,5}, singleton {6}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "a long, b long"
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(docs, pairs).collect()}
    assert len(out) == 6
    assert out[1]["n_dups"] == 3 and abs(out[1]["weight"] - 1 / 3) < 1e-15
    assert out[2]["component"] == out[3]["component"] == out[1]["component"]
    assert out[4]["n_dups"] == 2 and out[5]["weight"] == 0.5
    assert out[6]["n_dups"] == 1 and out[6]["weight"] == 1.0
    # effective corpus size: 1 + 1 + 1 = 3 clusters
    assert abs(sum(r["weight"] for r in out.values()) - 3.0) < 1e-12
