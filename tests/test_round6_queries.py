"""Property tests for the round-6 query surface — invariants the SQL
oracles can't express as naturally (cross-row conservation laws,
bounds), run at sf0.001."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_bm25_rank_sequence_and_positive_scores(spark, qs):
    rows = qs["q_bm25_topk"](spark, SF).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_rank_fusion_bounds(spark, qs):
    rows = qs["q_rank_fusion"](spark, SF).collect()
    # rrf of two rankings with k=60: each term <= 1/61, so sum <= 2/61
    for r in rows:
        assert 0 < r.rrf <= 2 / 61 + 1e-12


def test_lexical_diversity_range(spark, qs):
    rows = qs["q_lexical_diversity"](spark, SF).collect()
    for r in rows:
        # gini in [0, 1 - 1/dl]; all-distinct docs hit the max exactly
        assert 0.0 <= r.gini <= 1.0 - 1.0 / r.dl + 1e-12
        if r.n_types == r.dl:
            assert abs(r.gini - (1.0 - 1.0 / r.dl)) < 1e-12


def test_upsample_epochs_exact_totals(spark, qs):
    out = qs["q_upsample_epochs"](spark, SF)
    per_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 150 for n in per_lang.values()), per_lang
    # epoch indices are dense from 0 per doc
    bad = (
        out.groupBy("doc_id", "lang")
        .agg(F.count("*").alias("k"), F.max("epoch").alias("mx"))
        .filter(F.col("mx") != F.col("k") - 1)
        .count()
    )
    assert bad == 0


def test_interleave_positions_in_unit_interval_and_monotone(spark, qs):
    rows = qs["q_interleave_order"](spark, SF).collect()
    assert len(rows) == 100
    for r in rows:
        assert 0.0 < r.pos < 1.0
    per_source = {}
    for r in sorted(rows, key=lambda r: (r.pos, r.source)):
        last = per_source.get(r.source, 0)
        assert r.rn == last + 1  # each source appears in rank order
        per_source[r.source] = r.rn


def test_chi2_drift_nonnegative_and_zero_on_self(spark, qs):
    row = qs["q_drift_chi2"](spark, SF).collect()[0]
    assert row.chi2 >= 0.0
    from dataintegration_csvprovider_spark.queries.profiling import (
        chi2_drift_docs,
    )
    from dataintegration_csvprovider_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    self_row = chi2_drift_docs(docs, "src1", "src1").collect()[0]
    assert self_row.chi2 == 0.0


def test_position_attribution_conserves_revenue(spark, qs):
    from dataintegration_csvprovider_spark.catalog import load_table

    out = qs["q_position_attribution"](spark, SF)
    credited = out.agg(
        F.sum("attributed_revenue").alias("s")
    ).collect()[0]["s"]
    ev = load_table(spark, SF, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "ts"
    )
    touched = (
        purchases.join(
            touches,
            (F.col("p_user_id") == F.col("user_id"))
            & (F.col("ts") <= F.col("p_ts"))
            & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
            "left_semi",
        )
        .agg(F.sum("revenue").alias("s"))
        .collect()[0]["s"]
    )
    # per-purchase weights sum to exactly 1, so credited revenue equals
    # the revenue of purchases with at least one touch (6-dp reporting)
    assert abs(credited - touched) < 1e-3


def test_seasonal_anomaly_flags_are_extreme(spark, qs):
    rows = qs["q_seasonal_anomaly"](spark, SF).collect()
    for r in rows:
        assert abs(r.z) >= 2.0
        assert r.n_obs >= 1


def test_curation_pipeline_full_manifest_laws(spark, qs):
    rows = qs["q_curation_pipeline_full"](spark, SF).collect()
    assert rows, "pipeline produced no shards"
    # contiguous non-overlapping doc_id ranges, every shard non-empty
    spans = sorted((r.first_doc, r.last_doc, r.n_docs) for r in rows)
    for (a1, b1, n1), (a2, _b2, _n2) in zip(spans, spans[1:]):
        assert b1 < a2
    assert sum(n for _, _, n in spans) <= 200  # the apportionment budget


def test_round6_cores_tolerate_empty_inputs(spark):
    """Registry convention: empty sources must yield empty results, not
    crashes (bm25 previously divided by zero computing avgdl)."""
    from dataintegration_csvprovider_spark.queries.profiling import (
        chi2_drift_docs,
        hellinger_drift_docs,
    )
    from dataintegration_csvprovider_spark.queries.textmining import (
        _bm25_scores_docs,
    )

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert _bm25_scores_docs(docs).count() == 0
    assert chi2_drift_docs(docs).count() == 0
    assert hellinger_drift_docs(docs).count() == 0


def test_t_closeness_bounds_and_max_echo(spark, qs):
    rows = qs["q_t_closeness"](spark, SF).collect()
    assert rows, "no class attained the max => impossible"
    t_max = rows[0].t_max
    for r in rows:
        # ordered-EMD is a normalized mean |CDF gap|: always in [0, 1]
        assert 0.0 <= r.t_emd <= 1.0
        assert r.t_max == t_max
        assert r.t_emd <= t_max
        assert r.violates_t02 == (r.t_emd > 0.2)
    assert any(r.t_emd == t_max for r in rows)


def test_drift_hellinger_bounds_and_self_identity(spark, qs):
    r = qs["q_drift_hellinger"](spark, SF).collect()[0]
    assert 0.0 <= r.bhattacharyya <= 1.0
    assert 0.0 <= r.hellinger <= 1.0
    assert r.n_terms >= max(1, r.n1 > 0, r.n2 > 0)
    # self-drift sanity: comparing a slice against itself gives BC = 1,
    # H = 0 exactly (per-term sqrt(c*c) = c sums to n; sqrt(n*n) = n)
    from dataintegration_csvprovider_spark.catalog import load_table
    from dataintegration_csvprovider_spark.queries.profiling import (
        hellinger_drift_docs,
    )

    docs = load_table(spark, SF, "documents").limit(50)
    both = docs.withColumn("source", F.lit("src1")).unionByName(
        docs.withColumn("source", F.lit("src2"))
    )
    s = hellinger_drift_docs(both).collect()[0]
    assert s.bhattacharyya == 1.0
    assert s.hellinger == 0.0


def test_chunk_sliding_reconstruction_and_geometry(spark, qs):
    from dataintegration_csvprovider_spark.catalog import load_table

    out = qs["q_chunk_sliding"](spark, SF)
    rows = out.collect()
    docs = {
        r.doc_id: [t for t in r.text.split(" ") if t != ""]
        for r in load_table(spark, SF, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in docs.items():
        if not toks:
            assert doc_id not in by_doc
            continue
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        # geometry: starts advance by the stride, idx dense from 0
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.chunk_start == i * 24
            want = toks[c.chunk_start : c.chunk_start + 32]
            assert c.chunk_text == " ".join(want)
            assert c.chunk_n_tokens == len(want)
        # coverage: every token index falls inside >= 1 chunk
        covered = set()
        for c in chunks:
            covered.update(range(c.chunk_start, c.chunk_start + c.chunk_n_tokens))
        assert covered == set(range(len(toks)))


def test_sliding_chunks_empty_and_validation(spark):
    from dataintegration_csvprovider_spark.operators.textstats import (
        sliding_token_chunks,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert sliding_token_chunks(empty).count() == 0
    blank = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    assert sliding_token_chunks(blank).count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        sliding_token_chunks(empty, window=0)


def test_bloom_semijoin_contract(spark, qs):
    r = qs["q_bloom_semijoin"](spark, SF).collect()[0]
    # the load-bearing Bloom law: NEVER a false negative, so the bloom
    # pass-count bounds the exact semi-join from above
    assert r.n_false_neg == 0
    assert r.n_exact <= r.n_bloom_pass <= r.n_fact
    assert 0.0 < r.selectivity <= 1.0


def test_bloom_flag_operator_laws(spark):
    from dataintegration_csvprovider_spark.operators.scale import (
        bloom_flag,
        bloom_semijoin,
    )

    keys = spark.range(0, 200).selectExpr("id * 7 AS k")  # members
    fact = spark.range(0, 3000).selectExpr("id AS fk")
    flagged = bloom_flag(fact, keys, "fk", "k", m_bits=4096)
    rows = {r.fk: r.bloom_pass for r in flagged.collect()}
    members = {i * 7 for i in range(200)}
    # no false negatives ever
    assert all(rows[m] for m in members if m < 3000)
    # with 600 bits set of 4096 the filter must reject most non-members
    fp = sum(1 for k, p in rows.items() if p and k not in members)
    non_members = 3000 - len([m for m in members if m < 3000])
    assert fp / non_members < 0.5
    # the composed semi-join is EXACT (false positives removed)
    got = {r.fk for r in bloom_semijoin(fact, keys, "fk", "k", m_bits=4096).collect()}
    assert got == {m for m in members if m < 3000}
    # validation
    import pytest as _pt

    with _pt.raises(ValueError):
        bloom_flag(fact, keys, "fk", "k", m_bits=100)


def test_stream_bloom_merge_equals_batch(spark, qs):
    """Bloom merge law: OR-merged per-micro-batch filters must be
    VALUE-equal to the batch filter, so the two audit rows match."""
    batch = qs["q_bloom_semijoin"](spark, SF).collect()[0].asDict()
    streamed = qs["q_stream_bloom_filter"](spark, SF).collect()[0].asDict()
    assert streamed == batch
    assert streamed["n_false_neg"] == 0


def test_weighted_median_is_true_weighted_median(spark, qs):
    from dataintegration_csvprovider_spark.catalog import load_table

    got = {r.lang: r for r in qs["q_weighted_median"](spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    per_lang: dict[str, list] = {}
    for d in docs:
        w = len([t for t in d.text.split(" ") if t])
        per_lang.setdefault(d.lang, []).append((d.n_chars, d.doc_id, w))
    for lang, rows in per_lang.items():
        rows.sort()
        total = sum(w for _, _, w in rows)
        cw = 0
        for v, _, w in rows:
            cw += w
            if 2 * cw >= total:
                expect = v
                break
        r = got[lang]
        assert r.wmedian == expect
        assert r.total_w == total
        assert r.n_docs == len(rows)


def test_rater_agreement_identities(spark, qs):
    r = qs["q_rater_agreement"](spark, SF).collect()[0]
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
    assert -1.0 <= r.kappa <= 1.0
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
    # kappa sign law: agreement above chance iff po > pe
    assert (r.kappa > 0) == (r.po > r.pe)


def test_benford_audit_fractions_sum_to_one(spark, qs):
    rows = qs["q_benford_audit"](spark, SF).collect()
    assert {r.digit for r in rows} <= {str(d) for d in range(1, 10)}
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-6
    import math

    for r in rows:
        assert abs(r.benford_frac - math.log10(1 + 1 / int(r.digit))) < 1e-15
        assert r.flagged == (r.abs_dev > 0.02)


def test_lorenz_gini_matches_bruteforce(spark, qs):
    from dataintegration_csvprovider_spark.catalog import load_table

    got = {r.c_mktsegment: r for r in qs["q_lorenz_gini"](spark, SF).collect()}
    rows = load_table(spark, SF, "customer").collect()
    per_seg: dict[str, list] = {}
    for c in rows:
        if c.c_acctbal > 0:
            per_seg.setdefault(c.c_mktsegment, []).append(
                (c.c_acctbal, c.c_custkey)
            )
    for seg, xs in per_seg.items():
        xs.sort()
        n = len(xs)
        sx = sum(x for x, _ in xs)
        six = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        expect = (2 * six - (n + 1) * sx) / (n * sx)
        r = got[seg]
        assert r.n == n
        assert abs(r.gini - expect) < 1e-6
        assert 0.0 <= r.gini < 1.0


def test_markov_transitions_rows_are_distributions(spark, qs):
    rows = qs["q_markov_transitions"](spark, SF).collect()
    assert rows
    per_prev: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r.prob <= 1.0
        assert r.n <= r.row_total
        per_prev[r.prev_type] = per_prev.get(r.prev_type, 0.0) + r.prob
    # each row of the matrix is a probability distribution
    for prev, s in per_prev.items():
        assert abs(s - 1.0) < 1e-6, (prev, s)


def test_burstiness_bounds_and_moment_parity(spark, qs):
    import statistics

    from dataintegration_csvprovider_spark.catalog import load_table

    got = {r.user_id: r for r in qs["q_burstiness"](spark, SF).collect()}
    ev = sorted(
        (
            (r.user_id, r.ts, r.event_id)
            for r in load_table(spark, SF, "events")
            .filter(F.col("user_id") < 30)
            .collect()
        )
    )
    per_user: dict[int, list] = {}
    for uid, ts, eid in ev:
        per_user.setdefault(uid, []).append(ts)
    for uid, tss in per_user.items():
        gaps = [
            (b - a).total_seconds() * 1e6
            for a, b in zip(tss, tss[1:])
        ]
        if len(gaps) < 2:
            assert uid not in got
            continue
        r = got[uid]
        assert -1.0 <= r.burstiness <= 1.0
        assert r.n_gaps == len(gaps)
        assert abs(r.mean_gap_us - statistics.mean(gaps)) < 0.5
        assert abs(r.std_gap_us - statistics.pstdev(gaps)) < 1.0
