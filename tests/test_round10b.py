"""Second-sitting round-10 law pins: matryoshka truncation invariants
and the threshold sweep's confusion-table algebra."""


def test_matryoshka_invariants(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_matryoshka_truncation,
    )

    rows = q_matryoshka_truncation(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        # overlap@10 is a size of an intersection of two 10-sets
        assert 0 <= r.overlap_at_10 <= 10
        # widening the shortlist can only help: top-10 hits inside the
        # truncated top-100 dominate those inside the truncated top-10
        assert r.recall10_at_100 >= r.overlap_at_10
        assert r.recall10_at_100 <= 10
        # cosines are cosines
        assert -1.0 <= r.top1_full_cos <= 1.0
        assert -1.0 <= r.top1_trunc_cos <= 1.0


def test_threshold_sweep_confusion_algebra(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.llm import (
        q_threshold_sweep,
    )

    rows = sorted(
        q_threshold_sweep(spark, sf_dir).collect(), key=lambda r: r.threshold
    )
    assert len(rows) == 9
    # positives are threshold-independent: tp + fn is the label-1 count
    positives = {r.tp + r.fn for r in rows}
    assert len(positives) == 1
    # raising the threshold can only shrink the predicted-positive set
    for lo, hi in zip(rows, rows[1:]):
        assert hi.tp <= lo.tp
        assert hi.fp <= lo.fp
    # exactly one operating point is flagged best, and its F1 is maximal
    best = [r for r in rows if r.is_best]
    assert len(best) == 1
    assert best[0].f1 == max(r.f1 for r in rows)
    for r in rows:
        denom = 2 * r.tp + r.fp + r.fn
        assert denom > 0
        assert abs(r.f1 - (2 * r.tp) / denom) < 1e-12


def test_pagerank_incremental_laws(spark, sf_dir):
    from dataintegration_csvprovider_spark.queries.graphops import (
        q_pagerank_incremental,
    )

    rows = q_pagerank_incremental(spark, sf_dir).collect()
    assert rows
    l1w = {r.warm_l1_nano for r in rows}
    l1c = {r.cold3_l1_nano for r in rows}
    assert len(l1w) == len(l1c) == 1  # global scalars, identical per row
    # the warm restart must beat equal work from uniform on this fixture
    assert all(r.warm_closer for r in rows)
    assert l1w.pop() < l1c.pop()
    for r in rows:
        assert 0.0 <= r.warm_rank <= 1.0
        assert 0.0 <= r.cold_rank <= 1.0
    # hub nodes (0-6) concentrate rank: every hub outranks the median
    ranks = sorted(r.cold_rank for r in rows)
    median = ranks[len(ranks) // 2]
    hubs = [r.cold_rank for r in rows if r.node < 7]
    assert hubs and all(h > median for h in hubs)
