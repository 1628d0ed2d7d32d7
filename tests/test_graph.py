"""BFS convergence contract: exact levels, loud truncation."""

from __future__ import annotations

import pytest

from dataintegration_csvprovider_spark.operators.graph import bfs_levels


def _path_graph(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )


def _sources(spark):
    return spark.createDataFrame([(0,)], "node long")


def test_bfs_levels_exact_on_path(spark):
    edges = _path_graph(spark, 6)
    out = bfs_levels(edges, _sources(spark))
    got = {(r["node"], r["dist"]) for r in out.collect()}
    assert got == {(i, i) for i in range(6)}


def test_bfs_levels_raises_when_truncated(spark):
    edges = _path_graph(spark, 6)
    with pytest.raises(RuntimeError, match="did not converge"):
        bfs_levels(edges, _sources(spark), max_depth=2)


def test_bfs_levels_allow_partial_is_depth_bounded_prefix(spark):
    edges = _path_graph(spark, 6)
    out = bfs_levels(edges, _sources(spark), max_depth=2, allow_partial=True)
    got = {(r["node"], r["dist"]) for r in out.collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}


def test_bfs_levels_no_raise_at_exact_eccentricity(spark):
    # eccentricity of the 6-node path from node 0 is 5: the loop ends by
    # range exhaustion with a non-empty final frontier that has nothing
    # new to add — the extra expansion probe must not raise.
    edges = _path_graph(spark, 6)
    out = bfs_levels(edges, _sources(spark), max_depth=5)
    assert out.count() == 6


def test_personalized_pagerank_concentrates_on_seeds(spark):
    import pytest

    from dataintegration_csvprovider_spark.operators.graph import (
        pagerank,
        personalized_pagerank,
    )

    # ring 0->1->2->...->9->0 plus chords into node 0
    ring = [(i, (i + 1) % 10) for i in range(10)]
    chords = [(3, 0), (6, 0)]
    edges = spark.createDataFrame(ring + chords, "src long, dst long")
    ppr = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds=[0], iterations=12).collect()
    }
    pr = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=12).collect()
    }
    # seed proximity: the seed and its successor outrank distant nodes
    assert ppr[0] > ppr[5]
    assert ppr[1] > ppr[5]
    # personalization actually changes the ordering vs global PR
    assert ppr[0] / sum(ppr.values()) > pr[0] / sum(pr.values())
    with pytest.raises(ValueError):
        personalized_pagerank(edges, seeds=[])


def test_pagerank_nano_source_only_node_convention(spark):
    from dataintegration_csvprovider_spark.operators.graph import (
        pagerank_nano,
    )

    # node 99 has out-edges only (no in-links); the rest form a cycle
    # with every node receiving contributions
    cyc = [(i, (i + 1) % 4) for i in range(4)]
    edges = spark.createDataFrame(cyc + [(99, 0)], "src long, dst long")

    # default convention: 99 drops out of the rank vector after iter 1
    default = {
        r["node"]: r["rank_n"]
        for r in pagerank_nano(edges, iterations=6).collect()
    }
    assert 99 not in default
    assert set(default) == {0, 1, 2, 3}

    # retain_all_nodes: 99 stays, floored at the bare teleport term
    n = 5
    teleport_n = ((100 - 85) * 10_000_000) // n
    retained = {
        r["node"]: r["rank_n"]
        for r in pagerank_nano(
            edges, iterations=6, retain_all_nodes=True
        ).collect()
    }
    assert set(retained) == {0, 1, 2, 3, 99}
    assert retained[99] == teleport_n
    # retained mass dominates the dropping variant's (99's teleport mass
    # keeps feeding node 0 instead of vanishing) and stays under 1e9
    # (integer div truncation only ever loses mass)
    assert sum(default.values()) < sum(retained.values()) <= 1_000_000_000
    # a warm seed on the source-only node survives the first iteration's
    # consumption under retain_all_nodes
    seed = spark.createDataFrame(
        [(99, 500_000_000)], "node long, rank_n long"
    )
    warm = {
        r["node"]: r["rank_n"]
        for r in pagerank_nano(
            edges, iterations=2, start_ranks=seed, retain_all_nodes=True
        ).collect()
    }
    assert warm[99] == teleport_n
