"""Connected components via alternating large-star / small-star.

The missing half of near-dup dedup: pair emitters (minhash / simhash /
n-gram Jaccard, operators/dedup.py) produce an *edge list*; to keep one
representative per duplicate *cluster* you need the transitive closure.
The reference has no graph surface (CSV row pump only,
CSVProvider.cs:563-601); this is part of the engine's §2.10 LLM-pipeline
extension.

Algorithm: alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014). Each round
is two keyed shuffles; the edge set contracts toward a star per
component in O(log n) rounds — unlike naive min-label propagation,
whose round count is the graph *diameter* (a 1M-node chain would need
1M rounds; large-star/small-star needs ~20). That difference is the
whole 100 TB story: dedup graphs at web scale have long chains through
mutual near-dups.

Physical shape per round: neighborhood minima come from a window `min`
over the node partition — no `collect_list`, so a hub node with 10M
neighbors never materializes its neighbor array in one task. Lineage is
truncated with an eager `localCheckpoint` every round (the edge set
shrinks monotonically per round, and iterative-join lineage otherwise
compounds planning cost — same trade measured for PageRank,
operators/graph.py). Convergence is detected by an order-insensitive
edge-set checksum (count + decimal sum of xxhash64), one tiny action
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonicalize to (hi, lo), drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to the
    minimum of u's closed neighborhood.

    Round-13 optimization (guide §2.4 remove shuffles outright): the
    output needs NO canon pass — every emitted edge is already
    canonical and loop-free (v > u >= m, so hi=v > lo=m), and
    duplicate rows are harmless to the following small-star (its
    neighborhood min is duplicate-insensitive and its own canon
    dedups before the checksum). Dropping the intermediate distinct
    removes one full shuffle per contraction round; the per-round edge
    SET (checksum, convergence, labels) is unchanged."""
    d = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        d.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect u and all its smaller neighbors to the
    minimum of those neighbors."""
    w = Window.partitionBy("hi")
    withm = edges.withColumn("m", F.min("lo").over(w))
    return _canon(
        withm.select(F.col("lo").alias("src"), F.col("m").alias("dst")).unionAll(
            withm.select(F.col("hi").alias("src"), F.col("m").alias("dst"))
        )
    )


def _checksum(edges: DataFrame) -> tuple[int, object]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node appearing in ``edges`` with its component's
    minimum node id. Returns (node, component); nodes absent from the
    edge list are the caller's to default (they are their own
    singleton component).
    """
    return connected_components_stats(edges, src, dst, max_iter)[0]


def connected_components_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> tuple[DataFrame, int]:
    """:func:`connected_components` plus the observed ROUND COUNT — the
    quantity the O(log n) convergence claim stands on. A round is one
    large-star + small-star contraction; the count is known eagerly
    (each round checkpoints and checksums), so callers can pin it in a
    gate: on a skewed hub graph of n nodes the bound is ~log2(n) + a
    small constant, vs n rounds for naive min-label propagation on a
    chain. Returns (labels, n_rounds) where n_rounds counts contraction
    rounds EXECUTED including the fixpoint-confirming one."""
    # r13 (guide §1.2 — one action per round, not two): the checkpoint
    # is LAZY; the checksum action both materializes the round's edge
    # set and truncates its lineage in the same job. Eager + separate
    # checksum was two jobs per contraction round for the same work.
    e = _canon(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=False)
    sig = _checksum(e)
    rounds = 0
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        new_sig = _checksum(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixpoint edge set is a star per component: hi -> component min
    labels = (
        e.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
        .unionAll(
            e.select(F.col("lo").alias("node"), F.col("lo").alias("component"))
        )
        .distinct()
    )
    return labels, rounds


def incremental_components(
    labels: DataFrame | None,
    batch_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """One incremental connected-components maintenance step: fold a
    BATCH of new edges into an existing min-id label table (round 11 —
    the dedup-components maintenance story for a growing corpus).

    The global contraction never re-runs: batch endpoints are relabeled
    through the current labels (two left joins against the label
    table), large-star/small-star runs only on the CONTRACTED batch
    graph — whose node set is component ids + genuinely new nodes, size
    bounded by the batch, not the corpus — and the resulting
    component-of-component mapping composes back over the label table
    with one keyed join. Composition preserves the global min-id
    convention: existing component ids ARE their groups' minimum node
    ids, new nodes enter as their own ids, so the contracted CC's
    min-reachable label is the merged group's true global minimum.

    ``labels``: (node, component) or None before the first batch.
    Returns the new (node, component) covering every previously
    labeled node plus all batch endpoints. Per-batch cost: O(batch)
    contraction + two label-table-keyed shuffles — the work a 100 TB
    corpus pays for a daily edge delta, instead of re-clustering the
    world.
    """
    e = batch_edges.select(
        F.col(src).cast("bigint").alias("a"),
        F.col(dst).cast("bigint").alias("b"),
    ).distinct()
    batch_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    if labels is None:
        base_labels = batch_nodes.select(
            "node", F.col("node").alias("component")
        )
        rel = e
    else:
        la = labels.select(
            F.col("node").alias("a"), F.col("component").alias("ca")
        )
        lb = labels.select(
            F.col("node").alias("b"), F.col("component").alias("cb")
        )
        rel = (
            e.join(la, "a", "left")
            .join(lb, "b", "left")
            .select(
                F.coalesce(F.col("ca"), F.col("a")).alias("a"),
                F.coalesce(F.col("cb"), F.col("b")).alias("b"),
            )
        )
        new_nodes = batch_nodes.join(
            labels.select("node"), "node", "left_anti"
        )
        base_labels = labels.unionByName(
            new_nodes.select("node", F.col("node").alias("component"))
        )
    contracted = rel.filter(F.col("a") != F.col("b")).distinct()
    if contracted.limit(1).count() == 0:
        return base_labels
    mapping = connected_components(
        contracted, src="a", dst="b", max_iter=max_iter
    ).select(
        F.col("node").alias("old_c"), F.col("component").alias("new_c")
    )
    return base_labels.join(
        mapping, base_labels.component == mapping.old_c, "left"
    ).select(
        "node",
        F.coalesce(F.col("new_c"), F.col("component")).alias("component"),
    )
