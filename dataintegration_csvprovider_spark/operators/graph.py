"""Graph operators over edge DataFrames: PageRank (iterative joins).

Connected components live in ``operators/dedup.py`` (pointer-jumping for
the dedup pipeline); this module adds rank propagation. PageRank is the
canonical iterative-join workload: each iteration is

    contribution = rank / outdegree, shipped along edges (join on src)
    new rank     = teleport + damping * sum(contributions per dst)

Scale shape: one shuffle per iteration (the groupBy on dst; the edge join
shuffles on src, and both reuse the same keys across iterations so AQE
sees stable partitioning). Lineage is truncated every few iterations with
a ``localCheckpoint`` — without it the plan doubles per iteration and
the 10th job replans 2^10 joins (the classic iterative-Spark trap;
checkpointing is the fix SURVEY.md §7 calls out for iterative dedup too).
The checkpoints are LAZY (r13, guide §1.2): each flattens the logical
plan immediately, but materialization rides the consumer's one action
instead of paying a separate job per truncation point.

Determinism (so a SQL oracle can replay it bit-for-bit): per-edge
contributions are computed in IEEE double (identical across engines),
then cast to DECIMAL(18,9) so the per-node SUM is order-independent; the
damped update returns to double via one deterministic cast. Teleport and
init constants are built from the same double ops (0.15/n, 1.0/n) on both
sides rather than decimal literals, which would round differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over distinct edges.

    Requires every node to appear as a source (no dangling nodes) — the
    caller's edge construction must guarantee it, or dangling mass is
    silently dropped (standard simplified PR). Returns (node, rank).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # graph cardinality: driver-side metadata scalar
    init = 1.0 / n
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(init))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e.src == F.col("node"))
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).cast("decimal(18,9)").alias("c"),
            )
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(teleport) + F.lit(damping) * F.sum("c").cast("double")
            ).alias("rank")
        )
        # truncate lineage every few iterations: unchecked, analysis cost
        # compounds with plan depth; checkpointing every step would pay a
        # full materialization job per iteration instead
        if (i + 1) % 3 == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_nano(
    edges: DataFrame,
    iterations: int = 10,
    damping_pct: int = 85,
    start_ranks: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    retain_all_nodes: bool = False,
) -> DataFrame:
    """Fixed-point-arithmetic PageRank: ranks held as INTEGER nano-units
    (1 rank == 1e9), every step pure integer ops — ``rank_n div deg``
    contributions, ``(damping_pct * sum) div 100`` update, integer
    teleport — so there is NO rounding mode anywhere and any engine
    replays the trajectory bit-for-bit. The double form (:func:`pagerank`)
    divides a 9-decimal value by the out-degree, which lands on exact
    decimal midpoints whenever the degree is a small power of two and
    the 9th digit is odd — Spark (HALF_UP) and DuckDB (half-even) then
    disagree by one nano-unit (measured on a 1000-node hub graph).
    Truncation loses <1 nano-unit of mass per node per step — bounded,
    deterministic, and identical everywhere.

    Node-set contract (same simplified-PR convention as :func:`pagerank`,
    stated here because the warm-start path makes it easy to trip over):
    the node set is derived from edge SOURCES, and each iteration rebuilds
    ranks from received contributions, so a node with out-edges but no
    in-links appears in iteration 1's input, ships its mass, and then
    drops out of the rank vector — its teleport mass vanishes and a
    ``start_ranks`` entry for it is consumed exactly once. Callers whose
    graphs guarantee every node an in-edge (all registry fixtures do) are
    unaffected. For general graphs pass ``retain_all_nodes=True``: after
    every iteration the source-derived node set is left-joined back and
    contribution-less nodes are floored at the bare integer teleport term
    (exactly what the update computes when ``sum(c)`` is empty), so no
    node — and no warm seed — is ever dropped.

    ``start_ranks`` (node, rank_n) warm-starts the iteration — the
    incremental-maintenance form; absent nodes initialize at
    ``1e9 div n``. Returns (node, rank_n).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    init_n = 1_000_000_000 // n
    teleport_n = ((100 - damping_pct) * 10_000_000) // n
    if start_ranks is None:
        ranks = nodes.withColumn("rank_n", F.lit(init_n).cast("bigint"))
    else:
        ranks = nodes.join(
            start_ranks.select("node", F.col("rank_n").alias("r0")),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce(F.col("r0"), F.lit(init_n)).cast("bigint").alias(
                "rank_n"
            ),
        )
    ranks = ranks.localCheckpoint(eager=False)
    for i in range(iterations):
        contribs = (
            e.join(ranks, e.src == F.col("node"))
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_n div deg").alias("c"),
            )
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(teleport_n)
                + F.expr(f"({damping_pct} * sum(c)) div 100")
            )
            .cast("bigint")
            .alias("rank_n")
        )
        if retain_all_nodes:
            # re-seat in-degree-0 nodes at the bare teleport floor — the
            # value the damped update yields for an empty contribution
            # sum — so the node set is stable across iterations
            ranks = nodes.join(ranks, "node", "left").select(
                "node",
                F.coalesce(F.col("rank_n"), F.lit(teleport_n))
                .cast("bigint")
                .alias("rank_n"),
            )
        if (i + 1) % 3 == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 20,
    allow_partial: bool = False,
) -> DataFrame:
    """Multi-source BFS over an undirected edge list: (node, dist) with
    the hop count from the nearest source, unreachable nodes absent.

    Frontier expansion, one equi-join shuffle per level; visited set
    grows monotonically and the frontier is anti-joined against it so a
    node is settled exactly once (BFS guarantees first touch = shortest
    distance). Frontiers are lazily checkpointed — same iterative-join
    lineage discipline as PageRank above (the per-level reachability
    probe materializes the frontier in the same job). Terminates at the first empty
    frontier, so the round count is the graph's eccentricity bound, not
    max_depth.

    If the frontier is still non-empty after ``max_depth`` rounds the
    result is a truncated BFS; by default that raises (same convergence
    discipline as ``connected_components``). Pass ``allow_partial=True``
    to instead get the depth-bounded partial answer — every returned
    distance is still exact, nodes farther than ``max_depth`` are simply
    absent.
    """
    from pyspark.sql import functions as F

    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    visited = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    converged = False
    for depth in range(1, max_depth + 1):
        nxt = (
            sym.join(frontier, sym.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=False)
        )
        if nxt.limit(1).count() == 0:
            converged = True
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt
    if not converged and not allow_partial:
        # One more expansion probe: the loop may have ended exactly at the
        # eccentricity, with the last frontier having nothing new to add.
        remaining = (
            sym.join(frontier, sym.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        if remaining.limit(1).count() > 0:
            raise RuntimeError(
                f"bfs_levels did not converge within max_depth={max_depth}; "
                "pass allow_partial=True for a depth-bounded partial result"
            )
    return visited


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank: teleport mass concentrates on the ``seeds``
    set instead of spreading uniformly, so ranks measure proximity TO
    the seeds — the similar-item / local-community primitive (seeded
    recommendation, related-document expansion) rather than global
    importance.

    Same simplified-PR contract and plan shape as :func:`pagerank` (all
    mass flows through out-edges; rank exists for contribution
    receivers; one keyed shuffle per iteration, lineage truncated every
    3 rounds), with the teleport term ``(1-d)/|S|`` paid only to seed
    nodes and the initial distribution equal to the teleport
    distribution. Contributions accumulate through decimal(18,9) so the
    per-iteration sums are order-independent (engine-exact ranks).
    """
    if not seeds:
        raise ValueError("seeds must be non-empty")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = e.select(F.col("src").alias("node")).distinct()
    s = float(len(seeds))
    seed_lit = [F.lit(int(x)) for x in seeds]
    init = F.when(
        F.col("node").isin(*seed_lit), F.lit(1.0 / s)
    ).otherwise(F.lit(0.0))
    ranks = nodes.withColumn("rank", init)
    for i in range(iterations):
        contribs = (
            e.join(ranks, e.src == F.col("node"))
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).cast("decimal(18,9)").alias("c"),
            )
        )
        teleport = F.when(
            F.col("node").isin(*seed_lit), F.lit((1.0 - damping) / s)
        ).otherwise(F.lit(0.0))
        ranks = contribs.groupBy("node").agg(
            (teleport + F.lit(damping) * F.sum("c").cast("double")).alias(
                "rank"
            )
        )
        if (i + 1) % 3 == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
