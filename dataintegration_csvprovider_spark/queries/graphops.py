"""Graph query surface: PageRank over a derived edge set, with a DuckDB
recursive-CTE oracle replaying the exact iteration arithmetic (fixed 10
iterations; per-edge contributions in IEEE double, per-node sums in
DECIMAL(18,9) — order-independent, so the value hash matches bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import pagerank
from .registry import register


@register(
    "q_pagerank",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 50 AS dst
      FROM orders),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    pr(iter, node, rank) AS (
      SELECT 0, src, CAST(1.0 AS DOUBLE) / 50
      FROM (SELECT DISTINCT src FROM edges) s
      UNION ALL
      SELECT p.iter + 1, e.dst,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / 50
             + CAST(0.85 AS DOUBLE)
               * CAST(SUM(CAST(p.rank / od.deg AS DECIMAL(18,9))) AS DOUBLE)
      FROM pr p
      JOIN edges e ON e.src = p.node
      JOIN outdeg od ON od.src = p.node
      WHERE p.iter < 10
      GROUP BY p.iter, e.dst
    )
    SELECT node, rank FROM pr WHERE iter = 10
    """,
    doc="PageRank (10 iterations, damping 0.85) over the 50-node graph "
        "src=o_custkey%50 -> dst=o_orderkey%50: the canonical iterative-"
        "join workload — one shuffle per iteration, lineage truncated per "
        "iteration via localCheckpoint (operators/graph.py). The oracle "
        "replays it as a recursive CTE.",
    tags=("graph", "iterative"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("o_orderkey") % 50).alias("dst"),
    )
    return pagerank(edges, iterations=10, damping=0.85)
