"""Training-shard dataset writer: the sink half of the shard story.

:func:`token_balanced_shards <..operators.scale.token_balanced_shards>`
decides WHERE each document goes (contiguous order ranges, ~equal token
weight); this module actually WRITES the layout every training loader
expects — one parquet directory per shard plus a manifest table — and
reads the manifest back from the written files so the write path itself
is what gets verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scale import token_balanced_shards


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    order_col: str,
    weight_col: str,
) -> DataFrame:
    """Write ``df`` as a sharded training dataset: rows are assigned to
    ``n_shards`` contiguous, weight-balanced shards (the distributed-
    prefix-sum assignment of ``token_balanced_shards`` — one range
    shuffle + a broadcast) and written ``partitionBy(shard_id)``, so
    each shard is its own parquet directory a loader can stream
    independently and partition pruning serves per-shard reads.

    Returns the MANIFEST recomputed from the files just written (not
    from the in-memory plan): per shard, document count, total weight,
    and the [first, last] ``order_col`` range — the contiguity receipt.
    Reading the manifest off the written files makes this a write-path
    verification, not an echo of the input.

    At 100 TB: the write is one extra column on the scan plus the
    partitioned commit; the manifest read touches only footer-level
    row groups of the written files (column-pruned aggregate).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sharded = token_balanced_shards(
        df, order_col, weight_col, n_shards, out_col="shard_id"
    )
    sharded.write.mode("overwrite").partitionBy("shard_id").parquet(path)

    written = df.sparkSession.read.parquet(path)
    return (
        written.groupBy(F.col("shard_id").cast("bigint").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(weight_col).cast("bigint").alias("shard_weight"),
            F.min(order_col).cast("bigint").alias("first_id"),
            F.max(order_col).cast("bigint").alias("last_id"),
        )
    )
