"""SparkSession factory tuned for the engine.

Local-mode defaults are sized for the test harness (local[N] single JVM);
every setting here also holds on a real cluster: AQE re-plans shuffles at
runtime (partition coalescing + skew-join splitting), UTC session timezone
makes results independent of cluster locale (designing out the reference's
current-culture dependence, CSVSourceReader.cs:237), and Arrow transfer
keeps the Python boundary vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dataintegration_csvprovider_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]`` and size shuffle partitions to the core
    count (the stock 200 over-parallelizes small data and under-parallelizes
    100 TB — at scale callers pass an explicit value or rely on AQE
    coalescing from a high initial number).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NO initialPartitionNum override — measured and rejected twice
        # on local[32]: a 512 initial cost ~0.3 s on the sf0.1 exact-
        # Jaccard (A/B 2.6-3.1 s vs 2.4-2.7 s) and ~15% on 10× pagerank
        # (A/B warm 8.0 s vs 6.9 s — one wide-then-coalesce round per
        # iteration), while the Σdf² 30× pair aggregation it was meant
        # to help proved throughput-bound, not reducer-bound (412 s at
        # 74 reducers ≈ 401 s at 32). On a real cluster, size
        # shuffle_partitions for the job instead.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the reference's encoding surface includes cp1252/cp1251
        # (CSVProvider.cs:603-616); Spark 4 gates non-core charsets
        .config("spark.sql.legacy.javaCharsets", "true")
        # parquet TIMESTAMP(NANOS) (events fixture) is unreadable without
        # this; the catalog converts the raw nanos to microsecond timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # local mode runs driver + all executor threads in ONE JVM, so
        # this is the whole engine's heap: 8g put the 30× dedup probe's
        # shuffle stage into GCLocker/OOM territory on a 128 GiB box
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
