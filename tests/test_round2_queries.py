"""Unit tests for the round-2 query families: gap-fill LOCF, incremental
aggregate maintenance, constraint audit, layout (pruning/compaction), and
the TPC-H Q21 decorrelation — each on a tiny synthetic frame whose ground
truth is computed by hand, independent of the DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 0, 0)


class TestGapFillLocf:
    def test_gaps_filled_with_previous_value(self, spark):
        # user 1 observes hours 0, 3; the spine must create 1, 2 and
        # carry hour-0's value forward
        from dataintegration_csvprovider_spark.queries.timeseries import (
            q_gap_fill_locf,  # noqa: F401  (import proves registration)
        )

        df = spark.createDataFrame(
            [(1, _ts(0), 10.0), (1, _ts(3), 40.0), (2, _ts(5), 7.0)],
            "user_id int, bucket_hour timestamp, v double",
        )
        spine = (
            df.groupBy("user_id")
            .agg(F.min("bucket_hour").alias("a"), F.max("bucket_hour").alias("b"))
            .select(
                "user_id",
                F.explode(
                    F.sequence("a", "b", F.expr("INTERVAL 1 HOUR"))
                ).alias("bucket_hour"),
            )
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("user_id")
            .orderBy("bucket_hour")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            spine.join(df, ["user_id", "bucket_hour"], "left")
            .select(
                "user_id",
                "bucket_hour",
                F.last("v", ignorenulls=True).over(w).alias("filled"),
                F.col("v").isNull().alias("was_gap"),
            )
            .collect()
        )
        by_key = {(r.user_id, r.bucket_hour.hour): (r.filled, r.was_gap) for r in out}
        assert len(out) == 5  # user1: 0..3 (4 rows), user2: 5 (1 row)
        assert by_key[(1, 0)] == (10.0, False)
        assert by_key[(1, 1)] == (10.0, True)
        assert by_key[(1, 2)] == (10.0, True)
        assert by_key[(1, 3)] == (40.0, False)
        assert by_key[(2, 5)] == (7.0, False)


class TestIncrementalAgg:
    def test_merge_equals_full_recompute(self, spark, sf_dir):
        from dataintegration_csvprovider_spark.queries.cdcops import (
            q_incremental_agg,
        )
        from dataintegration_csvprovider_spark.catalog import load_table

        inc = {
            r.o_custkey: (r.n_orders, r.total_spend)
            for r in q_incremental_agg(spark, sf_dir).collect()
        }
        full = {
            r.o_custkey: (r.n_orders, r.total_spend)
            for r in load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_spend"),
            )
            .collect()
        }
        assert inc == full  # bit-exact, including the double cast

    def test_empty_delta_side(self, spark):
        # merge must keep keys that exist on only one side
        base = spark.createDataFrame(
            [(1, 2, 10.0)], "k int, n long, s double"
        ).select("k", "n", F.col("s").cast("decimal(18,6)").alias("s"))
        delta = base.filter(F.lit(False))
        zero = F.lit(0).cast("decimal(28,6)")
        merged = (
            base.select("k", F.col("n").alias("nb"), F.col("s").alias("sb"))
            .join(
                delta.select(
                    "k", F.col("n").alias("nd"), F.col("s").alias("sd")
                ),
                "k",
                "full_outer",
            )
            .select(
                "k",
                (F.coalesce("nb", F.lit(0)) + F.coalesce("nd", F.lit(0))).alias("n"),
                (F.coalesce(F.col("sb"), zero) + F.coalesce(F.col("sd"), zero))
                .cast("double")
                .alias("s"),
            )
            .collect()
        )
        assert [(r.k, r.n, r.s) for r in merged] == [(1, 2, 10.0)]


class TestConstraintAudit:
    def test_counts_planted_violations(self, spark):
        # plant: one duplicate pk, one orphan fk, one null, one negative
        parent = spark.createDataFrame(
            [(1, "a"), (1, "dup"), (2, "b")], "pk int, payload string"
        )
        child = spark.createDataFrame(
            [(1, 5.0), (99, None), (2, -3.0)], "fk int, v double"
        )
        dup_violations = (
            parent.groupBy("pk")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("v"))
            .collect()[0][0]
        )
        orphans = (
            child.join(parent.select("pk"), child.fk == F.col("pk"), "left_anti")
            .count()
        )
        nulls = child.filter(F.col("v").isNull()).count()
        negatives = child.filter(F.col("v") < 0).count()
        assert (dup_violations, orphans, nulls, negatives) == (1, 1, 1, 1)

    def test_registry_query_shape(self, spark, sf_dir):
        from dataintegration_csvprovider_spark.queries.profiling import (
            q_constraint_audit,
        )

        rows = q_constraint_audit(spark, sf_dir).collect()
        checks = {r.check_name: r.violations for r in rows}
        assert len(checks) == 6
        # structural invariants hold at every scale factor
        assert checks["orders.pk_unique"] == 0
        assert checks["lineitem.fk_orders"] == 0
        assert checks["orders.status_domain"] == 0
        assert checks["customer.acctbal_negative"] > 0  # fixture has these


class TestCompaction:
    def test_exact_output_file_count(self, spark):
        df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
        d = tempfile.mkdtemp(prefix="compact_test_")
        try:
            df.repartition(8).write.mode("overwrite").parquet(f"{d}/small")
            spark.read.parquet(f"{d}/small").repartition(2).write.mode(
                "overwrite"
            ).parquet(f"{d}/big")
            back = spark.read.parquet(f"{d}/big")
            n_files = (
                back.withColumn("_f", F.input_file_name())
                .select("_f")
                .distinct()
                .count()
            )
            assert n_files == 2
            assert back.count() == 1000
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestQ21Decorrelation:
    def test_sole_late_supplier_logic(self, spark):
        # order 1: suppliers 10 late, 20 on-time -> supplier 10 counted
        # order 2: suppliers 10 and 20 both late   -> nobody counted
        # order 3: single-supplier order, late     -> nobody (needs >= 2)
        rows = spark.createDataFrame(
            [
                (1, 10, 1), (1, 20, 0),
                (2, 10, 1), (2, 20, 1),
                (3, 10, 1),
            ],
            "order_id int, supp int, is_late int",
        )
        per_order = rows.groupBy("order_id").agg(
            F.countDistinct("supp").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("is_late") == 1, F.col("supp"))
            ).alias("n_late"),
        )
        late = rows.filter(F.col("is_late") == 1).select("order_id", "supp")
        winners = (
            late.join(
                per_order.filter(
                    (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
                ),
                "order_id",
                "left_semi",
            )
            .collect()
        )
        assert [(r.order_id, r.supp) for r in winners] == [(1, 10)]
