"""Global sort index (operators/globalindex): correctness vs a plain
window ROW_NUMBER, determinism across partition counts, and the scale
property that motivates it — NO single-partition exchange in the plan."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.globalindex import global_sort_index


def _sample(spark, n=5000):
    return spark.range(n).select(
        (F.col("id") * 48271 % 10007).alias("k"),
        F.col("id").alias("uid"),
    )


class TestGlobalSortIndex:
    def test_matches_window_row_number(self, spark):
        df = _sample(spark)
        got = {
            (r["k"], r["uid"]): r["idx"]
            for r in global_sort_index(df, ["k", "uid"], num_partitions=16).collect()
        }
        w = Window.orderBy("k", "uid")
        want = {
            (r["k"], r["uid"]): r["rn"] - 1
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        assert got == want

    def test_partition_count_invariant(self, spark):
        df = _sample(spark, 2000)
        a = global_sort_index(df, ["k", "uid"], num_partitions=4)
        b = global_sort_index(df, ["k", "uid"], num_partitions=23)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_index_is_dense_zero_based(self, spark):
        out = global_sort_index(_sample(spark, 999), ["k", "uid"])
        stats = out.agg(
            F.min("idx").alias("lo"), F.max("idx").alias("hi"),
            F.countDistinct("idx").alias("d"), F.count("*").alias("n"),
        ).collect()[0]
        assert stats["lo"] == 0 and stats["hi"] == 998
        assert stats["d"] == stats["n"] == 999

    def test_no_single_partition_exchange(self, spark):
        df = _sample(spark)
        out = global_sort_index(df, ["k", "uid"], num_partitions=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan  # the whole point
        assert "rangepartitioning" in plan

    def test_empty_frame(self, spark):
        empty = spark.createDataFrame([], "k long, uid long")
        assert global_sort_index(empty, ["k", "uid"]).count() == 0


class TestGroupedSortIndex:
    def _grouped(self, spark, n=4000, groups=3):
        return spark.range(n).select(
            (F.col("id") % groups).cast("string").alias("g"),
            (F.col("id") * 48271 % 503).alias("v"),
            F.col("id").alias("uid"),
            (F.col("id") % 7 + 1).alias("w"),
        )

    def test_matches_grouped_window_row_number(self, spark):
        from etl_market_survey_spark.operators.globalindex import (
            grouped_sort_index,
        )

        df = self._grouped(spark)
        got = {
            (r["g"], r["uid"]): r["rnk"]
            for r in grouped_sort_index(
                df, ["g"], ["v", "uid"], index_col="rnk", num_partitions=16
            ).collect()
        }
        w = Window.partitionBy("g").orderBy("v", "uid")
        want = {
            (r["g"], r["uid"]): r["rn"]
            for r in df.withColumn("rn", F.row_number().over(w)).collect()
        }
        assert got == want

    def test_cumulative_sums_match_window(self, spark):
        from etl_market_survey_spark.operators.globalindex import (
            grouped_sort_index,
        )

        df = self._grouped(spark, 3000)
        got = {
            (r["g"], r["uid"]): r["cw"]
            for r in grouped_sort_index(
                df, ["g"], ["v", "uid"], index_col="rnk",
                cum_cols={"cw": "w"}, num_partitions=11
            ).collect()
        }
        w = (
            Window.partitionBy("g").orderBy("v", "uid")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = {
            (r["g"], r["uid"]): r["cw"]
            for r in df.withColumn("cw", F.sum("w").over(w)).collect()
        }
        assert got == want

    def test_null_group_rows_survive(self, spark):
        from etl_market_survey_spark.operators.globalindex import (
            grouped_sort_index,
        )

        df = self._grouped(spark, 300).withColumn(
            "g", F.when(F.col("uid") % 5 == 0, None).otherwise(F.col("g"))
        )
        out = grouped_sort_index(df, ["g"], ["v", "uid"], index_col="rnk",
                                 num_partitions=8)
        assert out.count() == 300  # null-safe offset join keeps them
        nulls = out.filter(F.col("g").isNull())
        mx = nulls.agg(F.max("rnk")).collect()[0][0]
        assert mx == nulls.count()  # ranks 1..n within the null group

    def test_partition_count_invariant(self, spark):
        from etl_market_survey_spark.operators.globalindex import (
            grouped_sort_index,
        )

        df = self._grouped(spark, 1500)
        a = grouped_sort_index(df, ["g"], ["v", "uid"], num_partitions=3)
        b = grouped_sort_index(df, ["g"], ["v", "uid"], num_partitions=29)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_no_group_key_window_over_full_scan(self, spark):
        from etl_market_survey_spark.operators.globalindex import (
            grouped_sort_index,
        )

        out = grouped_sort_index(
            self._grouped(spark), ["g"], ["v", "uid"], num_partitions=16
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "rangepartitioning" in plan
        # every window is sliced by the kernel's _pid — never the bare
        # bounded-cardinality group key
        import re as _re

        for m in _re.finditer(
            r"windowspecdefinition\(([^)]*)\)", plan
        ):
            assert "_pid" in m.group(1), m.group(1)
