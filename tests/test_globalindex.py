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
