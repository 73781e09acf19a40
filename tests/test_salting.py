"""Hot-key salting (operators/salting, VERDICT r4 item 8): salted joins
must be PAIR-IDENTICAL to unsalted ones, and the salt column must
actually be in the shuffle/join key (plan-asserted) so a hot key's
candidates really spread across partitions."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.phonetic import (
    jaro_winkler_pairs,
    soundex_blocked_pairs,
)
from etl_market_survey_spark.operators.salting import (
    hot_keys,
    replicate_build,
    salt_probe,
    salted_join,
)
from etl_market_survey_spark.operators.simjoin import similarity_self_join


def _names_df(spark):
    """~60 names over few soundex codes: S530 (smith-family) is the hot
    block, plus small cold blocks."""
    smiths = [f"smith{i}" for i in range(30)] + ["smyth", "smithe", "snead"]
    cold = ["jones", "johns", "brown", "braun", "clark", "clerk"]
    return spark.createDataFrame(
        [(n,) for n in smiths + cold], "author string"
    )


class TestSaltedJoinPrimitive:
    def test_hot_keys_bounded(self, spark):
        df = spark.range(100).select(
            F.when(F.col("id") < 90, "hot").otherwise(F.col("id").cast("string")).alias("k")
        )
        assert hot_keys(df, "k", 50) == ["hot"]
        assert hot_keys(df, "k", 1000) == []

    def test_probe_build_meet_on_exactly_one_salt(self, spark):
        df = spark.range(40).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        p = salt_probe(df, "k", F.col("v"), ["hot"], 4)
        b = replicate_build(df.withColumnRenamed("v", "w"), "k", ["hot"], 4)
        out = p.join(b, ["k", "_salt"])
        assert out.count() == 40 * 40  # identical to the unsalted join
        # probe rows use >1 distinct salts (work actually spreads)
        assert p.select("_salt").distinct().count() > 1

    def test_salted_join_identical_and_salt_in_plan(self, spark):
        left = spark.range(200).select(
            F.when(F.col("id") % 10 < 9, "hot")
            .otherwise("cold").alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(150).select(
            F.when(F.col("id") % 10 < 9, "hot")
            .otherwise("cold").alias("k"),
            F.col("id").alias("rv"),
        )
        hot = hot_keys(left, "k", 100)
        assert hot == ["hot"]
        salted = salted_join(left, right, "k", F.col("lv"), hot=hot, n_salt=8)
        plain = left.join(right, "k")
        assert (
            salted.exceptAll(plain).count() == 0
            and plain.exceptAll(salted).count() == 0
        )
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # the shuffle key includes the salt

    def test_no_hot_keys_short_circuits(self, spark):
        df = spark.range(10).select(F.col("id").cast("string").alias("k"),
                                    F.col("id").alias("v"))
        out = salted_join(df, df.withColumnRenamed("v", "w"), "k",
                          F.col("v"), hot=[], n_salt=8)
        assert "_salt" not in out.columns
        assert out.count() == 10


class TestPhoneticSalted:
    def test_soundex_pairs_identical(self, spark):
        df = _names_df(spark)
        base = soundex_blocked_pairs(df, "author", max_dist=3)
        salted = soundex_blocked_pairs(
            df, "author", max_dist=3, salt=4, hot_threshold=10
        )
        assert (
            salted.exceptAll(base).count() == 0
            and base.exceptAll(salted).count() == 0
        )
        assert base.count() > 0

    def test_jaro_winkler_pairs_identical(self, spark):
        df = _names_df(spark)
        base = jaro_winkler_pairs(df, "author", threshold=0.8)
        salted = jaro_winkler_pairs(
            df, "author", threshold=0.8, salt=4, hot_threshold=10
        )
        assert (
            salted.exceptAll(base).count() == 0
            and base.exceptAll(salted).count() == 0
        )
        assert base.count() > 0

    def test_salt_in_executed_plan(self, spark):
        df = _names_df(spark)
        salted = soundex_blocked_pairs(df, "author", salt=4, hot_threshold=10)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan


class TestSimJoinSalted:
    def _docs(self, spark):
        # 25 near-identical docs (hot prefix tokens) + distinct tail
        rows = [(i, f"common shingle text block variant {i % 5}") for i in range(25)]
        rows += [(100 + i, f"unique document number {i} with words {i*7}")
                 for i in range(15)]
        return spark.createDataFrame(rows, "doc_id long, body string").select(
            "doc_id", F.split("body", " ").alias("toks")
        )

    @pytest.mark.parametrize("size_verify", [True, False])
    def test_pairs_identical(self, spark, size_verify):
        df = self._docs(spark)
        base = similarity_self_join(df, "doc_id", "toks", 1, 2,
                                    size_verify=size_verify)
        salted = similarity_self_join(
            df, "doc_id", "toks", 1, 2, size_verify=size_verify,
            salt=4, hot_token_threshold=3,
        )
        assert (
            salted.exceptAll(base).count() == 0
            and base.exceptAll(salted).count() == 0
        )
        assert base.count() > 0

    def test_salt_in_executed_plan(self, spark):
        df = self._docs(spark)
        salted = similarity_self_join(
            df, "doc_id", "toks", 1, 2, salt=4, hot_token_threshold=3
        )
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan
