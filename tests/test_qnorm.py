"""Quantile normalization + distributed_rank: window-equality, the
equal-marginals property, known values, single-row source."""

import random

from etl_market_survey_spark.operators.prefix import distributed_rank
from etl_market_survey_spark.operators.qnorm import quantile_normalize
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_distributed_rank_equals_window(spark):
    rng = random.Random(5)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.rank
        for r in distributed_rank(df, "v", ["id"], n_buckets=7).collect()
    }
    want = {
        r.id: r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_known_normalization(spark):
    # source a = {0, 10}, source b = {100, 200}; pooled sorted =
    # [0, 10, 100, 200]. Each source's rank 1 -> pooled pos 0 (value 0),
    # rank 2 -> pooled pos 3 (value 200).
    rows = [(1, "a", 0), (2, "a", 10), (3, "b", 100), (4, "b", 200)]
    df = spark.createDataFrame(rows, "doc_id long, src string, v long")
    got = {
        r.doc_id: r.norm_value
        for r in quantile_normalize(df, "src", "v", ["doc_id"]).collect()
    }
    assert got == {1: 0.0, 2: 200.0, 3: 0.0, 4: 200.0}


def test_equal_marginals_when_sizes_match(spark):
    # equal-size sources: after normalization both sources carry exactly
    # the same value multiset (the defining property)
    rng = random.Random(9)
    rows = [(i, "a" if i % 2 else "b", rng.randint(0, 10_000)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string, v long")
    out = quantile_normalize(df, "src", "v", ["doc_id"]).collect()
    a = sorted(r.norm_value for r in out if r.src == "a")
    b = sorted(r.norm_value for r in out if r.src == "b")
    assert a == b


def test_single_row_source(spark):
    rows = [(1, "solo", 42), (2, "big", 0), (3, "big", 100)]
    df = spark.createDataFrame(rows, "doc_id long, src string, v long")
    got = {
        r.doc_id: r.norm_value
        for r in quantile_normalize(df, "src", "v", ["doc_id"]).collect()
    }
    assert got[1] == 0.0  # n_s=1 -> pooled position 0 -> pooled min
