"""Approximate-aggregate error bounds: HLL distinct counts stay within
the configured relative standard deviation of the exact answer."""

from pyspark.sql import functions as F


def test_approx_count_distinct_error_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err < 0.06, (k, approx[k], exact[k])  # 3x rsd margin
