"""Distributed prefix sum: equality with the single-reducer window,
partitioning invariance, and packing invariants (no bin starts
mid-document, oversized docs get their own bins)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_market_survey_spark.operators.prefix import distributed_cumsum, pack_bins_cumsum


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(5000).select(
        F.col("id"), (F.pmod(F.xxhash64("id"), F.lit(97)) + 1).alias("v")
    )


def test_matches_global_window(df):
    got = distributed_cumsum(df, "id", "v", out="cs", n_buckets=16)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cs", F.sum("v").over(w).cast("long"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # exclusive scan = inclusive - own value
    ex = distributed_cumsum(df, "id", "v", out="cs", n_buckets=16, inclusive=False)
    joined = got.alias("a").join(ex.alias("b"), "id")
    bad = joined.filter(F.col("a.cs") - F.col("a.v") != F.col("b.cs")).count()
    assert bad == 0


def test_partitioning_invariance(df):
    a = distributed_cumsum(df, "id", "v", out="cs", n_buckets=16)
    b = distributed_cumsum(df.repartition(23), "id", "v", out="cs", n_buckets=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_invariants(spark):
    sizes = [100, 200, 4000, 50, 9000, 10, 10, 4096, 1]
    pdf = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(pdf, "doc_id long, n_tok long")
    out = pack_bins_cumsum(df, "doc_id", "n_tok", budget=4096, n_buckets=4)
    rows = {r["doc_id"]: r["bin_id"] for r in out.collect()}
    bins = [rows[i] for i in sorted(rows)]
    # exclusive cumsums: 0,100,300,4300,4350,13350,13360,13370,17466
    assert bins == [0, 0, 0, 1, 1, 3, 3, 3, 4]
    # monotone in doc order; the 9000-token doc spans the bin-2 boundary,
    # so bin 2 is swallowed (never assigned) rather than the doc split
    assert bins == sorted(bins)
    assert 2 not in bins
