"""Count-min sketch unit tests: overestimate guarantee and pruning-only
candidate semantics."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[A-Za-z]+|[0-9]+"), F.lit(0))
        ).alias("token")
    )


def test_cms_never_underestimates(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    sketch = cms_build(toks, "token", depth=4, width=64)  # narrow: force collisions
    truth = toks.groupBy("token").agg(F.count("*").alias("true_cnt"))
    est = truth.withColumn("est", cms_estimate(F.col("token"), sketch))
    assert est.filter(F.col("est") < F.col("true_cnt")).count() == 0


def test_cms_total_mass_per_row(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    n = toks.count()
    sketch = cms_build(toks, "token", depth=3, width=32)
    assert all(sum(row) == n for row in sketch)


def test_cms_heavy_hitters_equals_plain_groupby(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    for width in (16, 1024):  # heavy collisions and none: result identical
        got = {
            (r.token, r.cnt)
            for r in cms_heavy_hitters(toks, "token", threshold=50, width=width).collect()
        }
        want = {
            (r.token, r.cnt)
            for r in toks.groupBy(F.col("token"))
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") >= 50)
            .collect()
        }
        assert got == want


# --- KMV / theta distinct sketch -------------------------------------------

from etl_market_survey_spark.operators.sketch import KmvSketch, kmv_build  # noqa: E402


def test_kmv_small_set_is_exact(spark):
    df = spark.range(500).select((F.col("id") % 200).alias("v"))
    sk = kmv_build(df, "v", k=1024)
    assert sk.estimate() == 200.0
    assert sk.theta == 1.0


def test_kmv_estimate_within_error_bound(spark):
    # KMV rse ~ 1/sqrt(k-2); assert < 4 sigma (deterministic: xxhash64)
    n = 50_000
    df = spark.range(4 * n).select((F.col("id") % n).alias("v"))
    k = 1024
    sk = kmv_build(df, "v", k=k)
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(sk.estimate() - n) / n < 4 * rse


def test_kmv_build_deterministic(spark):
    df = spark.range(30_000).select(F.col("id").alias("v"))
    a = kmv_build(df, "v", k=256)
    b = kmv_build(df.repartition(13), "v", k=256)  # partitioning-invariant
    assert a.hashes == b.hashes


def test_kmv_set_operations(spark):
    k = 1024
    a = kmv_build(spark.range(0, 60_000).select(F.col("id").alias("v")), "v", k=k)
    b = kmv_build(spark.range(40_000, 100_000).select(F.col("id").alias("v")), "v", k=k)
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(a.union(b).estimate() - 100_000) / 100_000 < 4 * rse
    # intersection/jaccard error scales with 1/jaccard; allow a loose band
    assert abs(a.intersect_estimate(b) - 20_000) / 20_000 < 0.15
    assert abs(a.jaccard(b) - 0.2) / 0.2 < 0.15


def test_kmv_union_merges_sorted_prefix():
    a = KmvSketch(4, [10, 20, 30, 40])
    b = KmvSketch(4, [15, 20, 35, 50])
    assert a.union(b).hashes == [10, 15, 20, 30]
