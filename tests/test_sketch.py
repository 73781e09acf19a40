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
