"""Bloom semi-join: exactness vs a plain left-semi join, no false
negatives at the probe, and realized fpp within ~3x of the target."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.bloom import (
    bloom_filter_df,
    bloom_params,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def fact(spark):
    return spark.range(20000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("v")
    )


@pytest.fixture(scope="module")
def dim(spark):
    # every 7th key in [0, 2000) -> ~14% selectivity on the fact
    return spark.range(286).select((F.col("id") * 7).alias("k"))


def test_semi_join_exact(fact, dim):
    got = bloom_semi_join(fact, dim, "k", fpp=0.01, seed=7)
    want = fact.join(dim.distinct(), "k", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == want.count() > 0


def test_no_false_negatives_and_fpp(fact, dim):
    n = dim.distinct().count()
    n_bits, n_hashes = bloom_params(n, fpp=0.01)
    bits = build_bloom(dim, "k", n_bits, n_hashes, seed=7)
    pruned = bloom_filter_df(fact, "k", bits, n_hashes, seed=7)

    truth = fact.join(dim.distinct(), "k", "left_semi")
    n_true = truth.count()
    # no false negatives: every true match survives the probe
    assert pruned.join(dim.distinct(), "k", "left_semi").count() == n_true
    # realized fpp over the non-matching keys stays near the target
    n_neg = fact.count() - n_true
    false_pos = pruned.count() - n_true
    assert false_pos / n_neg < 0.03


def test_string_keys(spark):
    fact = spark.range(5000).select(
        F.concat(F.lit("key_"), (F.col("id") % 500).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(50).select(
        F.concat(F.lit("key_"), (F.col("id") * 11).cast("string")).alias("k")
    )
    got = bloom_semi_join(fact, dim, "k", fpp=0.05, seed=1)
    want = fact.join(dim.distinct(), "k", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
