"""Unit tests: bucketized band join and benchmark decontamination."""

import random

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.decontam import (
    contaminated_ids,
    decontaminate,
)
from etl_market_survey_spark.operators.rangejoin import band_join


def _pairs_naive(rows_a, rows_b, lower, upper):
    out = set()
    for k1, v1, i1 in rows_a:
        for k2, v2, i2 in rows_b:
            if k1 == k2 and lower < v2 - v1 <= upper:
                out.add((i1, i2))
    return out


@pytest.mark.parametrize("lower,upper,width", [(0, 50, None), (10, 70, None), (0, 50, 17)])
def test_band_join_matches_naive(spark, lower, upper, width):
    rng = random.Random(7)
    # negative values included on purpose: floor-div bucketing must not
    # split bands at zero (long `div` truncates toward zero).
    rows_a = [(rng.choice("xy"), rng.randint(-500, 500), i) for i in range(120)]
    rows_b = [(rng.choice("xy"), rng.randint(-500, 500), 1000 + i) for i in range(120)]
    a = spark.createDataFrame(rows_a, "k string, a_v long, a_id long")
    b = spark.createDataFrame(rows_b, "k string, b_v long, b_id long")
    got = {
        (r.a_id, r.b_id)
        for r in band_join(
            a, b, keys=["k"], left_on="a_v", right_on="b_v",
            lower=lower, upper=upper, bucket_width=width,
        ).collect()
    }
    assert got == _pairs_naive(rows_a, rows_b, lower, upper)


def test_band_join_no_duplicate_pairs(spark):
    # replication into adjacent buckets must not emit a pair twice
    a = spark.createDataFrame([("k", v, v) for v in range(0, 200, 3)], "k string, a_v long, a_id long")
    b = spark.createDataFrame([("k", v, v) for v in range(0, 200, 5)], "k string, b_v long, b_id long")
    out = band_join(a, b, keys=["k"], left_on="a_v", right_on="b_v", lower=0, upper=30)
    n = out.count()
    assert out.distinct().count() == n


def test_band_join_rejects_empty_band(spark):
    df = spark.createDataFrame([("k", 1, 1)], "k string, a_v long, a_id long")
    with pytest.raises(ValueError):
        band_join(df, df, keys=["k"], left_on="a_v", right_on="b_v", lower=5, upper=5)


_DOCS = [
    # (id, text) — 4-gram shingles on whitespace words
    (1, "alpha beta gamma delta epsilon"),
    (2, "one two three four five six"),
    (3, "alpha beta gamma delta zeta"),      # shares 'alpha beta gamma delta' with 1
    (4, "totally unrelated words here now"),
    (5, "two three four five whatever"),     # shares 'two three four five' with 2
]


def test_decontaminate_semantics(spark):
    train = spark.createDataFrame([r for r in _DOCS if r[0] >= 3], "doc_id long, text string")
    bench = spark.createDataFrame([r for r in _DOCS if r[0] <= 2], "doc_id long, text string")
    bad = {r.doc_id for r in contaminated_ids(train, bench, "doc_id", "text", n=4).collect()}
    assert bad == {3, 5}
    clean = {r.doc_id for r in decontaminate(train, bench, "doc_id", "text", n=4).collect()}
    assert clean == {4}


def test_decontaminate_hash_modes_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    by_text = {r.doc_id for r in contaminated_ids(train, bench, "doc_id", "text", n=4, hash_mode="text").collect()}
    by_hash = {r.doc_id for r in contaminated_ids(train, bench, "doc_id", "text", n=4, hash_mode="xxhash64").collect()}
    assert by_text == by_hash
