"""jaccard_pairs scale contract: unblocked+thresholded calls must route
through the prefix-filter join (bit-identical results), and unblocked
threshold=0 calls must refuse frames big enough to go quadratic."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.dedup import (
    _UNBLOCKED_MAX_ROWS,
    jaccard_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox leaps over the lazy dog"),
    (3, "a completely different sentence about spark plans"),
    (4, "another completely different sentence about spark plans"),
    (5, "the quick brown fox jumps over the lazy dog"),
    (6, "spark plans about sentence different completely a"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r.id_a, r.id_b, r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in df.collect()
    )


def test_unblocked_threshold_matches_blocked_enumeration(spark):
    df = _df(spark)
    got = jaccard_pairs(df, "doc_id", "text", threshold=0.3, shingle_n=2)
    # same pairs as the naive all-pairs enumeration (single constant block)
    want = jaccard_pairs(
        df.withColumn("_blk", F.lit(1)),
        "doc_id",
        "text",
        block_col="_blk",
        threshold=0.3,
        shingle_n=2,
    ).drop("_blk")
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_unblocked_threshold_takes_prefix_path(spark):
    df = _df(spark)
    plan = jaccard_pairs(
        df, "doc_id", "text", threshold=0.3
    )._jdf.queryExecution().optimizedPlan().toString()
    # array_intersect is the prefix-join verify signature; the naive path
    # never materializes token arrays into an intersect
    assert "array_intersect" in plan


def test_unblocked_unthresholded_small_frame_allowed(spark):
    out = jaccard_pairs(_df(spark), "doc_id", "text", shingle_n=1)
    assert len(_rows(out)) > 0


def test_unblocked_unthresholded_large_frame_refused(spark):
    big = spark.range(_UNBLOCKED_MAX_ROWS + 10).select(
        F.col("id").alias("doc_id"), F.lit("common words here").alias("text")
    )
    with pytest.raises(ValueError, match="block_col"):
        jaccard_pairs(big, "doc_id", "text")
