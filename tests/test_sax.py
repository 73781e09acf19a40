"""SAX symbolization (operators/sax) — q261 gates the corpus path;
units pin short-series words, exact breakpoint edges, and validation."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.sax import sax_motifs, sax_words


def _words(spark, rows, w, bp):
    df = spark.createDataFrame(rows, "k long, t long, v long")
    return {
        r["k"]: (r["n_points"], r["sax_word"])
        for r in sax_words(df, "k", ["t"], "v", w, bp).collect()
    }


def test_word_assembly_and_breakpoint_edges(spark):
    # 8 points, 4 segments, breakpoints [10, 20]: means 5,10,15,25 ->
    # a (5<10), b (10 is NOT < 10), b, c
    rows = [
        (1, 1, 5), (1, 2, 5),
        (1, 3, 10), (1, 4, 10),
        (1, 5, 15), (1, 6, 15),
        (1, 7, 25), (1, 8, 25),
    ]
    assert _words(spark, rows, 4, [10, 20])[1] == (8, "abbc")


def test_short_series_shorter_word(spark):
    # 2 points into 4 segments: counted allocation fills segments 0 and
    # 2 only -> a 2-symbol word, not a padded 4-symbol one
    got = _words(spark, [(1, 1, 0), (1, 2, 100)], 4, [50])
    assert got[1] == (2, "ab")


def test_fractional_mean_cross_multiplied(spark):
    # segment {1, 2}: mean 1.5 vs breakpoint 2 -> 'a' (3 < 2*2); the
    # test must not round the mean to 2 first
    got = _words(spark, [(1, 1, 1), (1, 2, 2)], 1, [2])
    assert got[1] == (2, "a")


def test_motif_support(spark):
    rows = [(1, 1, 0), (1, 2, 100), (2, 1, 0), (2, 2, 100), (3, 1, 100), (3, 2, 0)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    words = sax_words(df, "k", ["t"], "v", 2, [50])
    motifs = {r["sax_word"]: r["n_keys"] for r in sax_motifs(words).collect()}
    assert motifs == {"ab": 2}


def test_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], "k long, t long, v long")
    with pytest.raises(ValueError):
        sax_words(df, "k", ["t"], "v", 0, [1])
    with pytest.raises(ValueError):
        sax_words(df, "k", ["t"], "v", 2, [2, 1])
    with pytest.raises(ValueError):
        sax_words(df, "k", ["t"], "v", 2, list(range(30)))
