"""BM25 unit tests: hand-computed scores, rank monotonicity in tf and
document length, and input validation."""

import math

import pytest

from etl_market_survey_spark.functions.relevance import bm25_scores

_K1, _B = 1.2, 0.75


def _bm25_ref(tf, dl, avgdl, n_docs, df):
    idf = round(math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9)
    contrib = idf * (tf * (_K1 + 1.0)) / (tf + _K1 * (1 - _B + _B * dl / avgdl))
    return round(round(contrib, 9), 6)


def _scores(spark, corpus, terms):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    return {r.doc_id: r.score for r in bm25_scores(df, terms).collect()}


def test_hand_computed_single_term(spark):
    corpus = [
        (1, "cat dog"),          # tf=1, dl=2
        (2, "cat cat cat dog"),  # tf=3, dl=4
        (3, "bird bird"),        # no match
    ]
    got = _scores(spark, corpus, ["cat"])
    avgdl = 8 / 3
    assert set(got) == {1, 2}
    assert got[1] == pytest.approx(_bm25_ref(1, 2, avgdl, 3, 2), abs=2e-6)
    assert got[2] == pytest.approx(_bm25_ref(3, 4, avgdl, 3, 2), abs=2e-6)


def test_more_occurrences_rank_higher_at_equal_length(spark):
    corpus = [
        (1, "x x x x"),
        (2, "x x y y"),
        (3, "x y y y"),
    ]
    got = _scores(spark, corpus, ["x"])
    assert got[1] > got[2] > got[3]


def test_shorter_doc_ranks_higher_at_equal_tf(spark):
    corpus = [
        (1, "x y"),
        (2, "x y y y y y y y"),
        (3, "z z z"),
    ]
    got = _scores(spark, corpus, ["x"])
    assert got[1] > got[2]


def test_multi_term_is_sum_of_contributions(spark):
    corpus = [(1, "a b"), (2, "a c"), (3, "b c")]
    one = _scores(spark, corpus, ["a"])
    other = _scores(spark, corpus, ["b"])
    both = _scores(spark, corpus, ["a", "b"])
    assert both[1] == pytest.approx(one[1] + other[1], abs=2e-6)


def test_empty_query_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])
