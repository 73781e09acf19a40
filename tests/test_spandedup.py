"""Exact substring-span dedup (operators/spandedup.py).

Constructed corpus with known cross-document duplicated spans, plus
invariants (disjoint merged spans, stats/clean consistency, hash-mode
equivalence, min_docs monotonicity).
"""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.spandedup import (
    dup_spans,
    duplicated_starts,
    remove_dup_spans,
    span_stats,
)

# doc 0 and 1 share "the quick brown fox jumps" (5 tokens, spans both
# docs); doc 2 shares nothing long enough; doc 3 repeats a 4-gram of
# doc 0 at its start. n=4 word-grams.
DOCS = [
    (0, "the quick brown fox jumps over a lazy dog tonight"),
    (1, "once more the quick brown fox jumps high"),
    (2, "completely unrelated words with no overlap at all"),
    (3, "quick brown fox jumps somewhere else entirely today"),
]
N = 4


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_known_spans(spark, docs):
    spans = {
        (r["doc_id"], r["start"], r["end"])
        for r in dup_spans(docs, "doc_id", "text", N).collect()
    }
    # doc0: "the quick brown fox jumps" = tokens 0..4 (starts 0 and 1
    # merge); doc1: tokens 2..6; doc3: "quick brown fox jumps" = 0..3
    assert spans == {(0, 0, 4), (1, 2, 6), (3, 0, 3)}


def test_within_doc_repeat_not_duplicated(spark):
    # the 4-gram repeats twice inside ONE doc -> countDistinct(doc)=1
    one = spark.createDataFrame(
        [(0, "a b c d x a b c d"), (1, "nothing shared here at all")],
        "doc_id long, text string",
    )
    assert duplicated_starts(one, "doc_id", "text", N).count() == 0


def test_spans_disjoint_and_merged(spark, docs):
    rows = dup_spans(docs, "doc_id", "text", N).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["start"], r["end"]))
    for sp in by_doc.values():
        sp.sort()
        for (s1, e1), (s2, e2) in zip(sp, sp[1:]):
            assert s2 > e1 + 1  # disjoint AND non-adjacent (maximal)
        assert all(e - s + 1 >= N for s, e in sp)


def test_stats_match_spans(spark, docs):
    stats = {r["doc_id"]: r for r in span_stats(docs, "doc_id", "text", N).collect()}
    assert set(stats) == {0, 1, 3}
    assert stats[0]["dup_tokens"] == 5 and stats[0]["n_spans"] == 1
    assert stats[0]["n_words"] == 10
    assert stats[0]["dup_frac"] == pytest.approx(0.5)


def test_clean_removes_exactly_spans(spark, docs):
    cleaned = {r["doc_id"]: r for r in remove_dup_spans(docs, "doc_id", "text", N).collect()}
    assert cleaned[0]["text"] == "over a lazy dog tonight"
    assert cleaned[1]["text"] == "once more high"
    assert cleaned[2]["text"] == DOCS[2][1]  # untouched
    assert cleaned[2]["n_removed"] == 0
    stats = {r["doc_id"]: r for r in span_stats(docs, "doc_id", "text", N).collect()}
    for d, r in cleaned.items():
        expect = stats[d]["dup_tokens"] if d in stats else 0
        assert r["n_removed"] == expect


def test_hash_mode_equivalent(spark, docs):
    a = set(map(tuple, dup_spans(docs, "doc_id", "text", N, hash_mode="text").collect()))
    b = set(map(tuple, dup_spans(docs, "doc_id", "text", N, hash_mode="xxhash64").collect()))
    assert a == b


def test_min_docs_monotone(spark, sf_dir, docs):
    real = (
        __import__("etl_market_survey_spark.sources.readers", fromlist=["read_parquet"])
        .read_parquet(spark, f"{sf_dir}/documents.parquet")
        .limit(200)
    )
    s2 = {
        (r["doc_id"], r["pos"])
        for r in duplicated_starts(real, "doc_id", "text", 3, min_docs=2).collect()
    }
    s3 = {
        (r["doc_id"], r["pos"])
        for r in duplicated_starts(real, "doc_id", "text", 3, min_docs=3).collect()
    }
    assert s3 <= s2


def test_all_duplicated_doc_cleans_to_empty(spark):
    two = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "u v w x y z q r")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_dup_spans(two, "doc_id", "text", N).collect()}
    assert out[0]["text"] == "" and out[0]["n_removed"] == 4
    assert out[1]["text"] == "" and out[1]["n_removed"] == 4
    assert out[2]["n_removed"] == 0
