"""TF-IDF vectors + posting-list cosine (operators/tfidf.py)."""

import math

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.tfidf import (
    tfidf_cosine_pairs,
    tfidf_postings,
    tfidf_topk_neighbors,
)

DOCS = [
    (0, "apple apple banana"),
    (1, "apple banana cherry"),
    (2, "durian durian durian"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_vectors_hand_computed(spark, docs):
    post = {(r["doc_id"], r["term"]): r["w"] for r in tfidf_postings(docs).collect()}
    n = 3
    idf = {
        "apple": round(math.log((1 + n) / (1 + 2)) + 1, 9),
        "banana": round(math.log((1 + n) / (1 + 2)) + 1, 9),
        "cherry": round(math.log((1 + n) / (1 + 1)) + 1, 9),
        "durian": round(math.log((1 + n) / (1 + 1)) + 1, 9),
    }
    w0 = {  # doc 0: tf(apple)=2, tf(banana)=1
        (0, "apple"): round(2 * idf["apple"], 9),
        (0, "banana"): round(1 * idf["banana"], 9),
    }
    nrm = math.sqrt(
        sum(math.floor(v * v * 1e6) for v in w0.values()) / 1e6
    )
    for k, v in w0.items():
        assert post[k] == pytest.approx(round(v / round(nrm, 9), 9), abs=1e-9)
    # unit norm (within the 1e-6 truncation semantics of dsum)
    for d in (0, 1, 2):
        s = sum(v * v for (doc, _), v in post.items() if doc == d)
        assert s == pytest.approx(1.0, abs=1e-4)


def test_df_pruning(spark, docs):
    # apple & banana have df=2; min_df=2 keeps only them, doc 2 vanishes
    post = tfidf_postings(docs, min_df=2)
    assert {r["term"] for r in post.collect()} == {"apple", "banana"}
    assert {r["doc_id"] for r in post.collect()} == {0, 1}
    # max_df_frac below 2/3 prunes df=2 terms instead
    post2 = tfidf_postings(docs, max_df_frac=0.5)
    assert {r["term"] for r in post2.collect()} == {"cherry", "durian"}


def test_cosine_pairs(spark, docs):
    post = tfidf_postings(docs)
    pairs = {(r["id_a"], r["id_b"]): r["sim"] for r in tfidf_cosine_pairs(post, -1.0).collect()}
    # docs 0,1 share apple+banana; doc 2 shares nothing
    assert set(pairs) == {(0, 1)}
    assert 0.0 < pairs[(0, 1)] < 1.0
    # identical docs -> sim ~ 1
    twins = spark.createDataFrame(
        [(0, "x y z"), (1, "x y z"), (2, "q r s")], "doc_id long, text string"
    )
    tp = {(r["id_a"], r["id_b"]): r["sim"] for r in
          tfidf_cosine_pairs(tfidf_postings(twins), -1.0).collect()}
    assert tp[(0, 1)] == pytest.approx(1.0, abs=1e-4)


def test_topk_symmetric_and_ranked(spark, sf_dir):
    from etl_market_survey_spark.sources.readers import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").limit(60)
    post = tfidf_postings(docs)
    nn = tfidf_topk_neighbors(post, k=3).collect()
    by_id = {}
    for r in nn:
        by_id.setdefault(r["id"], []).append((r["rank"], r["sim"], r["neighbor"]))
    for rows in by_id.values():
        rows.sort()
        assert len(rows) <= 3
        sims = [s for _, s, _ in rows]
        assert sims == sorted(sims, reverse=True)
        assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))


def test_phrase_match_counts_overlaps_and_repeats(spark):
    from etl_market_survey_spark.operators.phrasesearch import (
        phrase_match_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),       # "a b a": overlapping matches at 0 and 2
            (2, "a b c"),
            (3, "b a b"),
            (4, "x y z"),
            (5, "A  B   a"),        # case/whitespace-normalized tokenizer
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_matches for r in phrase_match_counts(docs, "a b a").collect()}
    assert out == {1: 2, 5: 1}  # doc 5 tokenizes to [a, b, a]
    out2 = {r.doc_id: r.n_matches for r in phrase_match_counts(docs, "a b").collect()}
    assert out2 == {1: 2, 2: 1, 3: 1, 5: 1}

    # cross-engine parity on the same frame
    import duckdb

    from etl_market_survey_spark.operators.phrasesearch import (
        sql_phrase_match_counts,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(r.doc_id, r.text) for r in docs.collect()],
    )
    oracle = dict(
        con.execute(
            sql_phrase_match_counts("documents", "doc_id", "text", "a b a")
        ).fetchall()
    )
    assert oracle == out
