"""LCS: known answers, unicode, empties, brute-force equality, and the
Spark pair operator."""

import random

from etl_market_survey_spark.operators.lcs import lcs_len, lcs_pairs


def _brute(a, b):
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_known_cases():
    assert lcs_len("banana", "ananas") == 5      # "anana"
    assert lcs_len("abcdef", "zabcy") == 3       # "abc"
    assert lcs_len("abc", "xyz") == 0
    assert lcs_len("", "abc") == 0 and lcs_len("abc", "") == 0
    assert lcs_len("same", "same") == 4
    assert lcs_len("Δt (s) αβγ", "xx αβγ yy") == 4  # " αβγ" (no char after γ in the left string)


def test_matches_brute_force():
    rng = random.Random(2)
    for _ in range(60):
        a = "".join(rng.choice("abC ") for _ in range(rng.randint(0, 25)))
        b = "".join(rng.choice("abC ") for _ in range(rng.randint(0, 25)))
        assert lcs_len(a, b) == _brute(a, b), (a, b)


def test_pairs_operator(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "a quick brow cat"), (3, "zzz")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): r.lcs_len
        for r in lcs_pairs(pairs, docs, "doc_id", "text").collect()
    }
    assert got == {(1, 2): len(" quick brow"), (1, 3): 0}
