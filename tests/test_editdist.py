"""Edit-distance similarity join: randomized brute-force equality
(filters only prune), shorts fallback, known pairs."""

import itertools
import random

from etl_market_survey_spark.operators.editdist import (
    edit_distance_self_join,
    positional_qgrams,
)
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    return {
        (ia, ib, _lev(ta, tb))
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2)
        if _lev(ta, tb) <= d
    }


def _run(spark, rows, d):
    df = spark.createDataFrame(rows, "id long, txt string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "id", "txt", d=d).collect()
    }
    assert got == _brute(rows, d), (d, got ^ _brute(rows, d))


def test_known_pairs(spark):
    rows = [
        (1, "kitten"),
        (2, "sitten"),   # d(1,2)=1
        (3, "sitting"),  # d(2,3)=2
        (4, "kitten"),   # d(1,4)=0
        (5, "mitten"),   # d(1,5)=1, d(2,5)=1
        (6, "zebra"),
    ]
    _run(spark, rows, 1)
    _run(spark, rows, 2)


def test_randomized_brute_force_equality(spark):
    rng = random.Random(7)
    # short alphabet + short strings -> dense near-pairs, exercises both
    # the gram index and the shorts fallback (lengths 1..3 at q=2,d>=1)
    rows = [
        (
            i,
            "".join(rng.choice("ab0") for _ in range(rng.randint(1, 10))),
        )
        for i in range(120)
    ]
    for d in (1, 2):
        _run(spark, rows, d)


def test_duplicate_heavy_strings(spark):
    # repeated grams ("00") — the case where a distinct-gram count filter
    # would produce false negatives; ours must not
    rows = [(i, f"Customer#{i:09d}") for i in (1, 2, 11, 100, 101, 110)]
    _run(spark, rows, 1)
    _run(spark, rows, 2)


def test_positional_qgrams_shape(spark):
    df = spark.createDataFrame([("abcd",), ("a",)], "s string")
    got = df.select(positional_qgrams(F.col("s"), 2).alias("g")).collect()
    assert [tuple(x) for x in got[0].g] == [("ab", 1), ("bc", 2), ("cd", 3)]
    assert got[1].g == []
