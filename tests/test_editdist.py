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


def test_fastss_equals_edjoin_paths(spark):
    """The d<=2 deletion-neighborhood path and the q-gram Ed-Join path
    must produce identical pair sets (both are exact)."""
    import random

    from etl_market_survey_spark.operators.editdist import (
        _editdist_fastss,
        edit_distance_self_join,
    )

    rng = random.Random(13)
    alpha = "abcd"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(4, 9))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 2):
        fast = sorted(
            map(tuple, _editdist_fastss(df, "id", "s", d).collect())
        )
        # force the Ed-Join path by calling with d>2 machinery: rebuild
        # via the module's internal long/short construction using d
        # through the public API is the fastss path now, so compare
        # against a brute-force oracle instead
        from pyspark.sql import functions as F

        a, b = df.alias("a"), df.alias("b")
        brute = sorted(
            map(
                tuple,
                a.join(b, F.col("a.id") < F.col("b.id"))
                .withColumn("dist", F.levenshtein("a.s", "b.s", d))
                .filter(F.col("dist") >= 0)
                .select(
                    F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("dist").cast("long").alias("dist"),
                )
                .collect(),
            )
        )
        assert fast == brute, f"d={d}"


def test_editdist_d0_exact_duplicates(spark):
    from etl_market_survey_spark.operators.editdist import edit_distance_self_join

    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "ab"), (4, "aa")], "id long, s string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "id", "s", 0).collect()
    )
    assert got == [(1, 2, 0), (1, 4, 0), (2, 4, 0)]


def test_auto_dispatch_uses_edjoin_on_long_strings(spark):
    """Documents (long strings) must not take the FastSS variant
    explosion; short keys must."""
    from etl_market_survey_spark.operators.editdist import (
        edit_distance_self_join,
    )

    long_df = spark.createDataFrame(
        [(1, "x" * 2000), (2, "x" * 2000)], "id long, s string"
    )
    plan = edit_distance_self_join(
        long_df, "id", "s", d=2
    )._jdf.queryExecution().optimizedPlan().toString()
    # Ed-Join signature: gram frequency ranking window; FastSS has none
    assert "row_number" in plan
    short_df = spark.createDataFrame([(1, "ab"), (2, "ac")], "id long, s string")
    plan2 = edit_distance_self_join(
        short_df, "id", "s", d=1
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan2
