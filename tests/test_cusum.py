"""CUSUM detector: hand-computed recurrence, reset behavior, alarm
threshold, and partition-layout invariance."""

from etl_market_survey_spark.operators.cusum import cusum_per_key

ROWS = [
    # (key, t, x) — k=10: drift starts at t=4
    ("a", 1, 8.0),
    ("a", 2, 9.0),
    ("a", 3, 7.0),
    ("a", 4, 15.0),
    ("a", 5, 14.0),
    ("a", 6, 16.0),
    ("b", 1, 30.0),
    ("b", 2, 1.0),
]


def _run(spark, df):
    out = cusum_per_key(df, "k", ["t"], "x", k=10.0, h=8.0).collect()
    return {(r.k, r.t): (r.cusum, r.alarm) for r in out}


def test_cusum_hand_computed(spark):
    df = spark.createDataFrame(ROWS, "k string, t long, x double")
    got = _run(spark, df)
    # a: s = 0,0,0 (below k resets to 0), then 5, 9, 15
    assert got[("a", 1)] == (0.0, False)
    assert got[("a", 2)] == (0.0, False)
    assert got[("a", 3)] == (0.0, False)
    assert got[("a", 4)] == (5.0, False)
    assert got[("a", 5)] == (9.0, True)
    assert got[("a", 6)] == (15.0, True)
    # b: 20 (alarm), then 20 + (1-10) = 11 (still above h)
    assert got[("b", 1)] == (20.0, True)
    assert got[("b", 2)] == (11.0, True)


def test_cusum_partition_invariant(spark):
    df = spark.createDataFrame(ROWS, "k string, t long, x double")
    assert _run(spark, df) == _run(spark, df.repartition(7))


def test_ewma_hand_computed_and_invariant(spark):
    from etl_market_survey_spark.operators.cusum import ewma_per_key

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 0.0)], "k string, t long, x double"
    )
    got = {
        r.t: r.ewma
        for r in ewma_per_key(df, "k", ["t"], "x", alpha=0.5).collect()
    }
    assert got == {1: 10.0, 2: 15.0, 3: 7.5}
    got2 = {
        r.t: r.ewma
        for r in ewma_per_key(df.repartition(5), "k", ["t"], "x", 0.5).collect()
    }
    assert got == got2
