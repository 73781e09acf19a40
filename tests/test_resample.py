"""Grid resampling: known interpolation values, exact-hit reproduction,
tie rule, no extrapolation, layout invariance."""

from etl_market_survey_spark.operators.resample import resample_linear

NS = 1_000_000_000


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, k, t * NS, v) for i, (k, t, v) in enumerate(rows)],
        "event_id long, k string, ts long, value double",
    )


def _run(spark, rows, step_s):
    df = _mk(spark, rows)
    out = resample_linear(df, "k", "ts", "value", step_s * NS, seq_col="event_id")
    return {(r.k, r.ts_grid // NS): r.value for r in out.collect()}


def test_known_interpolation(spark):
    rows = [("a", 5, 0.0), ("a", 25, 10.0)]
    got = _run(spark, rows, 10)
    # grid points 10 and 20 inside span [5, 25]; linear v = (t-5)/2
    assert got == {("a", 10): 2.5, ("a", 20): 7.5}


def test_exact_hit_reproduces_value(spark):
    rows = [("a", 0, 1.25), ("a", 10, 7.5), ("a", 20, 3.0)]
    got = _run(spark, rows, 10)
    assert got[("a", 10)] == 7.5 and got[("a", 0)] == 1.25 and got[("a", 20)] == 3.0


def test_no_extrapolation(spark):
    rows = [("a", 12, 1.0), ("a", 17, 2.0)]
    # span [12, 17] contains no multiple of 10 -> empty
    assert _run(spark, rows, 10) == {}


def test_equal_ts_tie_rule(spark):
    # two events at t=0 (seq 0 then 1): forward fill takes the LAST
    # (seq=1, v=4.0); grid point at 0 must reproduce it
    rows = [("a", 0, 2.0), ("a", 0, 4.0), ("a", 10, 8.0)]
    got = _run(spark, rows, 10)
    assert got[("a", 0)] == 4.0 and got[("a", 10)] == 8.0


def test_layout_invariance(spark):
    import random

    rng = random.Random(17)
    rows = [
        (k, rng.randint(0, 1000), round(rng.uniform(-5, 5), 3))
        for k in ("a", "b", "c")
        for _ in range(50)
    ]
    df = _mk(spark, rows)
    a = resample_linear(df.repartition(13), "k", "ts", "value", 100 * NS, seq_col="event_id")
    b = resample_linear(df.coalesce(1), "k", "ts", "value", 100 * NS, seq_col="event_id")
    ka = sorted((r.k, r.ts_grid, r.value) for r in a.collect())
    kb = sorted((r.k, r.ts_grid, r.value) for r in b.collect())
    assert ka == kb


def test_interval_apportionment_known(spark):
    from etl_market_survey_spark.operators.intervals import (
        apportion_intervals,
        bucket_totals,
    )

    rows = [
        (1, 5, 25),    # spans buckets 0,1,2 with 5/10/5
        (2, 10, 20),   # exactly bucket 1
        (3, 7, 7),     # zero-length -> nothing
        (4, 29, 31),   # crosses 2|3 boundary: 1/1
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    ap = apportion_intervals(df, "s", "e", 10, keep_cols=("id",))
    got = {(r.id, r.bucket): r.overlap_ns for r in ap.collect()}
    assert got == {
        (1, 0): 5, (1, 1): 10, (1, 2): 5,
        (2, 1): 10,
        (4, 2): 1, (4, 3): 1,
    }
    # conservation: per-interval overlap sums equal interval lengths
    totals = {r.bucket: (r.total_ns, r.n_intervals) for r in bucket_totals(ap).collect()}
    assert totals == {0: (5, 1), 1: (20, 2), 2: (6, 2), 3: (1, 1)}


def test_interval_conservation_randomized(spark):
    import random

    from etl_market_survey_spark.operators.intervals import apportion_intervals
    from pyspark.sql import functions as F

    rng = random.Random(77)
    rows = [(i, rng.randint(0, 500), rng.randint(0, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    ap = apportion_intervals(df, "s", "e", 37, keep_cols=("id",))
    per_iv = {r.id: r.t for r in ap.groupBy("id").agg(F.sum("overlap_ns").alias("t")).collect()}
    for i, s, e in rows:
        assert per_iv.get(i, 0) == max(0, e - s), (i, s, e)
