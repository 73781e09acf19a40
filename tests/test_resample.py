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
