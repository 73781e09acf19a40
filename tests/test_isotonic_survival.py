"""Property tests: isotonic fit invariants, Kaplan-Meier curve shape."""

import random

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.isotonic import isotonic_fit
from etl_market_survey_spark.operators.survival import kaplan_meier


def _noisy(spark, seed=13, n=200):
    rng = random.Random(seed)
    rows = [
        ("g", i % 25, 0.3 * (i % 25) + rng.uniform(-2, 2)) for i in range(n)
    ]
    return spark.createDataFrame(rows, "g string, x int, y double")


def test_isotonic_output_is_monotone_and_mean_preserving(spark):
    df = _noisy(spark)
    out = (
        isotonic_fit(df, ["g"], "x", "y")
        .orderBy("x")
        .collect()
    )
    fitted = [r.y_iso for r in out]
    assert all(a <= b for a, b in zip(fitted, fitted[1:])), fitted
    # weighted mean preservation (PAVA conserves the total on the grid)
    tot_fit = sum(r.y_iso * r.n for r in out)
    tot_mean = sum(r.y_mean * r.n for r in out)
    assert abs(tot_fit - tot_mean) < 1e-6 * sum(r.n for r in out)


def test_isotonic_idempotent_on_monotone_input(spark):
    rows = [("g", i, float(i) * 0.5) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = isotonic_fit(df, ["g"], "x", "y").orderBy("x").collect()
    for r in out:
        assert r.y_iso == r.y_mean  # already monotone -> untouched


def test_km_curve_is_nonincreasing_in_unit_interval(spark):
    rng = random.Random(7)
    rows = [
        ("c", rng.randint(1, 20), rng.randint(0, 1)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    out = kaplan_meier(df, ["g"], "dur", "ev").orderBy("dur").collect()
    surv = [r.surv for r in out]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:])), surv
    # risk sets shrink as duration grows
    risk = [r.n_at_risk for r in out]
    assert all(a >= b for a, b in zip(risk, risk[1:]))


def test_km_all_die_at_last_duration_pins_surv_to_zero(spark):
    """d == n at the largest event time (no later censoring): S(t) = 0
    exactly, with a NULL log_surv sentinel — and the DuckDB mirror agrees
    instead of raising on LN(0) (ADVICE r2 item 1)."""
    import duckdb

    from etl_market_survey_spark.operators.survival import sql_kaplan_meier

    rows = (
        [("c", 1, 0), ("c", 2, 1), ("c", 2, 0)]
        + [("c", 5, 1)] * 4  # everyone still at risk dies at t=5
    )
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    out = kaplan_meier(df, ["g"], "dur", "ev").orderBy("dur").collect()
    assert out[-1].dur == 5
    assert out[-1].surv == 0.0
    assert out[-1].log_surv is None
    assert all(r.surv > 0.0 for r in out[:-1])

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (g VARCHAR, dur INTEGER, ev INTEGER)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = sql_kaplan_meier("t", "g", "dur", "ev") + " ORDER BY dur"
    oracle = con.execute(sql).fetchall()
    got = [(r.dur, r.n_at_risk, r.d_events, r.log_surv, r.surv) for r in out]
    want = [(d, n, e, ls, s) for (_, d, n, e, ls, s) in oracle]
    assert got == want
