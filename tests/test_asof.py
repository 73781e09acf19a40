"""As-of join semantics (backward, <=, per-key, tolerance) and
sessionization boundaries."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.asof import asof_join, sessionize


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u2", 5, "p3"), ("u1", 3, "p4")],
        "user string, t long, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 4, 1.0), ("u1", 10, 2.0), ("u1", 15, 3.0), ("u2", 9, 4.0)],
        "user string, t long, v double",
    )
    return left, right


def test_asof_backward_semantics(spark, frames):
    left, right = frames
    out = {
        r["pid"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(left, right, on="t", by=["user"], value_cols=["v"]).collect()
    }
    assert out["p1"] == (10, 2.0)   # equal timestamp matches (<=)
    assert out["p2"] == (15, 3.0)   # latest at-or-before 20
    assert out["p3"] == (None, None)  # u2 has no right row <= 5
    assert out["p4"] == (None, None)  # before any right row


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {
        r["pid"]: r["v_asof"]
        for r in asof_join(
            left, right, on="t", by=["user"], value_cols=["v"], tolerance=2
        ).collect()
    }
    assert out["p1"] == 2.0    # lag 0 <= 2
    assert out["p2"] is None   # lag 5 > 2 -> nulled
    assert out["p4"] is None


def test_sessionize_boundaries(spark):
    df = spark.createDataFrame(
        [("u", t) for t in [0, 10, 25, 100, 105, 300]], "user string, t long"
    )
    out = (
        sessionize(df, ["user"], "t", gap=20)
        .orderBy("t")
        .select("t", "session_id")
        .collect()
    )
    sessions = [r["session_id"] for r in out]
    # gaps: 10, 15 (<=20: same), 75 (new), 5 (same), 195 (new)
    assert sessions == [1, 1, 1, 2, 2, 3]


def test_asof_forward_and_nearest(spark):
    from etl_market_survey_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 25), ("k", 40)], "g string, us long"
    )
    right = spark.createDataFrame(
        [("k", 8), ("k", 22), ("k", 30)], "g string, us long"
    )
    fwd = {
        r.us: r.us_f
        for r in asof_join(
            left, right, "us", ["g"], value_cols=[], suffix="_f",
            direction="forward",
        ).collect()
    }
    assert fwd == {10: 22, 25: 30, 40: None}

    near = {
        r.us: r.us_n
        for r in asof_join(
            left, right, "us", ["g"], value_cols=[], suffix="_n",
            direction="nearest",
        ).collect()
    }
    # 10: bwd 8 (gap 2) vs fwd 22 (gap 12) -> 8
    # 25: bwd 22 (gap 3) vs fwd 30 (gap 5) -> 22
    # 40: only bwd 30
    assert near == {10: 8, 25: 22, 40: 30}

    # equal-timestamp tie matches in BOTH directions (<= and >=)
    eq = spark.createDataFrame([("k", 22)], "g string, us long")
    row = asof_join(
        eq, right, "us", ["g"], value_cols=[], suffix="_f",
        direction="forward",
    ).collect()[0]
    assert row.us_f == 22

    # tolerance nulls far-away forward matches
    tol = {
        r.us: r.us_f
        for r in asof_join(
            left, right, "us", ["g"], value_cols=[], tolerance=5,
            suffix="_f", direction="forward",
        ).collect()
    }
    assert tol == {10: None, 25: 30, 40: None}
