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
