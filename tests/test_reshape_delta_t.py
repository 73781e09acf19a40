"""Pivot/melt round-trip identity (reference utils.py:9-21) and Δt grid
properties (reference time_resolution_beta_scan.py:32-55): 81 rows per
trigger, antisymmetry Δt(k1,k2) = -Δt(k2,k1) under pulse swap."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.delta_t import (
    THRESHOLDS,
    best_threshold_pair,
    delta_t_grid,
    mad_per_threshold_pair,
)
from etl_market_survey_spark.operators.reshape import melt, pivot_wide


def test_pivot_melt_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "n_trigger": [0, 0, 1, 1, 2, 2],
            "device_name": ["A", "B"] * 3,
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    df = spark.createDataFrame(pdf)
    wide = pivot_wide(df, ["n_trigger"], "device_name", ["x"], ["A", "B"])
    assert set(wide.columns) == {"n_trigger", "x_A", "x_B"}
    long = melt(wide, ["n_trigger"], ["x_A", "x_B"], "device_name", "x")
    long = long.withColumn("device_name", F.expr("substring(device_name, 3)"))
    back = long.orderBy("n_trigger", "device_name").toPandas()
    orig = pdf.sort_values(["n_trigger", "device_name"], ignore_index=True)
    pd.testing.assert_frame_equal(
        back[["n_trigger", "device_name", "x"]], orig, check_dtype=False
    )


@pytest.fixture()
def pulses(spark):
    return spark.createDataFrame(
        [(0, 10.0, 11.0), (1, 20.0, 19.0), (2, 30.0, 30.5)],
        "trig long, t1 double, t2 double",
    )


def test_delta_t_grid_shape(spark, pulses):
    dt = delta_t_grid(pulses, "trig", "t1", "t2")
    assert dt.count() == 3 * 81  # 9x9 grid per trigger
    per = dt.groupBy("trig").count().collect()
    assert all(r["count"] == 81 for r in per)


def test_delta_t_antisymmetry(spark, pulses):
    dt = delta_t_grid(pulses, "trig", "t1", "t2").toPandas()
    swapped = delta_t_grid(
        pulses.select("trig", F.col("t2").alias("t1"), F.col("t1").alias("t2")),
        "trig", "t1", "t2",
    ).toPandas()
    merged = dt.merge(
        swapped,
        left_on=["trig", "k_1 (%)", "k_2 (%)"],
        right_on=["trig", "k_2 (%)", "k_1 (%)"],
        suffixes=("", "_sw"),
    )
    assert (merged["Δt (s)"] == -merged["Δt (s)_sw"]).all()


def test_best_threshold_pair_deterministic(spark, pulses):
    mad = mad_per_threshold_pair(delta_t_grid(pulses, "trig", "t1", "t2"))
    best = best_threshold_pair(mad).collect()
    assert len(best) == 1
    assert best[0]["k_1 (%)"] in THRESHOLDS and best[0]["k_2 (%)"] in THRESHOLDS
