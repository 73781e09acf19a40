"""TCT operator tests — pad tagging invariants (exactly two labels,
higher-left-charge gets 'left', utils.py:58-77) and normalization
fixpoints (metal median -> 0, silicon median -> 1, utils.py:79-116)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.tct import (
    apply_distance_calibration,
    normalize_collected_charge,
    tag_pads,
)


def _scan(spark):
    rows = []
    # channel 0 strong on the left half, channel 1 strong on the right
    for pos in range(20):
        rows.append((0, float(pos), 1.0 if pos < 10 else 0.0))
        rows.append((1, float(pos), 0.0 if pos < 10 else 1.0))
    return spark.createDataFrame(rows, "ch int, pos double, charge double")


def test_tag_pads_invariants(spark):
    out = {r["ch"]: r["Pad"] for r in tag_pads(_scan(spark), "ch", "pos", "charge").collect()}
    assert out == {0: "left", 1: "right"}
    # swap the charge pattern -> labels flip
    flipped = _scan(spark).withColumn("charge", 1.0 - F.col("charge"))
    out2 = {r["ch"]: r["Pad"] for r in tag_pads(flipped, "ch", "pos", "charge").collect()}
    assert out2 == {0: "right", 1: "left"}


def test_normalization_fixpoints(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "g": ["s"] * 200,
            "pos": np.linspace(0, 100, 200),
            "q": np.where(np.linspace(0, 100, 200) < 30, 5.0, 25.0)
            + rng.normal(0, 0.01, 200),
        }
    )
    out = normalize_collected_charge(
        spark.createDataFrame(pdf),
        ["g"],
        "q",
        metal_cond=F.col("pos") < 30,
        silicon_cond=F.col("pos") > 70,
        out="norm",
    ).toPandas()
    metal = out[out["pos"] < 30]["norm"]
    silicon = out[out["pos"] > 70]["norm"]
    assert abs(metal.median()) < 0.01
    assert abs(silicon.median() - 1.0) < 0.01


def test_distance_calibration(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (2.0,)], "x double")
    cal = spark.createDataFrame([(2.0, 1.0)], "scale double, offset double")
    out = sorted(
        r["x calibrated"] for r in apply_distance_calibration(df, cal, "x").collect()
    )
    assert out == [-2.0, 0.0, 2.0]
