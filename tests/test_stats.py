"""Unit tests for the stats kernel.

The mean_std golden reproduces the reference's docstring worked example
(reference: utils.py:120-138) — grouped mean/std/median/MAD_std with
flattened "{col} {stat}" names.
"""

import math

import numpy as np
import pandas as pd
import pytest

from etl_market_survey_spark.functions.stats import (
    K_MAD_TO_STD,
    davg,
    dstd,
    dsum,
    ecdf,
    group_mad,
    mean_std,
)


def test_mean_std_docstring_golden(spark):
    # The reference's exact worked example (utils.py:120-138):
    # groupby ['n','x'] over y -> documented 'y mean'/'y std' values.
    pdf = pd.DataFrame(
        {
            "n": [1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4],
            "x": [0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3],
            "y": [1.0, 2, 1, 1, 2, 3, 3, 3, 4, 3, 4, 5],
        }
    )
    out = (
        mean_std(spark.createDataFrame(pdf), by=["n", "x"], cols=["y"])
        .orderBy("n")
        .toPandas()
    )
    assert out["y mean"].tolist() == pytest.approx(
        [1.250000, 2.666667, 3.333333, 4.500000], abs=1e-5
    )
    assert out["y std"].tolist() == pytest.approx(
        [0.500000, 0.577350, 0.577350, 0.707107], abs=1e-4
    )


def test_mean_std_golden(spark):
    # Mirrors utils.py:120-138: two groups over a value column.
    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 5 + ["b"] * 5,
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    out = (
        mean_std(spark.createDataFrame(pdf), by=["grp"], cols=["x"])
        .orderBy("grp")
        .toPandas()
        .set_index("grp")
    )
    g = pdf.groupby("grp")["x"]
    for grp in ["a", "b"]:
        vals = g.get_group(grp)
        assert out.loc[grp, "x mean"] == pytest.approx(vals.mean(), abs=1e-5)
        assert out.loc[grp, "x std"] == pytest.approx(vals.std(ddof=1), abs=1e-4)
        assert out.loc[grp, "x median"] == pytest.approx(vals.median())
        mad = np.median(np.abs(vals - vals.median()))
        assert out.loc[grp, "x MAD_std"] == pytest.approx(K_MAD_TO_STD * mad)


def test_mad_approximates_sigma_on_normal(spark):
    # Property (SURVEY §5.4): MAD_std ≈ σ for normal samples.
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame({"x": rng.normal(loc=5.0, scale=2.0, size=20000)})
    out = group_mad(spark.createDataFrame(pdf), [], "x", "mad_std").collect()[0]
    assert out["mad_std"] == pytest.approx(2.0, rel=0.05)


def test_deterministic_sum_partition_invariance(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"x": rng.uniform(0, 1e5, size=50000)})
    df = spark.createDataFrame(pdf)
    a = df.repartition(1).agg(dsum("x").alias("s")).collect()[0]["s"]
    b = df.repartition(37).agg(dsum("x").alias("s")).collect()[0]["s"]
    assert a == b  # bit-identical regardless of partitioning
    assert a == pytest.approx(pdf["x"].sum(), rel=1e-9)


def test_ecdf_matches_statsmodels_semantics(spark):
    pdf = pd.DataFrame({"g": ["d1"] * 6, "x": [3.0, 1.0, 2.0, 2.0, 5.0, 4.0]})
    out = ecdf(spark.createDataFrame(pdf), ["g"], "x").orderBy("x", "ecdf").toPandas()
    # ECDF(x) = P(X <= x): ties share the max rank (statsmodels convention).
    expected = [1 / 6, 3 / 6, 3 / 6, 4 / 6, 5 / 6, 6 / 6]
    assert out["ecdf"].tolist() == pytest.approx(expected)
