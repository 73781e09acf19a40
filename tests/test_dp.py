"""Differentially-private release (operators/dp): noise mechanism
correctness, budget split, key-domain hygiene, SQL-mirror parity, and
determinism under re-partitioning."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.dp import (
    dp_release,
    laplace_noise,
    sql_dp_release,
    sql_laplace,
)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [("a", float(i % 50)) for i in range(400)] + [
        ("b", float(i % 30)) for i in range(200)
    ]
    return spark.createDataFrame(rows, "g string, x double")


def test_laplace_noise_is_laplace(spark):
    """Over many keys the seeded draws behave like Laplace(0, b):
    symmetric, mean ~0, mean |noise| ~ b."""
    b = 3.0
    df = spark.range(4000).select(F.col("id").cast("string").alias("k"))
    vals = np.array(
        [
            r["n"]
            for r in df.select(
                laplace_noise(F.col("k"), "count", b, seed=7).alias("n")
            ).collect()
        ]
    )
    assert abs(vals.mean()) < 0.25
    assert abs(np.abs(vals).mean() - b) < 0.25
    assert 0.45 < (vals > 0).mean() < 0.55


def test_noise_scales_linearly_with_budget(spark):
    """Same (seed, stat, key) uniform -> noise is proportional to the
    scale, so doubling epsilon exactly halves every perturbation."""
    df = spark.createDataFrame([("k1",), ("k2",)], "k string")
    n1 = df.select(laplace_noise(F.col("k"), "count", 4.0, 1).alias("n")).collect()
    n2 = df.select(laplace_noise(F.col("k"), "count", 2.0, 1).alias("n")).collect()
    for a, b in zip(n1, n2):
        assert a["n"] == pytest.approx(2 * b["n"], abs=2e-6)


def test_dp_release_shape_and_determinism(spark, toy):
    out = dp_release(
        toy, ["g"], epsilon=2.0, sums={"x": (0.0, 40.0)}, seed=11
    )
    pdf = out.orderBy("g").toPandas()
    assert list(pdf.columns) == ["g", "noisy_count", "noisy_sum_x"]
    assert len(pdf) == 2
    # partitioning-invariant
    pdf2 = (
        dp_release(
            toy.repartition(13), ["g"], epsilon=2.0,
            sums={"x": (0.0, 40.0)}, seed=11,
        )
        .orderBy("g")
        .toPandas()
    )
    pd.testing.assert_frame_equal(pdf, pdf2)
    # noisy values sit near the clipped truth (eps=1 per stat here)
    truth = (
        toy.groupBy("g")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.least(F.col("x"), F.lit(40.0))).alias("s"),
        )
        .orderBy("g")
        .toPandas()
    )
    assert np.allclose(pdf["noisy_count"], truth["n"], atol=30.0)
    assert np.allclose(pdf["noisy_sum_x"], truth["s"], atol=1200.0)


def test_key_domain_releases_absent_groups(spark, toy):
    domain = spark.createDataFrame([("a",), ("b",), ("ghost",)], "g string")
    out = (
        dp_release(toy, ["g"], epsilon=1.0, key_domain=domain, seed=3)
        .orderBy("g")
        .toPandas()
    )
    assert list(out["g"]) == ["a", "b", "ghost"]
    ghost = out[out["g"] == "ghost"]["noisy_count"].iloc[0]
    # pure noise around zero: exactly the laplace draw for that key
    want = (
        spark.createDataFrame([("ghost",)], "g string")
        .select(laplace_noise(F.col("g"), "count", 1.0, 3).alias("n"))
        .collect()[0]["n"]
    )
    assert ghost == pytest.approx(want, abs=2e-6)


def test_dp_release_validation(spark, toy):
    with pytest.raises(ValueError, match="positive"):
        dp_release(toy, ["g"], epsilon=0.0)
    with pytest.raises(ValueError, match="nothing to release"):
        dp_release(toy, ["g"], epsilon=1.0, count=False)
    with pytest.raises(ValueError, match="lo < hi"):
        dp_release(toy, ["g"], epsilon=1.0, sums={"x": (5.0, 5.0)})
    bad = spark.createDataFrame([("a", 1)], "g string, extra int")
    with pytest.raises(ValueError, match="group columns"):
        dp_release(toy, ["g"], epsilon=1.0, key_domain=bad)


def test_sql_mirror_matches_spark(spark, toy):
    got = (
        dp_release(toy, ["g"], epsilon=1.5, sums={"x": (0.0, 40.0)}, seed=9)
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("src", toy.toPandas())
    body = sql_dp_release(
        "src", ["g"], epsilon=1.5, sums={"x": (0.0, 40.0)}, seed=9
    )
    want = con.sql(f"SELECT * FROM ({body}) ORDER BY g").df()
    assert np.allclose(got["noisy_count"], want["noisy_count"])
    assert np.allclose(got["noisy_sum_x"], want["noisy_sum_x"])


def test_sql_laplace_matches_spark_pointwise(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(64)], "k string")
    got = [
        r["n"]
        for r in df.select(
            laplace_noise(F.col("k"), "sum_x", 7.5, 42).alias("n")
        ).orderBy("k").collect()
    ]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    expr = sql_laplace("k", "sum_x", 7.5, 42)
    want = [r[0] for r in con.sql(f"SELECT {expr} FROM t ORDER BY k").fetchall()]
    assert got == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# Exponential-mechanism quantile (dp_quantile)
# ---------------------------------------------------------------------------


def test_dp_quantile_near_truth_and_deterministic(spark, toy):
    from etl_market_survey_spark.operators.dp import dp_quantile

    got = (
        dp_quantile(toy, ["g"], "x", 0.5, epsilon=4.0, lo=0.0, hi=50.0,
                    m=50, seed=5)
        .orderBy("g")
        .toPandas()
    )
    true = (
        toy.groupBy("g")
        .agg(F.expr("percentile(x, 0.5)").alias("med"))
        .orderBy("g")
        .toPandas()
    )
    # high budget + fine grid: lands within a few grid steps of truth
    assert (abs(got["dp_q"] - true["med"]) <= 5.0).all()
    # partitioning-invariant
    got2 = (
        dp_quantile(toy.repartition(9), ["g"], "x", 0.5, epsilon=4.0,
                    lo=0.0, hi=50.0, m=50, seed=5)
        .orderBy("g")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, got2)
    # different seed may pick a different (still nearby) candidate;
    # the mechanism is a draw, not an argmax
    got3 = (
        dp_quantile(toy, ["g"], "x", 0.5, epsilon=4.0, lo=0.0, hi=50.0,
                    m=50, seed=1234)
        .orderBy("g")
        .toPandas()
    )
    assert (abs(got3["dp_q"] - true["med"]) <= 8.0).all()


def test_dp_quantile_validation(spark, toy):
    from etl_market_survey_spark.operators.dp import dp_quantile

    with pytest.raises(ValueError, match="q must be"):
        dp_quantile(toy, ["g"], "x", 1.5, epsilon=1.0, lo=0.0, hi=1.0)
    with pytest.raises(ValueError, match="positive"):
        dp_quantile(toy, ["g"], "x", 0.5, epsilon=0.0, lo=0.0, hi=1.0)
    with pytest.raises(ValueError, match="lo < hi"):
        dp_quantile(toy, ["g"], "x", 0.5, epsilon=1.0, lo=1.0, hi=1.0)
    with pytest.raises(ValueError, match="m >= 1"):
        dp_quantile(toy, ["g"], "x", 0.5, epsilon=1.0, lo=0.0, hi=1.0, m=0)


def test_dp_quantile_sql_mirror(spark, toy):
    import duckdb

    from etl_market_survey_spark.operators.dp import (
        dp_quantile,
        sql_dp_quantile,
    )

    got = (
        dp_quantile(toy, ["g"], "x", 0.25, epsilon=2.0, lo=0.0, hi=50.0,
                    m=40, seed=3)
        .orderBy("g")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("src", toy.toPandas())
    sql = sql_dp_quantile("src", ["g"], "x", 0.25, epsilon=2.0, lo=0.0,
                          hi=50.0, m=40, seed=3)
    want = con.sql(f"SELECT * FROM ({sql}) ORDER BY g").df()
    assert np.allclose(got["dp_q"], want["dp_q"])
