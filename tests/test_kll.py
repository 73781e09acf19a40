"""KLL sketch: rank-error bounds, merge validity, grouped aggregate,
and the sketch-guided exact path (bit-identical to a full sort)."""

import math

import numpy as np
import pytest

from etl_market_survey_spark.operators.kll import (
    KllSketch,
    grouped_quantile_estimates,
    kll_build,
    kll_build_grouped,
    kll_exact_quantiles,
)


def _true_rank(sorted_vals: np.ndarray, v: float) -> tuple[int, int]:
    """[min, max] true rank of v (1-based) — duplicates give a range."""
    lo = int(np.searchsorted(sorted_vals, v, side="left")) + 1
    hi = int(np.searchsorted(sorted_vals, v, side="right"))
    return lo, max(lo, hi)


def _datasets(rng):
    return {
        "uniform": rng.uniform(0, 1, 20_000),
        "lognormal": rng.lognormal(0, 2, 20_000),
        "constant": np.full(5_000, 3.14),
        "few_distinct": rng.choice([1.0, 2.0, 5.0, 9.0], 30_000),
        "tiny": rng.normal(size=7),
    }


def test_sketch_rank_error_within_slack():
    rng = np.random.default_rng(42)
    for name, data in _datasets(rng).items():
        sk = KllSketch(256)
        sk.update_many(data)
        assert sk.n == len(data)
        s = np.sort(data)
        slack = sk.rank_slack()
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            r = max(1, math.ceil(q * sk.n))
            got = sk.quantile(q)
            rlo, rhi = _true_rank(s, got)
            assert rlo - slack <= r <= rhi + slack, (name, q)


def test_merge_matches_bulk_build():
    rng = np.random.default_rng(7)
    a, b = rng.normal(size=15_000), rng.lognormal(size=10_000)
    ska, skb = KllSketch(256), KllSketch(256)
    ska.update_many(a)
    skb.update_many(b)
    merged = ska.merge(skb)
    assert merged.n == 25_000
    s = np.sort(np.concatenate([a, b]))
    slack = merged.rank_slack()
    for q in (0.1, 0.5, 0.9):
        r = math.ceil(q * merged.n)
        rlo, rhi = _true_rank(s, merged.quantile(q))
        assert rlo - slack <= r <= rhi + slack


def test_serialization_roundtrip():
    rng = np.random.default_rng(3)
    sk = KllSketch(128)
    sk.update_many(rng.uniform(size=9_000))
    n, items, weights = sk.to_row()
    back = KllSketch.from_row(128, n, items, weights)
    assert back.n == sk.n
    assert abs(back.quantile(0.5) - sk.quantile(0.5)) <= 0.05


def test_spark_build_matches_local(spark):
    rng = np.random.default_rng(11)
    data = rng.lognormal(0, 1, 40_000)
    df = spark.createDataFrame([(float(v),) for v in data], "x double").repartition(8)
    sk = kll_build(df, "x", k=256)
    assert sk.n == len(data)
    s = np.sort(data)
    slack = sk.rank_slack()
    for q in (0.25, 0.5, 0.95):
        r = math.ceil(q * sk.n)
        rlo, rhi = _true_rank(s, sk.quantile(q))
        assert rlo - slack <= r <= rhi + slack


def test_grouped_sketch_aggregate(spark):
    rng = np.random.default_rng(5)
    rows = []
    groups = {"a": rng.uniform(0, 1, 8_000), "b": rng.normal(10, 2, 12_000), "c": np.full(500, 7.0)}
    for g, vals in groups.items():
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, x double").repartition(16)
    sketches = kll_build_grouped(df, ["g"], "x", k=128)
    est = {
        r["g"]: r
        for r in grouped_quantile_estimates(sketches, ["g"], [0.5, 0.9]).collect()
    }
    assert set(est) == set(groups)
    for g, vals in groups.items():
        assert est[g]["n"] == len(vals)
        s = np.sort(vals)
        slack = math.ceil(6.0 * len(vals) / 128) + 64  # mirror rank_slack scale
        for qname, q in (("q50", 0.5), ("q90", 0.9)):
            rlo, rhi = _true_rank(s, est[g][qname])
            r = math.ceil(q * len(vals))
            assert rlo - slack <= r <= rhi + slack, (g, qname)


def _disc_quantile(sorted_vals: np.ndarray, q: float) -> float:
    r = max(1, math.ceil(q * len(sorted_vals)))
    return float(sorted_vals[r - 1])


@pytest.mark.parametrize("dist", ["uniform", "few_distinct", "constant"])
def test_exact_quantiles_bit_identical(spark, dist):
    rng = np.random.default_rng(17)
    data = _datasets(rng)[dist]
    df = spark.createDataFrame([(float(v),) for v in data], "x double").repartition(8)
    qs = [0.25, 0.5, 0.75, 0.95]
    got = kll_exact_quantiles(df, "x", qs, k=128)
    s = np.sort(data)
    for q in qs:
        assert got[q] == _disc_quantile(s, q), (dist, q)


def test_exact_quantiles_partition_invariant(spark):
    rng = np.random.default_rng(23)
    data = rng.lognormal(0, 3, 10_000)
    df1 = spark.createDataFrame([(float(v),) for v in data], "x double").repartition(2)
    df2 = df1.repartition(32)
    a = kll_exact_quantiles(df1, "x", [0.5, 0.9], k=64)
    b = kll_exact_quantiles(df2, "x", [0.5, 0.9], k=64)
    assert a == b


def test_exact_quantiles_forced_bisection(spark):
    # tiny collect budget forces the value-domain bisection path
    rng = np.random.default_rng(29)
    data = rng.uniform(0, 100, 30_000)
    df = spark.createDataFrame([(float(v),) for v in data], "x double")
    got = kll_exact_quantiles(df, "x", [0.5], k=64, max_distinct_collect=50)
    assert got[0.5] == _disc_quantile(np.sort(data), 0.5)
