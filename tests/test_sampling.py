"""Deterministic sampling: exact per-group sizes, layout invariance,
seed sensitivity, and fraction accuracy of the hash-space filter."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.sampling import (
    sample_exact_per_group,
    sample_fraction,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 2.5).alias("x")
    )


def test_exact_k_per_group_and_invariance(df):
    out = sample_exact_per_group(df, ["g"], ["id"], k=25, seed=1)
    sizes = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert set(sizes) == set(range(7)) and all(v == 25 for v in sizes.values())
    # identical selection under a different physical layout
    out2 = sample_exact_per_group(df.repartition(13), ["g"], ["id"], k=25, seed=1)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
    # a different seed redraws the sample
    out3 = sample_exact_per_group(df, ["g"], ["id"], k=25, seed=2)
    assert sorted(map(tuple, out.collect())) != sorted(map(tuple, out3.collect()))


def test_exact_k_caps_at_group_size(spark):
    small = spark.range(10).select(F.col("id"), F.lit("a").alias("g"))
    out = sample_exact_per_group(small, ["g"], ["id"], k=50, seed=1)
    assert out.count() == 10


def test_sample_fraction_accuracy_and_determinism(df):
    out = sample_fraction(df, ["id"], 0.2, seed=3)
    n = out.count()
    assert abs(n - 2000) < 4 * (10000 * 0.2 * 0.8) ** 0.5  # binomial 4 sigma
    out2 = sample_fraction(df.repartition(17), ["id"], 0.2, seed=3)
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in out2.collect()
    )
    # nested fractions: the 10% sample is a subset of the 20% sample
    sub = {r["id"] for r in sample_fraction(df, ["id"], 0.1, seed=3).collect()}
    sup = {r["id"] for r in out.collect()}
    assert sub <= sup


def test_weighted_sample_favors_heavy_rows(spark):
    from etl_market_survey_spark.operators.sampling import weighted_sample_k

    # two weight classes: 100 light (w=1) vs 100 heavy (w=20)
    rows = [(i, 1.0 if i < 100 else 20.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    heavy_hits = light_hits = 0
    for seed in range(12):
        got = weighted_sample_k(df, k=20, weight_col="w", id_cols=["id"], seed=seed)
        ids = [r.id for r in got.collect()]
        assert len(ids) == 20 == len(set(ids))
        heavy_hits += sum(1 for i in ids if i >= 100)
        light_hits += sum(1 for i in ids if i < 100)
    # with 20x weight, heavy rows should dominate the sample decisively
    assert heavy_hits > 4 * light_hits


def test_weighted_sample_deterministic(spark):
    from etl_market_survey_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame([(i, float(i % 7 + 1)) for i in range(100)], "id long, w double")
    a = {(r.id, r.es_rank) for r in weighted_sample_k(df, 10, "w", ["id"], seed=3).collect()}
    b = {(r.id, r.es_rank) for r in
         weighted_sample_k(df.repartition(7), 10, "w", ["id"], seed=3).collect()}
    assert a == b  # partitioning-invariant


# --- temperature mixing -----------------------------------------------------


def test_temperature_targets_math():
    import math

    from etl_market_survey_spark.operators.sampling import temperature_targets

    counts = {"en": 10_000, "fr": 100, "zh": 400}
    t = temperature_targets(counts, 1000, alpha=0.5)
    w = {d: math.floor(math.sqrt(n * 1e6)) for d, n in counts.items()}
    sw = sum(w.values())
    for d in counts:
        assert t[d] == min(counts[d], 1000 * w[d] // sw)
    # alpha upweights the tail: fr share in the sample > raw fr share
    assert t["fr"] / 1000 > counts["fr"] / sum(counts.values())
    # alpha=1 recovers ~proportional sampling
    t1 = temperature_targets(counts, 1000, alpha=1.0)
    assert abs(t1["en"] - 1000 * 10_000 // 10_500) <= 1


def test_temperature_mixing_exact_quotas(spark):
    from etl_market_survey_spark.operators.sampling import (
        temperature_mixing,
        temperature_targets,
    )

    rows = [(i, "en" if i < 900 else ("fr" if i < 960 else "zh")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string").repartition(8)
    out = temperature_mixing(df, "lang", ["doc_id"], 300, alpha=0.5, seed=7)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = temperature_targets({"en": 900, "fr": 60, "zh": 40}, 300, alpha=0.5)
    assert got == {d: k for d, k in want.items() if k > 0}
    # deterministic: same seed -> same rows; different seed -> same quotas
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mixing(df, "lang", ["doc_id"], 300, alpha=0.5, seed=7).collect()
    )
    assert a == b
    c = temperature_mixing(df, "lang", ["doc_id"], 300, alpha=0.5, seed=8)
    got_c = {r["lang"]: r["n"] for r in c.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got_c == got


def test_hash_ring_negatives_balanced_and_distinct(spark):
    from etl_market_survey_spark.operators.sampling import hash_ring_negatives

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = hash_ring_negatives(df, "doc_id", k=3).collect()
    assert len(out) == 60
    # no self-pairs, and every doc serves as negative exactly k times
    served = {}
    for r in out:
        assert r.neg_id != r.doc_id
        served[r.neg_id] = served.get(r.neg_id, 0) + 1
    assert set(served.values()) == {3}
    # per-anchor negatives are distinct
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.doc_id, set()).add(r.neg_id)
    assert all(len(v) == 3 for v in by_anchor.values())


def test_hash_ring_negatives_seed_redraw(spark):
    from etl_market_survey_spark.operators.sampling import hash_ring_negatives

    df = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    a = {(r.doc_id, r.j): r.neg_id for r in hash_ring_negatives(df, "doc_id", 1, seed=1).collect()}
    b = {(r.doc_id, r.j): r.neg_id for r in hash_ring_negatives(df, "doc_id", 1, seed=2).collect()}
    a2 = {(r.doc_id, r.j): r.neg_id for r in hash_ring_negatives(df, "doc_id", 1, seed=1).collect()}
    assert a == a2 and a != b
