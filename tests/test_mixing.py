"""Corpus mixing: quota arithmetic, exact draw sizes, determinism under
repartitioning, under-delivery, interleaving."""

from etl_market_survey_spark.operators.mixing import (
    allocate_quotas,
    weighted_mix,
)


def test_allocate_quotas_exact_sum():
    q = allocate_quotas({"a": 1, "b": 1, "c": 1}, 10)
    assert sum(q.values()) == 10 and set(q.values()) <= {3, 4}
    q = allocate_quotas({"a": 5, "b": 3, "c": 2, "d": 1}, 40)
    assert q == {"a": 18, "b": 11, "c": 7, "d": 4}
    # deterministic tie-break by name
    assert allocate_quotas({"x": 1, "y": 1}, 3) == {"x": 2, "y": 1}


def _corpus(spark, n=300):
    rows = [(i, f"s{i % 3}", f"doc {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_exact_draw_sizes(spark):
    df = _corpus(spark)
    out = weighted_mix(df, "source", {"s0": 3.0, "s1": 1.0}, 40, ["doc_id"])
    counts = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"s0": 30, "s1": 10}


def test_under_delivery(spark):
    df = _corpus(spark, n=30)  # 10 docs per source
    out = weighted_mix(df, "source", {"s0": 9.0, "s1": 1.0}, 100, ["doc_id"])
    counts = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"s0": 10, "s1": 10}  # s0 capped at its corpus size


def test_layout_invariance(spark):
    df = _corpus(spark)
    a = weighted_mix(df.repartition(17), "source", {"s0": 1, "s1": 2}, 50, ["doc_id"]).collect()
    b = weighted_mix(df.coalesce(1), "source", {"s0": 1, "s1": 2}, 50, ["doc_id"]).collect()
    assert [(r.doc_id, r.mix_key) for r in a] == [(r.doc_id, r.mix_key) for r in b]


def test_shuffle_interleaves_sources(spark):
    df = _corpus(spark, n=600)
    rows = weighted_mix(df, "source", {"s0": 1.0, "s1": 1.0}, 200, ["doc_id"]).collect()
    # no long single-source run in the mixed order (content-hash order is
    # source-agnostic; a run of 20 from one source would be ~2^-20 luck)
    longest, run, prev = 0, 0, None
    for r in rows:
        run = run + 1 if r.source == prev else 1
        prev, longest = r.source, max(longest, run)
    assert longest < 20
