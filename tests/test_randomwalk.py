"""Hash-driven random walks (operators/randomwalk) — q271 gates the
corpus; units pin determinism, step validity, and shape."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.randomwalk import random_walks


def _graph(spark):
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_walks_follow_edges_and_are_deterministic(spark):
    e = _graph(spark)
    starts = spark.createDataFrame([(1,), (4,)], "node long")
    a = random_walks(e, starts, n_walks=3, walk_len=5).collect()
    b = random_walks(e, starts, n_walks=3, walk_len=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # bit-stable
    adj = {1: {2, 3}, 2: {1, 3}, 3: {1, 2, 4}, 4: {3}}
    byw = {}
    for r in a:
        byw.setdefault((r["start"], r["walk_id"]), {})[r["step"]] = r["node"]
    assert len(byw) == 6
    for (start, _), path in byw.items():
        assert path[0] == start
        assert len(path) == 6
        for t in range(1, 6):
            assert path[t] in adj[path[t - 1]], path


def test_walk_id_variation(spark):
    # with 8 walks from one start over a branching node, at least two
    # walks must diverge (hash varies with walk_id)
    e = _graph(spark)
    starts = spark.createDataFrame([(3,)], "node long")
    rows = random_walks(e, starts, n_walks=8, walk_len=1).collect()
    step1 = {r["walk_id"]: r["node"] for r in rows if r["step"] == 1}
    assert len(set(step1.values())) >= 2


def test_validation(spark):
    e = _graph(spark)
    starts = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        random_walks(e, starts, n_walks=0)
    with pytest.raises(ValueError):
        random_walks(e, starts, n_walks=1000, walk_len=999)


def test_skipgram_pairs_window_and_negatives(spark):
    from etl_market_survey_spark.operators.randomwalk import skipgram_pairs

    walks = spark.createDataFrame(
        [(1, 0, 0, 10), (1, 0, 1, 20), (1, 0, 2, 30), (1, 0, 3, 40)],
        "start long, walk_id long, step long, node long",
    )
    vocab = spark.createDataFrame([(i,) for i in (10, 20, 30, 40, 50)], "node long")
    out = skipgram_pairs(walks, vocab, window=1, n_negatives=0).collect()
    got = sorted((r["center"], r["other"]) for r in out)
    # window 1 on a 4-step walk: 3 adjacent pairs, both directions
    assert got == [(10, 20), (20, 10), (20, 30), (30, 20), (30, 40), (40, 30)]

    withneg = skipgram_pairs(walks, vocab, window=1, n_negatives=3).collect()
    negs = [r for r in withneg if r["label"] == 0]
    assert len(negs) == 6 * 3
    assert all(r["other"] in (10, 20, 30, 40, 50) for r in negs)
    # deterministic across runs
    again = skipgram_pairs(walks, vocab, window=1, n_negatives=3).collect()
    assert sorted(map(tuple, withneg)) == sorted(map(tuple, again))
