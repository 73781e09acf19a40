"""Connected components: closure correctness on chains/merges, pointer-
jump convergence on long paths, and canonical-survivor semantics."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.components import (
    connected_components,
    dedup_canonical,
)


def test_transitive_closure(spark):
    # two clusters: a 4-cycle chain and a pair; (1,4) edge closes the ring
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (10, 11)], "id_a long, id_b long"
    )
    got = sorted(map(tuple, connected_components(edges).collect()))
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)]


def test_long_chain_converges(spark):
    # diameter 60: naive propagation needs 60 rounds, pointer jumping
    # must finish well inside max_iter=25
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    cc = connected_components(chain)
    assert cc.count() == 61
    assert cc.filter(F.col("comp") != 0).count() == 0


def test_dedup_canonical_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5), (1, 2)], "id_a long, id_b long")
    out = dedup_canonical(docs, pairs, "doc_id")
    canon = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert canon == {0: 0, 3: 0, 5: 0, 1: 1, 2: 1, 4: 4, 6: 6, 7: 7}
    survivors = out.filter(F.col("doc_id") == F.col("canonical_id"))
    assert sorted(r["doc_id"] for r in survivors.collect()) == [0, 1, 4, 6, 7]


def test_dedup_canonical_by_quality(spark):
    from etl_market_survey_spark.operators.components import dedup_canonical_by

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (8, 4), (9, 1)],
        "doc_id long, score long",
    )
    got = {
        r.doc_id: r.canonical_id
        for r in dedup_canonical_by(docs, pairs, "doc_id", "score").collect()
    }
    # cluster {1,2,3}: best score 99 shared by 2 and 3 -> lowest id 2
    # cluster {7,8}: 7 wins; singleton 9 -> itself
    assert got == {1: 2, 2: 2, 3: 2, 7: 7, 8: 7, 9: 9}


def test_dedup_canonical_by_fractional_scores(spark):
    from etl_market_survey_spark.operators.components import dedup_canonical_by

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(1, 1.2), (2, 1.9)], "doc_id long, score double"
    )
    got = {
        r.doc_id: r.canonical_id
        for r in dedup_canonical_by(docs, pairs, "doc_id", "score").collect()
    }
    assert got == {1: 2, 2: 2}  # 1.9 beats 1.2 — no integer truncation


def test_distributed_path_matches_driver_union_find(spark, monkeypatch):
    """Small graphs short-circuit to the driver union-find; force the
    distributed min-label fixpoint (threshold -> 0) and pin exact label
    parity on a chain (worst case for propagation) plus a random
    multi-component graph."""
    import random

    from etl_market_survey_spark.operators import components as C

    chain = [(i, i + 1) for i in range(40)]
    rng = random.Random(7)
    blob = {(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(80)}
    for edges in (chain, sorted(blob)):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = {
            (r["node"], r["comp"])
            for r in C.connected_components(df).collect()
        }
        monkeypatch.setattr(C, "_DRIVER_UF_MAX_EDGES", 0)
        slow = {
            (r["node"], r["comp"])
            for r in C.connected_components(df).collect()
        }
        monkeypatch.undo()
        assert fast == slow and fast
