"""Size-gated broadcast rounds: conf parsing, gate behavior, and
parity of auto mode vs both explicit modes on a small graph."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.autobroadcast import (
    _parse_bytes,
    rows_fit_broadcast,
)
from etl_market_survey_spark.operators.bfs import bfs_hops
from etl_market_survey_spark.operators.communities import label_propagation
from etl_market_survey_spark.operators.pagerank import (
    pagerank_fixed_point,
    personalized_pagerank,
    undirected_edges,
)


def test_parse_bytes():
    assert _parse_bytes("10485760") == 10 << 20
    assert _parse_bytes("10MB") == 10 << 20
    assert _parse_bytes("10m") == 10 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("512k") == 512 << 10
    assert _parse_bytes("-1") == -1
    assert _parse_bytes("nonsense") == -1


def test_gate_respects_threshold(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "10MB")
        assert rows_fit_broadcast(spark, 1000)
        assert not rows_fit_broadcast(spark, 10_000_000)
        spark.conf.set(key, "-1")  # broadcast disabled -> shuffle rounds
        assert not rows_fit_broadcast(spark, 10)
    finally:
        spark.conf.set(key, old)


def _edges(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5)], "a long, b long"
    )
    return undirected_edges(pairs, "a", "b")


def test_auto_matches_both_modes(spark):
    e = _edges(spark)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        for thr in ("10MB", "-1"):  # auto resolves to broadcast / shuffle
            spark.conf.set(key, thr)
            auto = sorted(pagerank_fixed_point(e, n_iter=3).collect())
            assert auto == sorted(
                pagerank_fixed_point(e, n_iter=3, broadcast_ranks=True).collect()
            )
            assert auto == sorted(
                pagerank_fixed_point(e, n_iter=3, broadcast_ranks=False).collect()
            )

            seeds = spark.createDataFrame([(1,)], "node long")
            p_auto = sorted(personalized_pagerank(e, seeds, n_iter=3).collect())
            assert p_auto == sorted(
                personalized_pagerank(
                    e, seeds, n_iter=3, broadcast_ranks=False
                ).collect()
            )

            b_auto = sorted(bfs_hops(e, 1, 3).collect())
            assert b_auto == sorted(
                bfs_hops(e, 1, 3, broadcast_frontier=False).collect()
            )

            l_auto = sorted(label_propagation(e, n_iter=3).collect())
            assert l_auto == sorted(
                label_propagation(e, n_iter=3, broadcast_labels=False).collect()
            )
    finally:
        spark.conf.set(key, old)


def test_personalized_empty_graph_keeps_old_shape(spark):
    # empty graph + nonempty seeds: empty result, no ValueError
    e = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    assert personalized_pagerank(e, seeds, n_iter=2).collect() == []
