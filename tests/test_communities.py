"""Label-propagation community detection (operators/communities)."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.communities import label_propagation
from etl_market_survey_spark.operators.pagerank import undirected_edges


def _labels(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_two_triangles_with_bridge(spark):
    """Two triangles joined by one bridge edge: LPA keeps them as two
    communities (the bridge is outvoted by the triangle majority)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a long, b long",
    )
    edges = undirected_edges(pairs, "a", "b")
    got = _labels(label_propagation(edges, n_iter=8))
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_synchronous_determinism_and_layout(spark):
    pairs = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(40) if i != (i * 7) % 23],
        "a long, b long",
    )
    edges = undirected_edges(pairs, "a", "b")
    a = _labels(label_propagation(edges, n_iter=4))
    b = _labels(label_propagation(edges.repartition(13), n_iter=4))
    assert a == b


def test_nodes_without_inbound_keep_label(spark):
    # directed edge list where node 9 only ever SENDS: it keeps itself
    edges = spark.createDataFrame([(9, 1), (1, 2), (2, 1)], "src long, dst long")
    got = _labels(label_propagation(edges, n_iter=3))
    assert got[9] == 9


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(edges, n_iter=0)
