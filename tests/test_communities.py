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


def test_mode_round_matches_unrolled_sql_tiebreaks(spark):
    """The mode(label, deterministic)-fused round must reproduce the
    reference tie-break (most frequent label, ties -> SMALLEST) that
    the unrolled-SQL oracle encodes via ROW_NUMBER(... ORDER BY c DESC,
    label). Node 0 hears labels {1, 1, 2, 2, 3}: tie between 1 and 2 ->
    1 must win."""
    edges = spark.createDataFrame(
        [(10, 0), (11, 0), (20, 0), (21, 0), (30, 0)]
        + [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "src long, dst long",
    )
    # after round 1: 10,11 -> 1; 20,21 -> 2; 30 -> 3 (single voters);
    # node 0 keeps majority-vote semantics in round 2
    got = _labels(label_propagation(edges, n_iter=2))
    assert got[0] == 1  # tie 1-vs-2 broken to the smallest


def test_src_total_parity_on_symmetrized_edges(spark):
    """src_total=True (node set = DISTINCT src) must match the default
    src+dst union node build exactly whenever the edge list is
    symmetrized — the only sanctioned use."""
    pairs = spark.createDataFrame(
        [(i, 100 + (i * 5) % 17) for i in range(30)], "a long, b long"
    )
    edges = undirected_edges(pairs, "a", "b")
    base = _labels(label_propagation(edges, n_iter=3))
    fast = _labels(label_propagation(edges, n_iter=3, src_total=True))
    assert base == fast
    both = _labels(
        label_propagation(
            edges, n_iter=3, broadcast_labels=True, src_total=True
        )
    )
    assert base == both
