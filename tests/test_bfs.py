"""Bounded-hop BFS: min-hop correctness, pruning, early stop."""

from etl_market_survey_spark.operators.bfs import bfs_hops


def _edges(spark, pairs):
    # undirected: both orientations
    both = list(pairs) + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_path_graph_hops(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r.node: r.hops for r in bfs_hops(e, 1, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops


def test_min_hop_wins_over_longer_walk(spark):
    # diamond: node 4 reachable at hop 2 two ways, plus a 4-5 tail that
    # also reaches 2 (longer walk back) — min hop must win everywhere
    e = _edges(spark, [(1, 2), (2, 4), (1, 3), (3, 4), (4, 5), (5, 2)])
    got = {r.node: r.hops for r in bfs_hops(e, 1, 3).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2}


def test_early_stop_on_exhausted_frontier(spark):
    e = _edges(spark, [(1, 2)])
    got = {r.node: r.hops for r in bfs_hops(e, 1, 10).collect()}
    assert got == {1: 0, 2: 1}


def test_unreachable_component_excluded(spark):
    e = _edges(spark, [(1, 2), (7, 8)])
    got = {r.node: r.hops for r in bfs_hops(e, 1, 5).collect()}
    assert 7 not in got and 8 not in got


def test_broadcast_frontier_parity(spark):
    # broadcast mode changes join strategy only — rows must be identical
    e = _edges(spark, [(1, 2), (2, 4), (1, 3), (3, 4), (4, 5), (5, 2),
                       (5, 6), (6, 7), (7, 8)])
    base = {r.node: r.hops for r in bfs_hops(e, 1, 4).collect()}
    bcast = {
        r.node: r.hops
        for r in bfs_hops(e, 1, 4, broadcast_frontier=True).collect()
    }
    assert bcast == base
