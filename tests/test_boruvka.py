"""Borůvka MSF (operators/boruvka) vs an in-test Kruskal reference —
the unique lexicographic-(w,u,v) MSF, so the two algorithms must agree
edge-for-edge even with duplicate weights."""

import numpy as np

from etl_market_survey_spark.operators.boruvka import minimum_spanning_forest


def kruskal(n_nodes, edges):
    """Reference MSF under lexicographic (w, u, v) order; edges are
    (u, v, w) canonical u < v, deduped."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, u, v in sorted((w, u, v) for u, v, w in edges):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _msf(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long, w long")
    return sorted(
        (r["u"], r["v"], r["w"])
        for r in minimum_spanning_forest(df, "u", "v", "w").collect()
    )


def test_small_known_graph(spark):
    edges = [(0, 1, 4), (1, 2, 1), (0, 2, 3), (2, 3, 7), (1, 3, 9)]
    assert _msf(spark, edges) == kruskal(4, edges)


def test_duplicate_weights_deterministic_tiebreak(spark):
    # all weights equal: the forest is decided purely by the (u, v)
    # lexicographic tiebreak — must match Kruskal's identical order
    edges = [(u, v, 5) for u in range(5) for v in range(u + 1, 5)]
    assert _msf(spark, edges) == kruskal(5, edges)


def test_disconnected_graph_yields_forest(spark):
    edges = [(0, 1, 2), (1, 2, 3), (10, 11, 1), (11, 12, 4), (10, 12, 2)]
    got = _msf(spark, edges)
    assert got == kruskal(13, edges)
    assert len(got) == 4  # two components -> (3-1) + (3-1) edges


def test_parallel_edges_and_self_loops(spark):
    edges = [(0, 1, 9), (1, 0, 2), (0, 1, 5), (1, 1, 1), (1, 2, 3)]
    got = _msf(spark, edges)
    assert got == [(0, 1, 2), (1, 2, 3)]


def test_randomized_vs_kruskal(spark):
    r = np.random.RandomState(23)
    for _ in range(3):
        n = 30
        raw = set()
        for _ in range(70):
            u, v = sorted(r.randint(0, n, size=2).tolist())
            if u != v:
                raw.add((u, v))
        edges = [(u, v, int(r.randint(1, 15))) for u, v in sorted(raw)]
        assert _msf(spark, edges) == kruskal(n, edges)
