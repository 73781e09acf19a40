"""Fixed-point PageRank: hand-checked small graphs, mass conservation,
determinism under repartitioning."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.pagerank import (
    UNIT,
    pagerank_fixed_point,
    undirected_edges,
)


def _pr(spark, edge_rows, **kw):
    edges = spark.createDataFrame(edge_rows, "src long, dst long")
    return {r.node: r.pr for r in pagerank_fixed_point(edges, **kw).collect()}


def test_symmetric_pair_splits_mass_evenly(spark):
    got = _pr(spark, [(1, 2), (2, 1)], n_iter=3)
    assert got[1] == got[2]
    # total mass stays within floor-loss of UNIT (few ulps of 1e-12 grid)
    assert abs(sum(got.values()) - UNIT) < 100


def test_star_center_dominates(spark):
    pairs = [(0, i) for i in range(1, 6)]
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    got = _pr(spark, edges, n_iter=5)
    assert all(got[0] > got[i] for i in range(1, 6))
    leaf = [got[i] for i in range(1, 6)]
    assert max(leaf) == min(leaf)  # symmetry is exact in integer arithmetic


def test_hand_computed_two_node_chain(spark):
    # 1 <-> 2: deg 1 each, pr0 = UNIT//2; contribution = pr; update =
    # base + (85 * pr) // 100 with base = 15*UNIT // (100*2)
    got = _pr(spark, [(1, 2), (2, 1)], n_iter=1)
    pr0 = UNIT // 2
    base = 15 * UNIT // 200
    assert got[1] == got[2] == base + (85 * pr0) // 100


def test_partitioning_invariance(spark):
    import random

    rng = random.Random(5)
    pairs = {(rng.randrange(30), 100 + rng.randrange(10)) for _ in range(120)}
    raw = spark.createDataFrame(sorted(pairs), "a long, b long")
    e1 = undirected_edges(raw, "a", "b")
    e2 = undirected_edges(raw.repartition(17), "a", "b")
    r1 = {r.node: r.pr for r in pagerank_fixed_point(e1, n_iter=3).collect()}
    r2 = {r.node: r.pr for r in pagerank_fixed_point(e2, n_iter=3).collect()}
    assert r1 == r2


def test_n_iter_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest

    with pytest.raises(ValueError):
        pagerank_fixed_point(edges, n_iter=0)


def test_personalized_pagerank_mass_concentrates_at_seeds(spark):
    from pyspark.sql import functions as F

    from etl_market_survey_spark.operators.pagerank import (
        UNIT,
        personalized_pagerank,
        undirected_edges,
    )

    # path graph 1-2-3-4-5-6; seed at node 1
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "a long, b long"
    )
    edges = undirected_edges(pairs, "a", "b")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.pr for r in personalized_pagerank(edges, seeds, n_iter=5).collect()}
    # proximity: mass decays with distance from the seed. The path is
    # bipartite, so finite iterations oscillate between parities —
    # compare distance PAIRS, which are parity-stable.
    assert out[1] + out[2] > out[3] + out[4] > out[5] + out[6]
    # total mass stays within the fixed-point grid of UNIT
    assert abs(sum(out.values()) - UNIT) < 100  # floor noise only

    # empty personalization set is rejected
    import pytest

    with pytest.raises(ValueError, match="empty"):
        personalized_pagerank(edges, seeds.filter(F.lit(False)), n_iter=1)


def test_weighted_pagerank_favors_heavy_edges(spark):
    from etl_market_survey_spark.operators.pagerank import (
        UNIT,
        weighted_pagerank,
    )

    # star: center 0 sends 9x weight to node 1 vs node 2 (symmetrized)
    pairs = [(0, 1, 9), (1, 0, 9), (0, 2, 1), (2, 0, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long, w long")
    out = {r.node: r.pr for r in weighted_pagerank(edges, n_iter=6).collect()}
    assert out[1] > out[2]  # heavier inbound weight -> more rank
    assert abs(sum(out.values()) - UNIT) < 100  # mass conserved mod floor noise


def test_parts_disjoint_skips_dedupe_but_matches_default(spark):
    """With disjoint src/dst domains and distinct pairs, the
    parts_disjoint fast path must return the same edge set (as a set —
    no duplicates) and the same pagerank as the dedupe path."""
    import random

    rng = random.Random(11)
    pairs = {(rng.randrange(30), 100 + rng.randrange(10)) for _ in range(80)}
    raw = spark.createDataFrame(sorted(pairs), "a long, b long")
    e_slow = undirected_edges(raw, "a", "b")
    e_fast = undirected_edges(raw, "a", "b", parts_disjoint=True)
    rows_slow = sorted((r.src, r.dst) for r in e_slow.collect())
    rows_fast = sorted((r.src, r.dst) for r in e_fast.collect())
    assert rows_fast == rows_slow  # no dupes introduced
    r1 = {r.node: r.pr for r in pagerank_fixed_point(e_slow, n_iter=3).collect()}
    r2 = {r.node: r.pr for r in pagerank_fixed_point(e_fast, n_iter=3).collect()}
    assert r1 == r2
    # the fast path's plan has no post-union aggregate (the dedupe)
    plan_fast = e_fast._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan_fast
