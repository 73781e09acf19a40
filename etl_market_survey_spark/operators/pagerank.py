"""Fixed-point integer PageRank — iterative graph algorithms as
DataFrame loops, with bit-exact cross-engine semantics.

Classic damped PageRank (Page et al. 1999) with one twist that makes it
gate-able: ranks live on an integer fixed-point grid (``unit`` = 1e12)
and every operation is integer arithmetic — contributions are
``pr div degree`` (floor), the damped update is
``base + (d_num * S) div d_den`` — so a run is a pure function of the
edge set with NO float anywhere: any engine that replays the same
integer recurrence produces the same bits (the q97 oracle unrolls the
iterations as chained CTEs). The floor noise is bounded by
``degree/unit`` per node per iteration — 1e-12-scale, the documented
contract of the fixed-point semantics.

Scale shape per iteration: one join ranks⋈edges on src (the rank table
is nodes-sized; co-partitioning on node id persists across iterations
since the key never changes — with bucketed edges the join exchange
disappears), one groupBy dst with map-side combined LONG sums (decimal
widening guards overflow: n_nodes * unit fits 38 digits far beyond any
realistic graph). Iterations are a driver loop over lazy plans; each
iteration checkpoints through the shuffle, state is the O(nodes) rank
table — the standard Pregel-as-DataFrame shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000_000  # 1e12 fixed-point grid


def undirected_edges(
    pairs: DataFrame, src: str, dst: str, parts_disjoint: bool = False
) -> DataFrame:
    """Symmetrize + dedupe an edge list into ``(src, dst)`` both ways.

    ``pairs`` is usually a derived aggregate (joins + distinct); the
    symmetrize union references it twice, so it is cached here — one
    computation feeds both directions (the q78 merge-family rule:
    self-referential inputs share one scan).

    ``parts_disjoint=True`` asserts the ``src`` and ``dst`` value
    domains never overlap (e.g. a bipartite graph whose two node kinds
    live in disjoint id ranges). Then a reversed pair ``(b, a)`` can
    never equal a forward pair ``(a', b')``, so when ``pairs`` is
    already distinct the symmetrized union is distinct by construction
    and the post-union ``distinct()`` — a full shuffle of 2x the edge
    list — is skipped outright (guide §2.4: a distinct on data that is
    already unique is an accidental exchange). Only set it when the
    domains are provably disjoint; the default keeps the dedupe."""
    pairs = pairs.cache()
    a = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    b = pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    out = a.unionByName(b)
    return out if parts_disjoint else out.distinct()


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    checkpoint_every: int = 8,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """``(node, pr)`` after ``n_iter`` integer fixed-point iterations over
    the directed edge list ``(src, dst)``; ``pr`` is on the ``UNIT``
    grid. Every node must have out-degree >= 1 (symmetrize with
    :func:`undirected_edges` for graphs with sinks).

    Lineage: every ``checkpoint_every`` rounds (and after the last) the
    rank table is eagerly ``localCheckpoint``-ed, so plan depth and
    task-retry replay are bounded by ``checkpoint_every`` rounds at any
    ``n_iter`` — without paying one materialization job per round (the
    kcore/components per-round cut is free there because those loops
    already run an action per round; this one doesn't).

    ``broadcast_ranks=True`` broadcasts the nodes-sized per-source
    contribution table into the edges join (and the contribution sums
    into the join-back), making each round ONE shuffle (the dst-sum
    combine) instead of three — the same trade as
    :func:`..operators.communities.label_propagation`'s
    ``broadcast_labels``: right whenever the node set fits an executor
    (tens of millions of nodes); billion-node graphs keep the default
    shuffle joins. The per-source ratio ``pr div deg`` is computed once
    per node before the edges join — identical integers to the
    per-edge form, and the decimal contribution sum is order-
    independent, so results are bit-equal either way."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    # Loop constants persist for any multi-round run: each iteration's
    # plan references edges/deg/nodes, so without a persist the (often
    # expensive) edge-building subplan re-scans and re-shuffles once per
    # round even inside a single job. (The round-2 "persist costs 2x"
    # claim was an artifact of the count()-pruned bench; a clean
    # full-materialization A/B at sf0.1 shows persist slightly AHEAD
    # (~3-10%), and the win grows with edge-build cost and n_iter.)
    cuts_fire = n_iter > 1
    edges = edges.persist() if cuts_fire else edges
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    if cuts_fire:
        deg = deg.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if cuts_fire:
        nodes = nodes.persist()
    n_nodes = nodes.count()
    base = ((d_den - d_num) * UNIT) // (d_den * n_nodes)

    pr = nodes.withColumn("pr", F.lit(UNIT // n_nodes).cast("long"))
    for it in range(n_iter):
        if broadcast_ranks:
            # per-source ratio ONCE per node, broadcast into the edges
            # join: edges never shuffle, the dst-sum partial-aggregates
            # map-side — one exchange per round
            rt = (
                pr.join(
                    F.broadcast(deg.withColumnRenamed("src", "node")),
                    "node",
                )
                .select(
                    F.col("node").alias("src"),
                    F.expr("pr div deg").alias("c"),
                )
            )
            contrib = edges.join(F.broadcast(rt), "src").select(
                F.col("dst").alias("node"), "c"
            )
        else:
            contrib = (
                pr.join(deg, pr["node"] == deg["src"])
                .join(edges, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("pr div deg").alias("c"),  # integer floor, exact
                )
            )
        sums = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        )
        sums_in = F.broadcast(sums) if broadcast_ranks else sums
        pr = nodes.join(sums_in, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({d_num} * coalesce(s, cast(0 as decimal(38,0)))) div {d_den}")
            )
            .cast("long")
            .alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            pr = pr.localCheckpoint(eager=True)
    # loop constants stay cached for the life of the returned frame
    # (bench/clients clearCache between runs; Spark LRU-evicts under
    # pressure) — unpersisting here would invalidate the un-checkpointed
    # tail of the recurrence.
    return pr


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    checkpoint_every: int = 8,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Personalized PageRank (random walk with restart): the teleport
    mass returns ONLY to the ``sources`` node set — scores measure
    proximity to those seeds, the similar-entity / recommendation
    variant of PageRank. Same integer fixed-point contract as
    :func:`pagerank_fixed_point` (1e-12 grid, integer floor divisions,
    q243's oracle unrolls the identical recurrence):

    ``pr_0 = UNIT // |S|`` on S, 0 elsewhere;
    ``pr_{t+1}(v) = [v in S] * ((d_den-d_num)*UNIT) // (d_den*|S|)
    + (d_num * sum_in(pr_t // deg)) div d_den``.

    ``sources`` must expose a single ``node`` column (subset of the
    graph's nodes)."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    cuts_fire = n_iter > 1  # same persist rationale as pagerank_fixed_point
    edges = edges.persist() if cuts_fire else edges
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if cuts_fire:
        deg = deg.persist()
        nodes = nodes.persist()
    src_set = sources.select("node").distinct()
    n_src = src_set.count()
    if n_src == 0:
        raise ValueError("personalization set is empty")
    base = ((d_den - d_num) * UNIT) // (d_den * n_src)
    seeded = nodes.join(
        src_set.withColumn("_s", F.lit(1)), "node", "left"
    ).select("node", F.coalesce("_s", F.lit(0)).alias("_s"))
    if cuts_fire:
        seeded = seeded.persist()

    pr = seeded.select(
        "node", (F.col("_s") * F.lit(UNIT // n_src)).cast("long").alias("pr")
    )
    for it in range(n_iter):
        if broadcast_ranks:
            # same one-shuffle round as pagerank_fixed_point: ratio
            # per source, broadcast both ways (bit-equal results)
            rt = (
                pr.join(
                    F.broadcast(deg.withColumnRenamed("src", "node")),
                    "node",
                )
                .select(
                    F.col("node").alias("src"),
                    F.expr("pr div deg").alias("c"),
                )
            )
            contrib = edges.join(F.broadcast(rt), "src").select(
                F.col("dst").alias("node"), "c"
            )
        else:
            contrib = (
                pr.join(deg, pr["node"] == deg["src"])
                .join(edges, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("pr div deg").alias("c"),
                )
            )
        sums = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        )
        sums_in = F.broadcast(sums) if broadcast_ranks else sums
        pr = seeded.join(sums_in, "node", "left").select(
            "node",
            (
                F.col("_s") * F.lit(base)
                + F.expr(
                    f"({d_num} * coalesce(s, cast(0 as decimal(38,0)))) div {d_den}"
                )
            )
            .cast("long")
            .alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            pr = pr.localCheckpoint(eager=True)
    return pr


def weighted_pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    checkpoint_every: int = 8,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Edge-weighted PageRank: contributions split proportionally to
    integer edge weights instead of uniformly — ``contrib(e) =
    (pr * w_e) div W(src)`` with ``W(src)`` the node's total outgoing
    weight. Same integer fixed-point contract as
    :func:`pagerank_fixed_point` (exact 1e-12 grid; q255's oracle
    unrolls the identical recurrence); ``edges`` is (src, dst, w) with
    positive integer weights, every node needing outgoing weight > 0.

    Overflow guard: ``pr * w`` stays in decimal(38,0), so weights up to
    ~1e25/UNIT are safe — far past any realistic edge weight."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    cuts_fire = n_iter > 1
    e = edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    e = e.persist() if cuts_fire else e
    wtot = e.groupBy("src").agg(F.sum("w").alias("wt"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if cuts_fire:
        wtot = wtot.persist()
        nodes = nodes.persist()
    n_nodes = nodes.count()
    base = ((d_den - d_num) * UNIT) // (d_den * n_nodes)

    pr = nodes.withColumn("pr", F.lit(UNIT // n_nodes).cast("long"))
    for it in range(n_iter):
        if broadcast_ranks:
            # c depends on the per-EDGE weight, so broadcast the
            # (src, pr, wt) table and compute c after the map-side
            # edges join — still one shuffle (the dst-sum) per round
            rt = (
                pr.join(
                    F.broadcast(wtot.withColumnRenamed("src", "node")),
                    "node",
                )
                .select(F.col("node").alias("src"), "pr", "wt")
            )
            contrib = e.join(F.broadcast(rt), "src").select(
                F.col("dst").alias("node"),
                F.expr(
                    "(cast(pr as decimal(38,0)) * w) div wt"
                ).alias("c"),
            )
        else:
            contrib = (
                pr.join(wtot, pr["node"] == wtot["src"])
                .join(e, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        "(cast(pr as decimal(38,0)) * w) div wt"
                    ).alias("c"),
                )
            )
        sums = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        )
        sums_in = F.broadcast(sums) if broadcast_ranks else sums
        pr = nodes.join(sums_in, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({d_num} * coalesce(s, cast(0 as decimal(38,0)))) div {d_den}"
                )
            )
            .cast("long")
            .alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            pr = pr.localCheckpoint(eager=True)
    return pr
