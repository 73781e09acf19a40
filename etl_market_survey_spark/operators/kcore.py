"""k-core decomposition (iterative peeling) — exact, DataFrame loop.

The density filter of graph curation: the k-core is the maximal subgraph
where every node keeps degree >= k, computed by repeatedly peeling
under-degree nodes (Matula & Beck 1983). Each peel can cascade — a
node's removal drops its neighbors' degrees — so this is inherently
iterative, like the PageRank and connected-components loops here: per
round one degree aggregation + two semi-joins, lineage truncated with an
eager localCheckpoint (round N's plan must not replay rounds 1..N-1),
early exit at the fixpoint. Rounds are bounded by the peel depth
(diameter-ish in practice, << node count), not by |V|.

Exactness: pure integer degree arithmetic — the q122 gate unrolls the
same peel as SQL CTE stages past the fixpoint (peeling is idempotent
once stable) and matches bit-for-bit.

Scale shape: per round, the degree agg is map-side combined and the
keep-set joins are semi-joins that broadcast when the survivor set is
small. State is the current edge set — no driver-side data beyond one
count per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def k_core(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """Surviving ``(node, deg)`` of the k-core of the canonical edge set
    (``a < b`` distinct; see triangles.canonical_edges). Empty result if
    the core is empty. ``deg`` is the node's degree WITHIN the core."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cur = edges.select("a", "b").localCheckpoint(eager=True)
    n_edges = cur.count()
    for _ in range(max_iter):
        keep = _degrees(cur).filter(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
        if n_edges == 0:
            break
    return _degrees(cur).filter(F.col("deg") >= k)
