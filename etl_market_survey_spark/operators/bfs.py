"""Bounded-hop BFS (min-hop frontier expansion) — beyond reference.

Complements the iterative-graph family (``components`` label-prop,
``kcore`` peeling, ``pagerank`` fixed-point, ``triangles``): shortest
hop distance from a source over an edge table, bounded to ``max_hops``
levels.

Scale shape: one equi-join shuffle per level on the frontier (which is
a tiny fraction of the graph after level 1), with a **visited-set
anti-join** so a node is expanded exactly once — the textbook
distributed BFS pruning; without it frontier sizes grow with walk
counts, not node counts. Each level is eagerly ``localCheckpoint``-ed
(the repo's iterative-lineage discipline, kcore.py:44) so level N's
plan never replays levels 1..N-1 and a task retry re-reads
materialized blocks.

Exactness: min-hop distances are invariant to the pruning — a DuckDB
recursive CTE *without* pruning (walk semantics + ``MIN(hop)``) yields
the same table, which is how q194 gates this bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    source,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Min-hop table ``(node, hops)`` for all nodes within ``max_hops``
    of ``source``. ``edges`` is directed; pass both orientations for an
    undirected graph."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=True)
    frontier = spark.createDataFrame(
        [(source, 0)], "node long, hops int"
    ).localCheckpoint(eager=True)
    levels = [frontier]
    visited = frontier.select("node")
    for i in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_src"])
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(i).cast("int"))
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        levels.append(nxt)
        frontier = nxt
        visited = visited.unionByName(nxt.select("node")).localCheckpoint(
            eager=True
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
