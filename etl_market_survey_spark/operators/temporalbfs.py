"""Temporal reachability — earliest-arrival BFS over timestamped
contact edges (the foremost-path semantics of temporal networks,
Holme & Saramäki's diffusion primitive): node v is reachable from seed
s within h hops if there is a path whose edge times strictly
INCREASE; the quantity of interest is the earliest arrival time.

Static reachability over-counts — an edge that fired BEFORE you
arrived cannot carry you — which is exactly why contact tracing,
information-diffusion, and attack-path analyses use this operator
instead of plain BFS.

Correctness structure: earliest arrival has optimal substructure (an
earlier arrival at an intermediate node never hurts — the constraint
``t > arr`` only loosens), so the per-hop recurrence
``arr_{k}(s, d) = min over edges (n, d, t) with t > arr_{k-1}(s, n)``
computes the true optimum; q281 replays the unrolled hops in SQL.

Scale shape per hop: frontier⋈edges on the node key (the frontier
carries (seed, node, arr) — one shuffle), min-combined with the
accumulated bests; localCheckpoint per hop cuts lineage (the BFS/SSSP
pattern). State = one row per (seed, reached node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """``(seed, node, arrival)`` — minimal earliest-arrival over
    time-increasing paths of <= ``max_hops`` hops. ``edges``:
    (src, dst, t) integer times, one row per contact; ``seeds``: one
    ``node`` column. Seeds themselves are not emitted (arrival is for
    REACHED nodes; a seed reappears only if a cycle returns to it)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = edges.select("src", "dst", F.col("t").cast("long").alias("t"))
    frontier = seeds.select(
        F.col("node").alias("seed"),
        F.col("node").alias("node"),
        F.lit(-(1 << 62)).alias("arr"),
    )
    best: DataFrame | None = None
    for _ in range(max_hops):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .filter(F.col("t") > F.col("arr"))
            .groupBy("seed", F.col("dst").alias("node2"))
            .agg(F.min("t").alias("arr2"))
            .select(
                "seed", F.col("node2").alias("node"), F.col("arr2").alias("arr")
            )
            .localCheckpoint(eager=True)
        )
        best = nxt if best is None else (
            best.unionByName(nxt)
            .groupBy("seed", "node")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=True)
        )
        # next frontier: current best arrivals (monotone recurrence —
        # re-expanding a node with a smaller arrival can only improve)
        frontier = best
    return best.select("seed", "node", F.col("arr").alias("arrival"))
