"""Fixed-point integer HITS (hubs & authorities) — Kleinberg 1999 as a
DataFrame loop, with bit-exact cross-engine semantics.

Same gate-able twist as :mod:`.pagerank`: scores live on an integer
fixed-point grid (``UNIT`` = 1e12) and every operation is integer
arithmetic — the mutual-reinforcement sums are exact decimal sums over
the edge joins, and the per-round L1 normalization is
``(raw * UNIT) div total`` (floor). A run is a pure function of the
directed edge set with no float anywhere, so the oracle replays the
rounds as chained CTEs and the bits must match.

Scale shape per iteration: two edge joins (hub table ⋈ edges on src,
authority table ⋈ edges on dst) each followed by a map-side-combined
decimal-sum shuffle on the opposite endpoint, plus two broadcast
one-row totals for the normalizations. State is the O(nodes) score
tables; co-partitioning on the node id persists across rounds.
Decimal widening bounds: raw sums <= n_nodes * UNIT ~ 1e15 for any
realistic graph, and the normalization product adds 12 digits — far
inside DECIMAL(38,0).

Reference parity: the reference has no graph operators; this extends
the beyond-reference graph family (pagerank/bfs/sssp/kcore) with the
bipartite-ranking primitive a link-analysis or retrieval pipeline uses
to separate "good pointers" from "good content".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000_000  # 1e12 fixed-point grid

_DEC = "decimal(38,0)"


def hits_fixed_point(edges: DataFrame, n_iter: int = 2) -> DataFrame:
    """``(node, kind, score)`` after ``n_iter`` integer HITS rounds over
    the directed edge list ``(src, dst)``.

    ``kind`` is ``'hub'`` (src-side score) or ``'authority'``
    (dst-side); ``score`` is on the ``UNIT`` grid, L1-normalized each
    round so each side's scores total ~``UNIT`` (minus floor noise
    bounded by n_nodes/UNIT — the documented fixed-point contract).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    # Loop constant: every round references the edge list twice.
    edges = edges.persist()
    h = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(UNIT).cast(_DEC).alias("h"))
    )
    a = None
    for _ in range(n_iter):
        ar = (
            h.join(edges, h["node"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum("h").alias("s"))
        )
        at = ar.agg(F.sum("s").alias("t"))
        a = ar.crossJoin(F.broadcast(at)).select(
            F.col("dst").alias("node"),
            F.expr(f"(s * {UNIT}) div t").cast(_DEC).alias("a"),
        )
        hr = (
            a.join(edges, a["node"] == edges["dst"])
            .groupBy("src")
            .agg(F.sum("a").alias("s"))
        )
        ht = hr.agg(F.sum("s").alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select(
            F.col("src").alias("node"),
            F.expr(f"(s * {UNIT}) div t").cast(_DEC).alias("h"),
        )
    hubs = h.select(
        "node", F.lit("hub").alias("kind"), F.col("h").cast("long").alias("score")
    )
    auths = a.select(
        "node",
        F.lit("authority").alias("kind"),
        F.col("a").cast("long").alias("score"),
    )
    return hubs.unionByName(auths)


def sql_hits_rounds(n_iter: int, unit: int = UNIT) -> str:
    """DuckDB CTE chain replaying :func:`hits_fixed_point` bit-for-bit.

    Expects an ``edges(src, dst)`` CTE in scope; exposes ``h{n}`` and
    ``a{n}`` for the final round.
    """
    parts = [
        f"h0 AS (SELECT DISTINCT src AS node, CAST({unit} AS HUGEINT) AS h"
        " FROM edges)"
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f"""ar{k} AS (
  SELECT e.dst AS node, SUM(h.h) AS s
  FROM h{k - 1} h JOIN edges e ON e.src = h.node GROUP BY 1
),
at{k} AS (SELECT SUM(s) AS t FROM ar{k}),
a{k} AS (SELECT node, (s * {unit}) // t AS a FROM ar{k} CROSS JOIN at{k}),
hr{k} AS (
  SELECT e.src AS node, SUM(a.a) AS s
  FROM a{k} a JOIN edges e ON e.dst = a.node GROUP BY 1
),
ht{k} AS (SELECT SUM(s) AS t FROM hr{k}),
h{k} AS (SELECT node, (s * {unit}) // t AS h FROM hr{k} CROSS JOIN ht{k})"""
        )
    return ",\n".join(parts)
