"""Exact distributed triangle counting (degree-ordered orientation).

The MapReduce-classic formulation (Suri & Vassilvitskii, WWW 2011
"Counting triangles and the curse of the last reducer"): orient every
undirected edge from its lower-(degree, id) endpoint to the higher one.
The orientation is acyclic and total, so every triangle {x, y, z} is
counted EXACTLY once as the wedge x→y, y→z closed by x→z. The payoff is
the skew bound that names the paper: a node's out-degree under this
orientation is O(sqrt(m)) — a celebrity node with 10^8 neighbors
generates almost no wedges (its edges point INTO it), so total wedge
volume is O(m^1.5) instead of sum(deg^2), and no single reducer holds a
hot node's full neighborhood.

Shape: one shuffle for degrees, one self-join on the wedge pivot, one
join to close wedges — equi-joins end to end (AQE-splittable), no
driver state, exact integers. The q121 gate replays the whole count per
node against a brute-force triple join in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(df: DataFrame, a: str, b: str) -> DataFrame:
    """Distinct undirected edges as ``(a, b)`` with ``a < b``; self-loops
    dropped."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _oriented(edges: DataFrame) -> DataFrame:
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles of the undirected graph, one row each, as
    ``(x, y, z)`` with ``x < y < z``. ``edges`` must be canonical
    (:func:`canonical_edges`)."""
    # the oriented edge set is consumed three times; we deliberately do
    # NOT checkpoint it — measured at sf0.1, letting AQE replan the three
    # lazy replays (broadcasting the small oriented set at runtime) beats
    # both eager and lazy localCheckpoint by ~1.5x. Revisit only if edge
    # construction itself becomes the dominant stage.
    o = _oriented(edges)
    wedges = (
        o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(
            o.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v"
        )
    )
    closed = wedges.join(
        o.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"]
    )
    return closed.select(
        F.least("u", "v", "w").alias("x"),
        F.greatest(
            F.least(F.col("u"), F.col("v")),
            F.least(F.greatest(F.col("u"), F.col("v")), F.col("w")),
        ).alias("y"),
        F.greatest("u", "v", "w").alias("z"),
    )


def node_triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts ``(node, n_tri)`` — nodes
    in no triangle are absent."""
    tri = triangles(edges)
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_tri"))
