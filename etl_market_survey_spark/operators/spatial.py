"""Grid-blocked spatial neighbor join — radius search without a cross
join.

The standard distributed spatial-join shape (the fixed-grid variant of
partition-based spatial merge join, Patel & DeWitt SIGMOD 1996): bucket
every point into a square cell of side = radius, then candidate pairs
can only live in the 3x3 cell neighborhood — join point A's cell
against point B's nine neighbor cells (one explode on the B side, one
equi-join on cell id), verify the exact distance predicate on the
candidates. Each qualifying pair is produced exactly once (A's single
cell appears at most once in B's neighborhood), so no distinct is
needed.

Coordinates and the radius are INTEGERS and the verify predicate is
``dx*dx + dy*dy <= r*r`` in int64 — no sqrt, no floats, bit-identical
on any engine (the same reason the fixed-point PageRank and Jaccard
joins replay exactly). Callers with float lat/lon scale to integer
microdegrees first; for geodesic semantics the grid becomes the
equirectangular approximation whose cell side over-covers the radius —
the blocking stays sound, only the verify predicate changes.

Scale shape: one shuffle on cell id (the explode multiplies the B side
by 9 BEFORE the shuffle but cells are radius-sized, so candidate volume
is ~9x the true neighbor count, not n^2); skewed dense cells are the
hot-key risk — the cell id is a composite key, so AQE skew-join or
salting applies directly. Memory per task is one cell-neighborhood's
points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs ``id_a < id_b`` within euclidean ``radius`` (inclusive)
    on integer coordinates. Output: ``(id_a, id_b, dist2)`` with
    ``dist2 = dx^2 + dy^2`` (int64)."""
    if radius <= 0:
        raise ValueError("radius must be a positive integer")
    r = int(radius)
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).withColumns(
        {
            # floor division keeps negative coordinates correct
            "_cx": F.floor(F.col("_x") / r).cast("long"),
            "_cy": F.floor(F.col("_y") / r).cast("long"),
        }
    )
    a = pts.select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("xa"),
        F.col("_y").alias("ya"),
        F.col("_cx").alias("ca_x"),
        F.col("_cy").alias("ca_y"),
    )
    # B side exploded to its 9-cell neighborhood; join key is the
    # composite (cell_x, cell_y)
    b = (
        pts.select(
            F.col("_id").alias("id_b"),
            F.col("_x").alias("xb"),
            F.col("_y").alias("yb"),
            F.explode(
                F.expr("sequence(_cx - 1L, _cx + 1L)")
            ).alias("ca_x"),
            F.col("_cy"),
        )
        .select(
            "id_b", "xb", "yb", "ca_x",
            F.explode(F.expr("sequence(_cy - 1L, _cy + 1L)")).alias("ca_y"),
        )
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    return (
        a.join(b, ["ca_x", "ca_y"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", dx * dx + dy * dy)
        .filter(F.col("dist2") <= F.lit(r * r))
        .select("id_a", "id_b", "dist2")
    )


def point_in_polygon(
    df: DataFrame,
    x_col: str,
    y_col: str,
    polygon: list[tuple[int, int]],
    out_col: str = "inside",
) -> DataFrame:
    """Ray-casting point-in-polygon on INTEGER coordinates — crossing
    parity with the division-free orientation test
    ``t = (x2-x1)(y-y1) - (x-x1)(y2-y1)`` (a crossing counts when the
    edge straddles the scanline, ``(y1>y) != (y2>y)``, and the point
    lies left of the edge, ``(t>0) == (y2>y1)``). Pure int64
    arithmetic, so the classification is bit-identical on any engine
    (q290 unrolls the same per-edge terms in SQL). Works for any simple
    polygon, convex or not; boundary semantics are the half-open
    ray-casting convention. The geofence filter of spatial curation —
    one map stage, k CASE terms per row, no joins."""
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    crossings = None
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        straddles = (F.lit(y1) > y) != (F.lit(y2) > y)
        t = (F.lit(x2 - x1)) * (y - F.lit(y1)) - (x - F.lit(x1)) * F.lit(y2 - y1)
        left = (t > 0) == F.lit(y2 > y1)
        term = F.when(straddles & left, F.lit(1)).otherwise(F.lit(0))
        crossings = term if crossings is None else crossings + term
    return df.withColumn(out_col, F.pmod(crossings, F.lit(2)) == 1)


def sql_point_in_polygon(
    x_expr: str, y_expr: str, polygon: list[tuple[int, int]]
) -> str:
    """DuckDB mirror of :func:`point_in_polygon` — identical unrolled
    per-edge terms."""
    terms = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        straddles = f"(({y1} > ({y_expr})) <> ({y2} > ({y_expr})))"
        t = f"(({x2 - x1}) * (({y_expr}) - {y1}) - (({x_expr}) - {x1}) * ({y2 - y1}))"
        left = f"(({t} > 0) = {str(y2 > y1).upper()})"
        terms.append(f"(CASE WHEN {straddles} AND {left} THEN 1 ELSE 0 END)")
    return f"((({' + '.join(terms)}) % 2) = 1)"
