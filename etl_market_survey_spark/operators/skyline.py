"""Skyline (Pareto frontier) over two minimize-dimensions — the
classic multi-criteria operator (Börzsönyi et al., ICDE 2001),
grid-pruned for scale.

Naive skyline is an all-pairs dominance anti-join. The scale path here
is grid pruning: bucket both dimensions into G range cells (floor
buckets off the broadcast min/max row, monotone: bucket i' < i implies
value' < value), drop every cell that has ANY occupied cell strictly
smaller in both coordinates (each of that cell's points is dominated —
and transitively its dominators chain into a surviving cell, so
survivors-only pairwise testing is sufficient; proof in the q319
docstring), then run the exact dominance anti-join among the
survivors only. Survivors live on the occupied staircase — O(G · cell)
points instead of n — so the quadratic stage is bounded by the grid,
not the data. The oracle deliberately uses the NAIVE NOT EXISTS
algorithm, so the pruning itself is verified against an independent
method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline2(
    pts: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    grid: int = 16,
) -> DataFrame:
    """Rows of ``pts`` not dominated by any other row, minimizing both
    ``x_col`` and ``y_col`` (integer columns). Dominance: <= in both,
    < in at least one."""
    x, y = F.col(x_col), F.col(y_col)
    bounds = pts.agg(
        F.min(x).alias("x0"), F.max(x).alias("x1"),
        F.min(y).alias("y0"), F.max(y).alias("y1"),
    )
    cells = pts.crossJoin(F.broadcast(bounds)).select(
        "*",
        F.expr(
            f"CAST(({x_col} - x0) * {grid} div (x1 - x0 + 1) AS INT)"
        ).alias("cx"),
        F.expr(
            f"CAST(({y_col} - y0) * {grid} div (y1 - y0 + 1) AS INT)"
        ).alias("cy"),
    ).drop("x0", "x1", "y0", "y1")
    occ = cells.select("cx", "cy").distinct()
    occ = occ.cache()  # both sides of the cell-dominance probe
    smaller = occ.select(
        F.col("cx").alias("sx"), F.col("cy").alias("sy")
    )
    pruned = occ.join(
        smaller,
        (F.col("sx") < F.col("cx")) & (F.col("sy") < F.col("cy")),
        "left_semi",
    )
    keep_cells = occ.join(pruned, ["cx", "cy"], "left_anti")
    survivors = cells.join(F.broadcast(keep_cells), ["cx", "cy"])
    survivors = survivors.cache()  # both sides of the exact anti-join
    dom = survivors.select(
        F.col(x_col).alias("dx"), F.col(y_col).alias("dy")
    )
    return survivors.join(
        F.broadcast(dom),
        (F.col("dx") <= x)
        & (F.col("dy") <= y)
        & ((F.col("dx") < x) | (F.col("dy") < y)),
        "left_anti",
    ).drop("cx", "cy")
