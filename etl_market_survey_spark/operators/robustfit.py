"""Theil-Sen robust slope estimation (beyond reference — the
outlier-immune companion to the least-squares fits in q203/q227).

slope = median of all pairwise slopes (y_j - y_i)/(x_j - x_i) over
x_i < x_j; intercept = median of (y_i - slope * x_i). Breakdown point
~29% — one wild month cannot drag the trend, which is why it is the
monitoring-world default for drift lines.

Contract: the input is a per-group AGGREGATED series (months, days,
buckets — the output of a first aggregation pass), so the O(n^2)
pairwise-slope stage is bounded by key cardinality, not by fact rows;
the pair join shuffles on the group key only. Exactness: every slope is
one double division of exact-decimal-derived values, medians are the
interpolating percentile both engines share — no reassociation
anywhere, so the DuckDB oracle replays bit-for-bit (q237).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def theil_sen(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per group: ``(slope, intercept, n_points)`` of the Theil-Sen
    line through (x, y). Duplicate x values within a group contribute
    no pair (slope undefined); groups need >= 2 distinct x."""
    g = list(group_cols)
    base = df.select(
        *g,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    a = base.select(*g, F.col("_x").alias("_xa"), F.col("_y").alias("_ya"))
    b = base.select(*g, F.col("_x").alias("_xb"), F.col("_y").alias("_yb"))
    cond = [a[c] == b[c] for c in g] + [F.col("_xa") < F.col("_xb")]
    pairs = a.join(b, cond).select(
        *[a[c] for c in g],
        ((F.col("_yb") - F.col("_ya")) / (F.col("_xb") - F.col("_xa"))).alias(
            "_s"
        ),
    )
    slopes = pairs.groupBy(*g).agg(F.median("_s").alias("slope"))
    n = base.groupBy(*g).agg(F.count("*").cast("long").alias("n_points"))
    resid = base.join(slopes, g) if g else base.crossJoin(F.broadcast(slopes))
    inter = resid.select(
        *g, (F.col("_y") - F.col("slope") * F.col("_x")).alias("_r")
    ).groupBy(*g).agg(F.median("_r").alias("intercept"))
    out = slopes.join(inter, g) if g else slopes.crossJoin(F.broadcast(inter))
    out = out.join(n, g) if g else out.crossJoin(F.broadcast(n))
    return out.select(*g, "slope", "intercept", "n_points")


def sql_theil_sen(
    points_cte: str,
    group_expr: str,
) -> str:
    """DuckDB mirror over a CTE exposing ``(g, x, y)`` — keep in
    lockstep. Emits ``ts_out(g, slope, intercept, n_points)``."""
    return f"""
ts_pairs AS (
  SELECT a.g, (b.y - a.y) / (b.x - a.x) AS s
  FROM {points_cte} a JOIN {points_cte} b ON a.g = b.g AND a.x < b.x
),
ts_slope AS (SELECT g, median(s) AS slope FROM ts_pairs GROUP BY g),
ts_n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_points FROM {points_cte} GROUP BY g),
ts_inter AS (
  SELECT p.g, median(p.y - sl.slope * p.x) AS intercept
  FROM {points_cte} p JOIN ts_slope sl ON p.g = sl.g GROUP BY p.g
),
ts_out AS (
  SELECT sl.g AS {group_expr}, sl.slope, i.intercept, n.n_points
  FROM ts_slope sl JOIN ts_inter i ON sl.g = i.g JOIN ts_n n ON sl.g = n.g
)"""
