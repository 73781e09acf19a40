"""Theil-Sen robust slope estimation (Theil 1950; Sen 1968) — beyond
reference; the outlier-immune companion to the least-squares fits in
q203/q227.

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
    # the input is a bounded aggregate by contract, but its UPSTREAM plan
    # (often a fact-table aggregation) is referenced by the slope,
    # intercept and count branches — checkpoint once so it runs once
    base = df.select(
        *g,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).localCheckpoint(eager=True)
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


_SQRT2 = "1.4142135623730951"  # exact double of sqrt(2), shared textually


def mann_kendall(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mann-Kendall monotone-trend test (Mann 1945; Kendall 1975) per
    group — the significance
    companion to :func:`theil_sen` (the pair the monitoring literature
    prescribes together): ``S = sum over time-ordered pairs of
    sign(y_j - y_i)`` (an exact integer), tie-corrected variance
    ``[n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18``, continuity-corrected
    z, and the two-sided normal p-value via the engine-shared exact erf
    expression. Output: ``(s_stat, var_s, z, p_value, n_points)``.

    Same bounded-aggregate contract as theil_sen; the oracle replays
    every integer and the single double divisions bit-for-bit (q244)."""
    from ..functions.mathx import sql_erf

    g = list(group_cols)
    # same bounded-aggregate checkpoint rationale as theil_sen: the S,
    # count and tie branches would otherwise re-run the upstream plan
    base = df.select(
        *g,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).localCheckpoint(eager=True)
    a = base.select(*g, F.col("_x").alias("_xa"), F.col("_y").alias("_ya"))
    b = base.select(*g, F.col("_x").alias("_xb"), F.col("_y").alias("_yb"))
    cond = [a[c] == b[c] for c in g] + [F.col("_xa") < F.col("_xb")]
    s = (
        a.join(b, cond)
        .select(
            *[a[c] for c in g],
            F.signum(F.col("_yb") - F.col("_ya")).cast("long").alias("_sgn"),
        )
        .groupBy(*g)
        .agg(F.sum("_sgn").alias("s_stat"))
    )
    n = base.groupBy(*g).agg(F.count("*").alias("_n"))
    ties = (
        base.groupBy(*g, "_y")
        .agg(F.count("*").alias("_t"))
        .filter(F.col("_t") > 1)
        .groupBy(*g)
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie")
        )
    )
    j = s.join(n, g).join(ties, g, "left").withColumn(
        "_tie", F.coalesce("_tie", F.lit(0))
    )
    var_s = (
        (
            F.col("_n") * (F.col("_n") - 1) * (2 * F.col("_n") + 5)
            - F.col("_tie")
        ).cast("double")
        / F.lit(18.0)
    )
    j = j.withColumn("var_s", var_s)
    z = (
        F.when(F.col("var_s") <= 0, F.lit(0.0))
        .when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt("var_s"),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt("var_s"),
        )
        .otherwise(F.lit(0.0))
    )
    j = j.withColumn("z", z).withColumn(
        "p_value",
        F.round(
            F.lit(1.0) - F.expr(sql_erf(f"(abs(z) / {_SQRT2})")), 9
        ),
    )
    return j.select(
        *g,
        F.col("s_stat").cast("long").alias("s_stat"),
        "var_s",
        "z",
        "p_value",
        F.col("_n").cast("long").alias("n_points"),
    )


def sql_mann_kendall(points_cte: str, group_expr: str) -> str:
    """DuckDB mirror over ``(g, x, y)`` — keep in lockstep. Emits
    ``mk_out(g, s_stat, var_s, z, p_value, n_points)``."""
    from ..functions.mathx import sql_erf

    return f"""
mk_s AS (
  SELECT a.g, SUM(CAST(SIGN(b.y - a.y) AS BIGINT)) AS s_stat
  FROM {points_cte} a JOIN {points_cte} b ON a.g = b.g AND a.x < b.x
  GROUP BY a.g
),
mk_n AS (SELECT g, COUNT(*) AS n FROM {points_cte} GROUP BY g),
mk_ties AS (
  SELECT g, SUM(t * (t - 1) * (2 * t + 5)) AS tie FROM (
    SELECT g, y, COUNT(*) AS t FROM {points_cte} GROUP BY 1, 2 HAVING COUNT(*) > 1
  ) GROUP BY g
),
mk_v AS (
  SELECT s.g, s.s_stat, n.n,
         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(t.tie, 0) AS DOUBLE)
           / 18.0 AS var_s
  FROM mk_s s JOIN mk_n n ON s.g = n.g LEFT JOIN mk_ties t ON s.g = t.g
),
mk_z AS (
  SELECT g, s_stat, var_s, n,
         CASE WHEN var_s <= 0 THEN 0.0
              WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / SQRT(var_s)
              WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / SQRT(var_s)
              ELSE 0.0 END AS z
  FROM mk_v
),
mk_out AS (
  SELECT g AS {group_expr}, CAST(s_stat AS BIGINT) AS s_stat, var_s, z,
         ROUND(1.0 - {sql_erf(f'(abs(z) / {_SQRT2})')}, 9) AS p_value,
         CAST(n AS BIGINT) AS n_points
  FROM mk_z
)"""
