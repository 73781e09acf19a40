"""Classical additive seasonal decomposition (Macaulay 1931 moving-
average method, the statsmodels `seasonal_decompose` recipe) — beyond
reference; the time-series triage every metrics pipeline runs before alerting:
y = trend + seasonal + residual).

The textbook moving-average decomposition for an even period p (the
statsmodels ``seasonal_decompose`` recipe):

1. trend_t = centered MA: (0.5*y_{t-p/2} + y_{t-p/2+1..t+p/2-1} +
   0.5*y_{t+p/2}) / p — NULL where the window is incomplete;
2. seasonal = per-phase mean of the detrended series, centered so the
   p seasonal effects sum to zero;
3. residual = y - trend - seasonal.

Exactness discipline: the input y is an exact-decimal-derived double;
the MA numerator is an integer sum of floor(y*1e6) decimals (doubled
so the two half-weight ends stay integral), divided once in double;
per-phase means are exact decimal sums of floor(detrended*1e9) over
bounded phase sets. No float reassociation anywhere — the DuckDB
oracle replays bit-for-bit (q238).

Scale shape: the windows run over the per-period AGGREGATE (bounded by
calendar), one row per (group, period index) — deliberate small-frame
windows, never fact rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_S6 = 1_000_000.0
_S9 = 1_000_000_000.0


def seasonal_decompose(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    period: int = 12,
) -> DataFrame:
    """Per (group, x): ``(x, y, trend, seasonal, resid)``. ``x_col`` is
    a dense integer period index (e.g. year*12+month); ``period`` must
    be even (the centered-MA recipe); gaps in x produce wrong windows —
    densify first."""
    if period % 2:
        raise ValueError("period must be even (centered MA)")
    half = period // 2
    g = list(group_cols)
    base = df.select(
        *g,
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.floor(F.col(y_col).cast("double") * F.lit(_S6))
        .cast("decimal(38,0)")
        .alias("_yi"),
    )
    w = Window.partitionBy(*g).orderBy("x").rowsBetween(-half, half)
    wo = Window.partitionBy(*g).orderBy("x")
    # doubled numerator: 2 * full-frame sum minus the two end values
    # (ends weigh 1, interior weighs 2 -> everything stays an integral
    # decimal); ends come from lag/lead so no window nests in a sum
    centered = (
        base.withColumn("_cnt", F.count("*").over(w))
        .withColumn(
            "_num",
            F.lit(2) * F.sum("_yi").over(w)
            - F.lag("_yi", half).over(wo)
            - F.lead("_yi", half).over(wo),
        )
    )
    trend = F.when(
        F.col("_cnt") == period + 1,
        F.col("_num").cast("double") / F.lit(2.0 * period * _S6),
    )
    t = centered.withColumn("trend", trend).drop("_cnt", "_num")
    detr = t.withColumn("_d", F.col("y") - F.col("trend")).withColumn(
        "phase", F.pmod(F.col("x"), F.lit(period))
    )
    ph = (
        detr.filter(F.col("_d").isNotNull())
        .groupBy(*g, "phase")
        .agg(
            (
                F.sum(
                    F.floor(F.col("_d") * F.lit(_S9)).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(_S9)
                / F.count("*")
            ).alias("_sraw")
        )
    )
    # center: subtract the mean of the per-phase effects (decimal-exact)
    ctr = ph.groupBy(*g).agg(
        (
            F.sum(F.floor(F.col("_sraw") * F.lit(_S9)).cast("decimal(38,0)")).cast(
                "double"
            )
            / F.lit(_S9)
            / F.count("*")
        ).alias("_soff")
    )
    seas = ph.join(ctr, g).select(
        *g, "phase", (F.col("_sraw") - F.col("_soff")).alias("seasonal")
    )
    return (
        detr.join(seas, g + ["phase"], "left")
        .select(
            *g,
            "x",
            "y",
            "trend",
            "seasonal",
            (F.col("y") - F.col("trend") - F.col("seasonal")).alias("resid"),
        )
    )


def sql_seasonal_decompose(
    points_cte: str,
    period: int = 12,
) -> str:
    """DuckDB mirror over a CTE exposing ``(g, x, y)`` with dense x —
    keep in lockstep. Emits ``sd_out(g, x, y, trend, seasonal, resid)``."""
    half = period // 2
    return f"""
sd_base AS (
  SELECT g, x, y,
         CAST(FLOOR(y * 1000000.0) AS DECIMAL(38,0)) AS yi
  FROM {points_cte}
),
sd_ma AS (
  SELECT g, x, y,
         COUNT(*) OVER w AS cnt,
         2 * SUM(yi) OVER w
           - LAG(yi, {half}) OVER wo
           - LEAD(yi, {half}) OVER wo AS num
  FROM sd_base
  WINDOW w AS (PARTITION BY g ORDER BY x
               ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING),
         wo AS (PARTITION BY g ORDER BY x)
),
sd_t AS (
  SELECT g, x, y,
         CASE WHEN cnt = {period + 1}
              THEN CAST(num AS DOUBLE) / {2.0 * period * 1_000_000.0}
         END AS trend
  FROM sd_ma
),
sd_d AS (
  SELECT *, y - trend AS d, x % {period} AS phase FROM sd_t
),
sd_ph AS (
  SELECT g, phase,
         CAST(SUM(CAST(FLOOR(d * 1000000000.0) AS DECIMAL(38,0))) AS DOUBLE)
           / 1000000000.0 / COUNT(*) AS sraw
  FROM sd_d WHERE d IS NOT NULL GROUP BY 1, 2
),
sd_ctr AS (
  SELECT g,
         CAST(SUM(CAST(FLOOR(sraw * 1000000000.0) AS DECIMAL(38,0))) AS DOUBLE)
           / 1000000000.0 / COUNT(*) AS soff
  FROM sd_ph GROUP BY 1
),
sd_out AS (
  SELECT d.g, d.x, d.y, d.trend,
         (p.sraw - c.soff) AS seasonal,
         d.y - d.trend - (p.sraw - c.soff) AS resid
  FROM sd_d d
  LEFT JOIN sd_ph p ON d.g = p.g AND d.phase = p.phase
  LEFT JOIN sd_ctr c ON d.g = c.g
)"""
