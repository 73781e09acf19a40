"""Inverse interpolation / threshold crossing (SURVEY U4; reference
fit_erf_and_calculate_calibration_factor.py:159-174 and
calculate_inter_pixel_distance_for_single_1D_scan.py:11-43 — interpolate
x(y) on a sorted curve and evaluate at a target y).

Spark-first: window ``lead``-bracketing + linear interpolation — pure
built-ins, one window pass per partition, SQL-expressible (so the oracle
can verify it, unlike a UDF implementation). For each partition, find the
first row where y crosses the threshold (ascending curves) and emit

    x* = x0 + (thr - y0) * (x1 - x0) / (y1 - y0)

Ties/duplicates on y are handled by the deterministic (order columns)
window order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def crossing_x(
    df: DataFrame,
    partition: Sequence[str],
    x_col: str,
    y_col: str,
    threshold: float,
    out: str = "x_at_threshold",
) -> DataFrame:
    """First upward crossing of ``threshold`` per partition.

    Output: one row per partition that crosses: ``(partition..., out)``.
    """
    partition = list(partition)
    w = Window.partitionBy(*partition).orderBy(F.col(x_col))
    with_next = (
        df.select(*partition, x_col, y_col)
        .withColumn("_x1", F.lead(x_col).over(w))
        .withColumn("_y1", F.lead(y_col).over(w))
    )
    bracket = with_next.filter(
        (F.col(y_col) <= F.lit(threshold))
        & (F.col("_y1") > F.lit(threshold))
        & F.col("_y1").isNotNull()
    )
    interp = F.col(x_col) + (F.lit(threshold) - F.col(y_col)) * (
        F.col("_x1") - F.col(x_col)
    ) / (F.col("_y1") - F.col(y_col))
    # first crossing only (deterministic: min x among brackets)
    crossed = bracket.withColumn("_xstar", interp)
    return (
        crossed.groupBy(*partition)
        .agg(F.min_by(F.col("_xstar"), F.col(x_col)).alias(out))
    )
