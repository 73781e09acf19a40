"""As-of join — an operator Spark has no built-in for, composed from
union + window (SURVEY §7's "custom operators" guidance: composition of
DataFrame ops before UDFs).

For each left row, attach the most recent right row with
``right.on <= left.on`` (per ``by`` key, optional tolerance) — the
standard market-data/telemetry enrichment join (DuckDB/pandas ASOF JOIN,
kdb aj).

Plan shape: tag sides, union, ONE window pass per key ordered by
(on, side) with ``last(ignorenulls)`` carrying right values forward,
filter back to left rows. Cost = one shuffle on the key — strictly
cheaper than the naive range-join (which explodes) and equivalent to a
merge-asof at any scale. Skewed keys split via AQE; no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    tolerance: int | float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows + latest right values at-or-before.

    ``on`` must be mutually comparable across both frames (numeric or
    timestamp). ``value_cols`` default: all right columns except keys.
    ``tolerance``: max allowed (left.on - right.on); matches farther back
    become NULL. Adds ``{on}{suffix}`` (matched right timestamp) and
    ``{v}{suffix}`` per value column.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
    )
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema[f"{on}{suffix}"].dataType).alias(f"{on}{suffix}"),
        *[
            F.lit(None).cast(r.schema[f"{v}{suffix}"].dataType).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal `on`: <= semantics
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in [f"{on}{suffix}"] + [f"{v}{suffix}" for v in value_cols]:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        stale = (F.col(on) - F.col(f"{on}{suffix}")) > F.lit(tolerance)
        for c in [f"{on}{suffix}"] + [f"{v}{suffix}" for v in value_cols]:
            out = out.withColumn(c, F.when(~stale, F.col(c)))
    return out


def sessionize(
    df: DataFrame,
    by: Sequence[str],
    ts_col: str,
    gap: int | float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (per key) exceeds ``gap``. One window pass:
    lag -> boundary flag -> running sum = session index."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(F.col(ts_col))
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap)), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
