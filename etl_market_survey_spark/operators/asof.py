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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows + matched right values.

    ``direction``: ``'backward'`` (latest right at-or-before — the
    market-data default), ``'forward'`` (earliest right at-or-after),
    or ``'nearest'`` (smaller absolute gap, ties to backward — the
    pandas ``merge_asof`` convention). All three run as the same
    union + one-window-pass shape (two passes for nearest), one shuffle
    on the key, no range-join explosion.

    ``on`` must be mutually comparable across both frames (numeric or
    timestamp). ``value_cols`` default: all right columns except keys.
    ``tolerance``: max allowed |left.on - right.on|; matches farther
    away become NULL. Adds ``{on}{suffix}`` (matched right timestamp)
    and ``{v}{suffix}`` per value column.
    """
    by = list(by)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        b = asof_join(
            left, right, on, by, value_cols, tolerance, suffix="_bwd"
        )
        f = asof_join(
            b, right, on, by, value_cols, tolerance, suffix="_fwd",
            direction="forward",
        )
        if value_cols is None:
            value_cols = [c for c in right.columns if c not in by and c != on]
        gap_b = F.col(on) - F.col(f"{on}_bwd")
        gap_f = F.col(f"{on}_fwd") - F.col(on)
        use_b = F.col(f"{on}_fwd").isNull() | (
            F.col(f"{on}_bwd").isNotNull() & (gap_b <= gap_f)
        )
        out = f
        for c in [on] + list(value_cols):
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(use_b, F.col(f"{c}_bwd")).otherwise(F.col(f"{c}_fwd")),
            )
        return out.drop(
            *[f"{c}_bwd" for c in [on, *value_cols]],
            *[f"{c}_fwd" for c in [on, *value_cols]],
        )
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    backward = direction == "backward"
    # tie ordering: for <= semantics the equal-`on` right row must fall
    # INSIDE the frame — before left for the backward frame, after left
    # for the forward frame
    r_side, l_side = (0, 1) if backward else (1, 0)
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(r_side).alias("_side"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
    )
    l = left.select(
        "*",
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r.schema[f"{on}{suffix}"].dataType).alias(f"{on}{suffix}"),
        *[
            F.lit(None).cast(r.schema[f"{v}{suffix}"].dataType).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    wbase = Window.partitionBy(*by).orderBy(F.col(on), F.col("_side"))
    if backward:
        w = wbase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = wbase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = unioned
    for c in [f"{on}{suffix}"] + [f"{v}{suffix}" for v in value_cols]:
        carried = carried.withColumn(c, pick(c))
    out = carried.filter(F.col("_side") == l_side).drop("_side")
    if tolerance is not None:
        gap = (
            (F.col(on) - F.col(f"{on}{suffix}"))
            if backward
            else (F.col(f"{on}{suffix}") - F.col(on))
        )
        stale = gap > F.lit(tolerance)
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
