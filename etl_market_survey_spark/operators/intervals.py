"""Interval apportionment onto fixed time buckets (beyond reference).

The billing/uptime/occupancy primitive: each (start, end) interval
contributes to every bucket it overlaps, weighted by the overlap
duration — "compute hours per week", "active orders per epoch",
"sensor-on time per shift". SQL engines make you hand-roll this with a
calendar join; here it is one map-only explode + one aggregation.

Exactness: pure int64 epoch-nano arithmetic — bucket ids are integer
division, overlaps are min/max differences, totals are exact long sums.
Nothing floats.

Scale shape: the explode factor per interval is its bucket span
(length/bucket + 1) — bounded and data-proportional; no join against a
calendar table, no shuffle before the final per-bucket aggregation
(map-side combined). Skew = one very long interval, which is visible,
not a hash-partition accident; clamp spans upstream when the domain
allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apportion_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bucket_ns: int,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (interval, overlapped bucket): ``bucket`` (id on the
    ``bucket_ns`` grid), ``overlap_ns`` (> 0), plus ``keep_cols``.
    Zero/negative-length intervals contribute nothing."""
    b = int(bucket_ns)
    s, e = F.col(start_col), F.col(end_col)
    rows = df.filter(e > s).select(
        *keep_cols,
        s.alias("_s"),
        e.alias("_e"),
        # floor division via pmod (`div` truncates toward zero, which
        # disagrees with DuckDB's `//` for pre-1970 negative timestamps)
        F.explode(
            F.sequence(
                F.expr(f"({start_col} - pmod({start_col}, {b})) div {b}"),
                F.expr(f"(({end_col} - 1) - pmod({end_col} - 1, {b})) div {b}"),
            )
        ).alias("bucket"),
    )
    b_start = F.col("bucket") * b
    overlap = F.least(F.col("_e"), b_start + b) - F.greatest(F.col("_s"), b_start)
    return rows.select(
        *keep_cols, "bucket", overlap.alias("overlap_ns")
    ).filter(F.col("overlap_ns") > 0)


def bucket_totals(apportioned: DataFrame) -> DataFrame:
    """Per-bucket aggregate of an :func:`apportion_intervals` result:
    exact total overlap and the number of contributing intervals."""
    return apportioned.groupBy("bucket").agg(
        F.sum("overlap_ns").alias("total_ns"),
        F.count("*").alias("n_intervals"),
    )
