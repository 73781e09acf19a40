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

from pyspark.sql import DataFrame, Window
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


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/touching ``[start, end]`` intervals per key —
    the classic gaps-and-islands union (uptime stitching, covered-time
    accounting, span-dedup post-processing). Inclusive touch: an
    interval starting exactly at the running max end extends the
    island.

    Shape: one window over (key, start, end) — the island flag is
    ``start > max(end) over preceding rows``, island id its running
    sum, then one (key, island) groupBy: min start, max end, count.
    Integer-exact; state per key is one running max.

    Output: ``(key, island_id, start, end, n_merged)``.
    """
    flagged = df.select(
        F.col(key_col).alias("_k"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    ).withColumn(
        "_new",
        F.when(
            F.col("_s")
            > F.max("_e").over(
                Window.partitionBy("_k")
                .orderBy("_s", "_e")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            Window.partitionBy("_k")
            .orderBy("_s", "_e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("_k", "_island")
        .agg(
            F.min("_s").alias("start"),
            F.max("_e").alias("end"),
            F.count("*").cast("long").alias("n_merged"),
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("_island").cast("long").alias("island_id"),
            "start",
            "end",
            "n_merged",
        )
    )
