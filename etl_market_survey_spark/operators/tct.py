"""TCT 1D-scan operators (SURVEY A11/A12/U5; reference utils.py:58-116,
fit_erf_and_calculate_calibration_factor.py:159-181).

- ``tag_pads`` (A11): exactly two channels per scan; the channel whose
  mean collected charge over the *left half* of scanned positions is
  higher is labeled 'left', the other 'right' (utils.py:58-77).
- ``normalize_collected_charge`` (A12): per group, map the value range
  onto [0,1] using the median over a "metal" region (-> 0) and a
  "silicon" region (-> 1) defined by static position predicates
  (utils.py:79-116).
- ``apply_distance_calibration`` (U5): x' = k * (x - x0) with scalars
  from a one-row calibration frame (J6 scalar broadcast).

All built-in expressions; conditional medians use FILTER-style
``when()`` inside the aggregate so one shuffle covers all regions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import median_of_sorted


def _cond_sorted(value: Column, cond: Column) -> Column:
    """Sorted array of values where cond holds (for exact conditional
    medians in a single aggregation pass)."""
    return F.array_sort(F.collect_list(F.when(cond, value)))


def tag_pads(
    df: DataFrame,
    channel_col: str,
    position_col: str,
    charge_col: str,
    scan_keys: Sequence[str] = (),
) -> DataFrame:
    """A11 — label each channel 'left'/'right' per scan.

    Returns a small map frame ``(scan_keys..., channel, Pad)`` to join
    back onto the fact (broadcast — 2 rows per scan).
    """
    scan_keys = list(scan_keys)
    mid = df.groupBy(*scan_keys).agg(
        ((F.min(position_col) + F.max(position_col)) / 2.0).alias("_mid")
    )
    joined = df.join(F.broadcast(mid), scan_keys) if scan_keys else df.crossJoin(
        F.broadcast(mid)
    )
    left_mean = joined.groupBy(*scan_keys, channel_col).agg(
        F.avg(
            F.when(F.col(position_col) < F.col("_mid"), F.col(charge_col))
        ).alias("_left_mean")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*scan_keys).orderBy(
        F.col("_left_mean").desc(), F.col(channel_col)
    )
    return left_mean.withColumn(
        "Pad", F.when(F.row_number().over(w) == 1, "left").otherwise("right")
    ).select(*scan_keys, channel_col, "Pad")


def normalize_collected_charge(
    df: DataFrame,
    group_keys: Sequence[str],
    value_col: str,
    metal_cond: Column,
    silicon_cond: Column,
    out: str = "Normalized collected charge",
) -> DataFrame:
    """A12 — per group: (x - median_metal) / (median_silicon - median_metal).

    One aggregation pass builds both conditional medians; scalars join
    back broadcast.
    """
    group_keys = list(group_keys)
    meds = (
        df.groupBy(*group_keys)
        .agg(
            _cond_sorted(F.col(value_col), metal_cond).alias("_m"),
            _cond_sorted(F.col(value_col), silicon_cond).alias("_s"),
        )
        .select(
            *group_keys,
            median_of_sorted(F.col("_m")).alias("_med_metal"),
            median_of_sorted(F.col("_s")).alias("_med_silicon"),
        )
    )
    joined = df.join(F.broadcast(meds), group_keys)
    return joined.withColumn(
        out,
        (F.col(value_col) - F.col("_med_metal"))
        / (F.col("_med_silicon") - F.col("_med_metal")),
    ).drop("_med_metal", "_med_silicon")


def apply_distance_calibration(
    df: DataFrame,
    calibration: DataFrame,
    x_col: str,
    out: str | None = None,
    scale_col: str = "scale",
    offset_col: str = "offset",
) -> DataFrame:
    """U5/J6 — x' = scale * (x - offset); calibration is a one-row frame
    (the sidecar-scalar idiom) broadcast via crossJoin."""
    out = out or f"{x_col} calibrated"
    return (
        df.crossJoin(F.broadcast(calibration))
        .withColumn(out, F.col(scale_col) * (F.col(x_col) - F.col(offset_col)))
        .drop(scale_col, offset_col)
    )
