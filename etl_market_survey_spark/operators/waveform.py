"""Waveform feature extraction — reconstructs the reference's
``beta_scan_measured_data`` columns (FIXTURES.md §1: Amplitude, Noise,
Collected charge, t_10..t_90, Rise time) from the raw ``waveforms`` table
(FIXTURES.md §2: one row per ADC sample, keyed n_trigger/device_name).

The reference receives these features from the acquisition software; an
engine that owns the raw samples must compute them.

Plan shape: ONE aggregation per (trigger, device) — the whole waveform is
collected as a time-sorted struct array and every feature (baseline/noise
medians, amplitude, integrated charge, all nine CFD crossing times) is an
array expression over it. One shuffle, no window, no self-join, no
Python. Memory per group = samples x 16 B (a 100k-sample digitizer trace
is 1.6 MB — bounded by hardware, not data scale).

All intermediate arrays/scalars are materialized as columns before use in
lambdas (captured expressions re-evaluate per element — see
functions/stats.mad_of_sorted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import K_MAD_TO_STD, median_of_sorted

THRESHOLDS = list(range(10, 100, 10))


def _crossing_expr(samples: Column, level: Column, t_peak: Column) -> Column:
    """First rising-edge crossing of ``level`` before ``t_peak``:
    linear interpolation between the bracketing sample pair."""
    n = F.size(samples)
    idx = F.sequence(F.lit(1), n - 1)
    brackets = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(samples, i)["t"].alias("t0"),
                F.element_at(samples, i)["a"].alias("a0"),
                F.element_at(samples, i + 1)["t"].alias("t1"),
                F.element_at(samples, i + 1)["a"].alias("a1"),
            ),
        ),
        lambda p: (p["a0"] <= level) & (p["a1"] > level) & (p["t0"] < t_peak),
    )
    first = F.element_at(brackets, 1)
    return F.when(
        F.size(brackets) > 0,
        first["t0"]
        + (level - first["a0"]) * (first["t1"] - first["t0"]) / (first["a1"] - first["a0"]),
    )


def waveform_features(
    df: DataFrame,
    trigger_col: str = "n_trigger",
    device_col: str = "device_name",
    time_col: str = "Time (s)",
    amp_col: str = "Amplitude (V)",
    baseline_end: float | None = None,
    exact_sums: bool = False,
) -> DataFrame:
    """Per (trigger, device): baseline, noise, amplitude, charge,
    ``t_10 (s)`` .. ``t_90 (s)`` and ``Rise time (s)``.

    ``exact_sums=True`` routes the charge integral's sample sum through
    an exact decimal sum on a 1e-9 V grid — order-independent, so the
    charge is bit-identical across partitionings and SQL-replayable
    (the q47 gate); the default keeps the raw double sum (marginally
    cheaper, and exact enough for physics use)."""
    keys = [trigger_col, device_col]
    t, a = F.col(time_col), F.col(amp_col)

    if baseline_end is None:
        # default pre-pulse region: first 10% of the global time span
        span = df.groupBy().agg(F.min(t).alias("_t0"), F.max(t).alias("_t1"))
        df = df.crossJoin(F.broadcast(span)).withColumn(
            "_pre", t < (F.col("_t0") + (F.col("_t1") - F.col("_t0")) * 0.1)
        )
    else:
        df = df.withColumn("_pre", t < F.lit(baseline_end))

    g = (
        df.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(t.alias("t"), a.alias("a")))
            ).alias("_samples"),  # struct sort: by t first — time order
            F.array_sort(F.collect_list(F.when(F.col("_pre"), a))).alias("_base_arr"),
            F.max(a).alias("_peak"),
            F.max_by(t, a).alias("_t_peak"),
            (
                F.sum(F.floor(a * F.lit(1e9)).cast("decimal(38,0)")).cast("double")
                / F.lit(1e9)
                if exact_sums
                else F.sum(a)
            ).alias("_sum_a"),
            F.count("*").alias("_n"),
            (F.max(t) - F.min(t)).alias("_span"),
        )
        .withColumn("_baseline", median_of_sorted(F.col("_base_arr")))
        .withColumn(
            "_devs",
            F.array_sort(
                F.transform(F.col("_base_arr"), lambda v: F.abs(v - F.col("_baseline")))
            ),
        )
        .withColumn("_noise", F.lit(K_MAD_TO_STD) * median_of_sorted(F.col("_devs")))
        .withColumn("_amplitude", F.col("_peak") - F.col("_baseline"))
        .withColumn("_dt", F.col("_span") / (F.col("_n") - 1))
        .withColumn(
            "_charge",
            (F.col("_sum_a") - F.col("_baseline") * F.col("_n")) * F.col("_dt"),
        )
    )
    for k in THRESHOLDS:
        level = F.col("_baseline") + F.col("_amplitude") * F.lit(k / 100.0)
        g = g.withColumn(
            f"t_{k} (s)", _crossing_expr(F.col("_samples"), level, F.col("_t_peak"))
        )
    return g.select(
        *keys,
        F.col("_baseline").alias("Baseline (V)"),
        F.col("_noise").alias("Noise (V)"),
        F.col("_amplitude").alias("Amplitude (V)"),
        F.col("_charge").alias("Collected charge (V s)"),
        *[F.col(f"`t_{k} (s)`") for k in THRESHOLDS],
        (F.col("`t_90 (s)`") - F.col("`t_10 (s)`")).alias("Rise time (s)"),
    )
