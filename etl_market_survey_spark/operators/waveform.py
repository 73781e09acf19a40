"""Waveform feature extraction — reconstructs the reference's
``beta_scan_measured_data`` columns (FIXTURES.md §1: Amplitude, Noise,
Collected charge, t_10..t_90, Rise time) from the raw ``waveforms`` table
(FIXTURES.md §2: one row per ADC sample, keyed n_trigger/device_name).

The reference receives these features from the acquisition software; an
engine that owns the raw samples must compute them. All built-ins:

- baseline/noise: median/MAD of the pre-pulse region (Time < t_baseline)
- amplitude: max(A) - baseline; charge: Σ(A - baseline)·dt
- CFD crossing times t_k: linear interpolation at the first rising-edge
  sample pair bracketing k% of amplitude — one window ``lead`` pass
  cross-joined with the threshold grid (the same bracketing idiom as
  operators/interpolate.crossing_x, vectorized over 9 thresholds).

One shuffle on (trigger, device); the threshold grid explodes AFTER the
per-waveform stats join, so grid rows carry only 4 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stats import K_MAD_TO_STD, median_of_sorted

THRESHOLDS = list(range(10, 100, 10))


def waveform_features(
    df: DataFrame,
    trigger_col: str = "n_trigger",
    device_col: str = "device_name",
    time_col: str = "Time (s)",
    amp_col: str = "Amplitude (V)",
    baseline_end: float | None = None,
) -> DataFrame:
    """Per (trigger, device): baseline, noise, amplitude, charge,
    ``t_10 (s)`` .. ``t_90 (s)`` and ``Rise time (s)``."""
    keys = [trigger_col, device_col]
    t, a = F.col(time_col), F.col(amp_col)

    if baseline_end is None:
        # default pre-pulse region: first 10% of the time span
        span = df.groupBy().agg(
            F.min(t).alias("_t0"), F.max(t).alias("_t1")
        )
        df = df.crossJoin(F.broadcast(span)).withColumn(
            "_pre", t < (F.col("_t0") + (F.col("_t1") - F.col("_t0")) * 0.1)
        )
    else:
        df = df.withColumn("_pre", t < F.lit(baseline_end))

    stats = (
        df.groupBy(*keys)
        .agg(
            F.array_sort(F.collect_list(F.when(F.col("_pre"), a))).alias("_base_arr"),
            F.max(a).alias("_peak"),
            F.min(t).alias("_tmin"),
            F.max_by(t, a).alias("_t_peak"),
            F.sum(a).alias("_sum_a"),
            F.count("*").alias("_n"),
            (F.max(t) - F.min(t)).alias("_span"),
        )
        .withColumn("_baseline", median_of_sorted(F.col("_base_arr")))
        .withColumn(
            "_noise",
            F.lit(K_MAD_TO_STD)
            * median_of_sorted(
                F.array_sort(
                    F.transform(
                        F.col("_base_arr"),
                        lambda v: F.abs(v - F.col("_baseline")),
                    )
                )
            ),
        )
        .withColumn("_amplitude", F.col("_peak") - F.col("_baseline"))
        .withColumn("_dt", F.col("_span") / (F.col("_n") - 1))
        .withColumn(
            "_charge",
            (F.col("_sum_a") - F.col("_baseline") * F.col("_n")) * F.col("_dt"),
        )
        .select(
            *keys, "_baseline", "_noise", "_amplitude", "_charge", "_t_peak"
        )
    )

    w = Window.partitionBy(*keys).orderBy(t)
    edges = (
        df.select(*keys, t.alias("_t"), a.alias("_a"))
        .withColumn("_t1", F.lead("_t").over(Window.partitionBy(*keys).orderBy("_t")))
        .withColumn("_a1", F.lead("_a").over(Window.partitionBy(*keys).orderBy("_t")))
        .join(stats, keys)
        .filter(F.col("_t") < F.col("_t_peak"))  # rising edge only
    )
    ks = F.explode(F.array(*[F.lit(k) for k in THRESHOLDS])).alias("_k")
    level = F.col("_baseline") + F.col("_amplitude") * F.col("_k") / 100.0
    crossings = (
        edges.select(*keys, "_t", "_a", "_t1", "_a1", "_baseline", "_amplitude", ks)
        .withColumn("_level", level)
        .filter(
            (F.col("_a") <= F.col("_level"))
            & (F.col("_a1") > F.col("_level"))
            & F.col("_a1").isNotNull()
        )
        .withColumn(
            "_x",
            F.col("_t")
            + (F.col("_level") - F.col("_a"))
            * (F.col("_t1") - F.col("_t"))
            / (F.col("_a1") - F.col("_a")),
        )
        .groupBy(*keys)
        .pivot("_k", THRESHOLDS)
        .agg(F.min("_x"))
    )
    for k in THRESHOLDS:
        crossings = crossings.withColumnRenamed(str(k), f"t_{k} (s)")

    out = stats.join(crossings, keys, "left").select(
        *keys,
        F.col("_baseline").alias("Baseline (V)"),
        F.col("_noise").alias("Noise (V)"),
        F.col("_amplitude").alias("Amplitude (V)"),
        F.col("_charge").alias("Collected charge (V s)"),
        *[F.col(f"`t_{k} (s)`") for k in THRESHOLDS],
        (F.col("`t_90 (s)`") - F.col("`t_10 (s)`")).alias("Rise time (s)"),
    )
    return out
