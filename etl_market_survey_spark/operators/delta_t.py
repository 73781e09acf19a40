"""Δt threshold-grid construction + MAD aggregation + argmin (SURVEY
J4/R4/A2/A5; reference time_resolution_beta_scan.py:32-67).

Reference semantics: per trigger, two pulses; for every (k1, k2) in a
9 x 9 CFD-threshold grid compute ``Δt = t_k1(pulse1) - t_k2(pulse2)``;
aggregate MAD over triggers per (k1, k2); pick the (k1, k2) minimizing it.

Spark-first shape: the 81x blowup is an ``explode(sequence())`` cross
*before* the single groupBy shuffle, so partial aggregation (map-side
combine) sees the whole grid in one pass — the reference's driver loop
over replicas/thresholds becomes one job. At 10k triggers x 34 replicas
x 81 pairs (~27.5M rows, BASELINE.md) this is one shuffle of small
(k1, k2, replica) keys — the plan that survives 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import group_mad

THRESHOLDS = list(range(10, 100, 10))  # 10..90 %, reference :44-45


def delta_t_grid(
    pulses: DataFrame,
    trigger_col: str,
    t1_col: str,
    t2_col: str,
    thresholds: list[int] | None = None,
) -> DataFrame:
    """Explode the (k1, k2) grid and compute Δt.

    ``pulses``: one row per trigger with pulse-1/pulse-2 base times.
    ``t_k(p) = t_p * k/100`` — a monotone threshold-crossing model; with
    real CFD columns (t_10..t_90) pass a wide frame through ``melt`` first.
    Output: ``(trigger, k_1 (%), k_2 (%), Δt (s))`` — 81 rows per trigger.
    """
    ks = thresholds or THRESHOLDS
    seq = F.array([F.lit(k) for k in ks])
    return (
        pulses.withColumn("k_1 (%)", F.explode(seq))
        .withColumn("k_2 (%)", F.explode(seq))
        .select(
            F.col(trigger_col),
            F.col("k_1 (%)"),
            F.col("k_2 (%)"),
            (
                F.col(t1_col) * F.col("k_1 (%)") / F.lit(100.0)
                - F.col(t2_col) * F.col("k_2 (%)") / F.lit(100.0)
            ).alias("Δt (s)"),
        )
    )


def mad_per_threshold_pair(delta_t: DataFrame, extra_keys: list[str] | None = None) -> DataFrame:
    """A2 — k·MAD(Δt) per (k_1, k_2) [x extra keys e.g. replica id]."""
    keys = ["k_1 (%)", "k_2 (%)"] + (extra_keys or [])
    return group_mad(delta_t, keys, "Δt (s)", "MAD(Δt) k_MADstd (s)", scaled=True)


def best_threshold_pair(mad: DataFrame, metric: str = "MAD(Δt) k_MADstd (s)") -> DataFrame:
    """A5 — argmin over the grid, deterministic tiebreak on (k1, k2)."""
    return mad.orderBy(F.col(metric).asc(), F.col("k_1 (%)"), F.col("k_2 (%)")).limit(1)
