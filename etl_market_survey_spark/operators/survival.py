"""Kaplan-Meier survival estimation (beyond reference — churn/retention
analytics).

The product-limit estimator S(t) = Π_{t_i<=t} (1 - d_i/n_i) over
right-censored durations — the standard churn curve. Spark-first shape:
one aggregation to (group, duration) event/censor counts, a reverse
running sum for the risk set, and the running product expressed as
exp(Σ ln(1-d/n)) so the cross-duration reduction is a windowed EXACT
decimal sum of round-9-gated log terms (the repo's libm discipline) —
partitioning can never change a bit, and a SQL oracle replays it
(q208). Per-group state is |distinct durations|, not users.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Per group, one row per duration with >= 1 observed event:
    ``n_at_risk``, ``d_events``, ``log_surv`` (exact decimal sum of
    round-9 log terms) and ``surv`` (round-9 exp). ``event_col`` is
    1 = event observed (churn), 0 = right-censored."""
    at = df.groupBy(*group_cols, duration_col).agg(
        F.count("*").alias("_n_at"),
        F.sum(F.col(event_col).cast("long")).alias("d_events"),
    )
    w_risk = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = at.withColumn("n_at_risk", F.sum("_n_at").over(w_risk))
    # d == n (everyone at risk dies — the standard case at the largest
    # event time with no later censoring) means S(t) = 0 exactly; feeding
    # it into ln() would NULL out the term (Spark) or raise (DuckDB).
    # Guard: the term is only defined for d < n, and once any duration hit
    # d == n the curve is pinned at surv = 0 with a NULL log_surv sentinel.
    term = F.when(
        F.col("d_events") < F.col("n_at_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("d_events").cast("double") / F.col("n_at_risk").cast("double")
            ),
            9,
        ),
    )
    ev = risk.filter(F.col("d_events") > 0).withColumn("_term", term)
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dead = F.max(
        (F.col("d_events") >= F.col("n_at_risk")).cast("int")
    ).over(w_cum)
    log_surv = (
        F.sum(F.floor(F.col("_term") * F.lit(1e9)).cast("decimal(38,0)")).over(w_cum)
        .cast("double")
        / F.lit(1e9)
    )
    return (
        ev.withColumn("_dead", dead)
        .withColumn(
            "log_surv", F.when(F.col("_dead") == 0, log_surv)
        )
        .withColumn(
            "surv",
            F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.col("log_surv")), 9)
            ),
        )
        .select(
            *group_cols,
            duration_col,
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("d_events").cast("long").alias("d_events"),
            "log_surv",
            "surv",
        )
    )


def sql_kaplan_meier(
    table: str,
    group_expr: str,
    duration_expr: str,
    event_expr: str,
) -> str:
    """DuckDB mirror of :func:`kaplan_meier` — keep in lockstep."""
    return f"""
WITH at AS (
  SELECT {group_expr} AS g, {duration_expr} AS dur,
         COUNT(*) AS n_at, SUM(CAST({event_expr} AS BIGINT)) AS d_events
  FROM {table} GROUP BY 1, 2
),
risk AS (
  SELECT g, dur, d_events,
         SUM(n_at) OVER (PARTITION BY g ORDER BY dur DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_at_risk
  FROM at
),
ev AS (
  SELECT g, dur, n_at_risk, d_events,
         CASE WHEN d_events < n_at_risk THEN
           ROUND(LN(1.0 - CAST(d_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE)), 9)
         END AS term
  FROM risk WHERE d_events > 0
),
cum AS (
  SELECT g, dur, n_at_risk, d_events,
         MAX(CASE WHEN d_events >= n_at_risk THEN 1 ELSE 0 END) OVER (
            PARTITION BY g ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS dead,
         (CAST(SUM(CAST(FLOOR(term * 1000000000.0) AS DECIMAL(38,0))) OVER (
            PARTITION BY g ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS DOUBLE) / 1000000000.0) AS raw_log_surv
  FROM ev
)
SELECT g, dur, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CASE WHEN dead = 0 THEN raw_log_surv END AS log_surv,
       CASE WHEN dead = 1 THEN 0.0
            ELSE ROUND(EXP(raw_log_surv), 9) END AS surv
FROM cum
"""


def nelson_aalen(
    df: DataFrame,
    group_cols: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{t_i <= t} d_i/n_i —
    Kaplan-Meier's additive sibling (the hazard view the product-limit
    curve hides; exp(-H) is the Breslow survival estimate).

    Fully INTEGER: each increment lives on a 1e-9 fixed-point grid as
    ``(d * 10^9) div n`` (no floats anywhere until the final display
    division — even stricter than KM's round-9 log terms, because the
    hazard increments are plain rationals). One groupBy to (group,
    duration) counts, one reverse running sum for the risk set, one
    forward running integer sum."""
    at = df.groupBy(*group_cols, duration_col).agg(
        F.count("*").alias("_n_at"),
        F.sum(F.col(event_col).cast("long")).alias("d_events"),
    )
    w_risk = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = at.withColumn("n_at_risk", F.sum("_n_at").over(w_risk))
    ev = risk.filter(F.col("d_events") > 0).withColumn(
        "_inc",
        F.expr("(d_events * 1000000000L) div n_at_risk"),
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.withColumn(
        "cum_hazard_g9", F.sum("_inc").over(w_cum)
    ).select(
        *group_cols,
        duration_col,
        "n_at_risk",
        "d_events",
        F.col("cum_hazard_g9").cast("long").alias("cum_hazard_g9"),
        F.round(F.col("cum_hazard_g9").cast("double") / F.lit(1e9), 9).alias(
            "cum_hazard"
        ),
    )


def sql_nelson_aalen(
    source: str, group_expr: str, dur_expr: str, event_expr: str
) -> str:
    """DuckDB replay of :func:`nelson_aalen` — same integer grid."""
    return f"""
SELECT g, dur, n_at_risk, d_events,
       CAST(SUM(inc) OVER (PARTITION BY g ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_hazard_g9,
       ROUND(CAST(SUM(inc) OVER (PARTITION BY g ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e9, 9) AS cum_hazard
FROM (
  SELECT g, dur, n_at_risk, d_events,
         (d_events * 1000000000) // n_at_risk AS inc
  FROM (
    SELECT g, dur, d_events,
           SUM(n_at) OVER (PARTITION BY g ORDER BY dur DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
    FROM (
      SELECT {group_expr} AS g, {dur_expr} AS dur,
             COUNT(*) AS n_at, SUM({event_expr}) AS d_events
      FROM {source} GROUP BY 1, 2
    )
  ) WHERE d_events > 0
)"""
