"""Offline model-evaluation metrics (beyond reference — the eval side
of a training-data pipeline).

All three classics as exact distributed aggregations:

- **AUC** via the Mann-Whitney rank statistic with tie-averaged ranks
  kept as 2x-scaled integers (the q150 Spearman trick): per distinct
  score, integer cumulative counts give the doubled average rank; the
  only float op is the final division. One aggregation on (group,
  score) + one tiny per-group window — never a per-pair comparison
  (the naive AUC is O(n_pos * n_neg)).
- **Brier / reliability bins**: exact decimal sums of (p - y)^2 and
  per-bin pooled fractions.
- **Confusion matrix @ threshold** with precision/recall/F1 as single
  double divisions of exact integer counts.

Each has a SQL mirror; q209-q211 hash-gate them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stats import dsum


def auc_mann_whitney(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str | Column,
    label_col: str | Column,
) -> DataFrame:
    """Per group: n, n_pos, and the exact rank-statistic AUC of
    ``score_col`` predicting binary ``label_col`` (ties averaged)."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "long"
    )
    sc = df.groupBy(*group_cols, score.alias("_s")).agg(
        F.sum(label).alias("_np_at"), F.count("*").alias("_n_at")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # doubled average rank of every row tied at this score:
    # 2*(rows strictly below) + (rows tied) + 1
    r2 = 2 * F.coalesce(F.sum("_n_at").over(w), F.lit(0)) + F.col("_n_at") + 1
    agg = (
        sc.withColumn("_r2", r2)
        .groupBy(*group_cols)
        .agg(
            F.sum("_n_at").alias("n"),
            F.sum("_np_at").alias("n_pos"),
            F.sum(F.col("_np_at") * F.col("_r2")).alias("_s2"),
        )
    )
    npos, n = F.col("n_pos"), F.col("n")
    den = (2 * npos * (n - npos)).cast("double")
    # single-class groups have no pair ordering to score: NULL, never a
    # fabricated number (ANSI division would otherwise throw)
    auc = F.when(
        den > 0, (F.col("_s2") - npos * (npos + 1)).cast("double") / den
    )
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        npos.cast("long").alias("n_pos"),
        auc.alias("auc"),
    )


def sql_auc_mann_whitney(
    table: str, group_expr: str, score_expr: str, label_expr: str
) -> str:
    """DuckDB mirror of :func:`auc_mann_whitney` — keep in lockstep."""
    return f"""
WITH sc AS (
  SELECT {group_expr} AS g, {score_expr} AS s,
         SUM(CAST({label_expr} AS BIGINT)) AS np_at, COUNT(*) AS n_at
  FROM {table} GROUP BY 1, 2
),
rk AS (
  SELECT g, s, np_at, n_at,
         2 * COALESCE(SUM(n_at) OVER (
           PARTITION BY g ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) + n_at + 1 AS r2
  FROM sc
),
agg AS (
  SELECT g, SUM(n_at) AS n, SUM(np_at) AS n_pos, SUM(np_at * r2) AS s2
  FROM rk GROUP BY 1
)
SELECT g, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CASE WHEN 2 * n_pos * (n - n_pos) > 0
            THEN (CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                  / CAST(2 * n_pos * (n - n_pos) AS DOUBLE))
       END AS auc
FROM agg
"""


def reliability_bins(
    df: DataFrame,
    prob_col: str | Column,
    label_col: str | Column,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration table: per probability bin, n, mean predicted p
    (exact decimal) and observed positive fraction — plus the pooled
    Brier score repeated per row is left to callers; see q210."""
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("long")
    b = F.least(F.floor(p * n_bins).cast("long"), F.lit(n_bins - 1))
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            (dsum(p) / F.count("*")).alias("mean_p"),
            (F.sum(y).cast("double") / F.count("*")).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def sql_reliability_bins(
    table: str, prob_expr: str, label_expr: str, n_bins: int = 10
) -> str:
    from ..functions.stats import sql_dsum

    return f"""
SELECT LEAST(CAST(FLOOR(({prob_expr}) * {n_bins}) AS BIGINT), {n_bins - 1}) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ({sql_dsum(prob_expr)} / COUNT(*)) AS mean_p,
       (CAST(SUM(CAST({label_expr} AS BIGINT)) AS DOUBLE) / COUNT(*)) AS frac_pos
FROM {table}
GROUP BY 1 ORDER BY 1
"""


def confusion_at_threshold(
    df: DataFrame,
    prob_col: str | Column,
    label_col: str | Column,
    threshold: float = 0.5,
) -> DataFrame:
    """One row: tp/fp/fn/tn + precision/recall/f1 (exact integer counts,
    single double divisions)."""
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("long")
    pred = (p >= F.lit(threshold)).cast("long")
    agg = df.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * y).alias("fn"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    # empty prediction/label classes yield NULL (ANSI-safe), not 0/0
    prec = F.when((tp + fp) > 0, tp.cast("double") / (tp + fp).cast("double"))
    rec = F.when((tp + fn) > 0, tp.cast("double") / (tp + fn).cast("double"))
    return agg.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (2 * tp + fp + fn) > 0,
            (2 * tp).cast("double") / (2 * tp + fp + fn).cast("double"),
        ).alias("f1"),
    )


def sql_confusion_at_threshold(
    table: str, prob_expr: str, label_expr: str, threshold: float = 0.5
) -> str:
    pred = f"CAST(({prob_expr}) >= {threshold!r} AS BIGINT)"
    y = f"CAST({label_expr} AS BIGINT)"
    return f"""
WITH c AS (
  SELECT SUM({pred} * {y}) AS tp,
         SUM({pred} * (1 - {y})) AS fp,
         SUM((1 - {pred}) * {y}) AS fn,
         SUM((1 - {pred}) * (1 - {y})) AS tn
  FROM {table}
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0 THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
FROM c
"""
