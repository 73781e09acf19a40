"""Grouped isotonic regression — PAVA (beyond reference).

Monotone calibration (probability calibration, dose-response trends,
monotone quality-score normalization) is the classic pool-adjacent-
violators algorithm. Per group it is inherently sequential, so it runs
as an Arrow-batched ``applyInPandas`` kernel — one shuffle on the group
key, O(n) per group, state = the block stack.

Exactness contract (what lets q207 hash-gate a nonlinear fit): PAVA
pools carry **exact integer state** — (sum of 1e6-scaled y, count) —
and a fitted value is emitted as ONE double division of those integers.
The fitted value for a point mathematically equals the minimax
``max_{i<=k} min_{j>=k} avg(y[i..j])`` (Robertson-Wright-Dykstra's
characterization of the isotonic fit), where each candidate average is
the SAME integer-pair division — so a DuckDB oracle can replay the fit
from prefix sums without re-running the sequential algorithm, and the
doubles agree bit-for-bit.

Ties in x: rows are pre-pooled per distinct x (sum/count merge — exact)
before PAVA, the standard secondary-ordering-free treatment.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000.0


def _pava_int(xs: np.ndarray, sums: np.ndarray, cnts: np.ndarray):
    """PAVA over pre-pooled points with integer (sum, count) state.
    Returns fitted double per input point (block sum / block count)."""
    blocks: list[list[int]] = []  # [sum, cnt, n_points]
    for s, c in zip(sums, cnts):
        blocks.append([int(s), int(c), 1])
        # pool while the left neighbor's mean exceeds ours:
        # s_l / c_l > s_r / c_r  <=>  s_l * c_r > s_r * c_l (exact ints)
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            r = blocks.pop()
            blocks[-1][0] += r[0]
            blocks[-1][1] += r[1]
            blocks[-1][2] += r[2]
    out = np.empty(len(xs), dtype=np.float64)
    pos = 0
    for s, c, npts in blocks:
        out[pos : pos + npts] = float(s) / float(c)
        pos += npts
    return out


def isotonic_fit(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    out: str = "y_iso",
) -> DataFrame:
    """Per-group isotonic (non-decreasing in ``x_col``) fit of the
    per-x mean of ``y_col``. Output: one row per distinct (group, x)
    with ``n`` (pooled count), ``y_mean`` and ``out`` — the fitted
    monotone value, on the exact 1e-6 integer grid divided once."""
    scaled = F.floor(F.col(y_col) * F.lit(_SCALE)).cast("long")
    pooled = (
        df.groupBy(*group_cols, x_col)
        .agg(
            F.sum(scaled).alias("_s"),
            F.count("*").cast("long").alias("n"),
        )
    )
    out_schema = ", ".join(
        f"`{c}` {t}" for c, t in pooled.dtypes if c not in ("_s",)
    )
    schema = f"{out_schema}, y_mean double, {out} double"
    keys = list(group_cols)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col, ignore_index=True)
        fitted = _pava_int(
            pdf[x_col].to_numpy(), pdf["_s"].to_numpy(), pdf["n"].to_numpy()
        )
        res = pdf.drop(columns=["_s"]).copy()
        res["y_mean"] = (
            pdf["_s"].to_numpy().astype(np.float64)
            / pdf["n"].to_numpy().astype(np.float64)
            / _SCALE
        )
        res[out] = fitted / _SCALE
        return res

    from .groupmap import per_group_map

    return per_group_map(
        pooled, keys, schema, kernel, order_cols=[x_col]
    )


def sql_isotonic_fit(
    table: str,
    group_expr: str,
    x_expr: str,
    y_expr: str,
    out: str = "y_iso",
) -> str:
    """DuckDB replay via the minimax characterization: fitted(k) =
    max over i<=k of min over j>=k of avg(y[i..j]), every candidate
    average the same integer-pair division the kernel emits. O(n^3)
    per group — the ORACLE's cost, not the engine's."""
    return f"""
WITH pooled AS (
  SELECT {group_expr} AS g, {x_expr} AS x,
         SUM(CAST(FLOOR(({y_expr}) * 1000000.0) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM {table} GROUP BY 1, 2
),
pos AS (
  SELECT g, x, s, n,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS k,
         SUM(s) OVER (PARTITION BY g ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         SUM(n) OVER (PARTITION BY g ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
  FROM pooled
),
segavg AS (
  SELECT a.g, a.k AS i, b.k AS j,
         (CAST(b.cs - a.cs + a.s AS DOUBLE) / CAST(b.cn - a.cn + a.n AS DOUBLE))
           / 1000000.0 AS avg_ij
  FROM pos a JOIN pos b ON a.g = b.g AND a.k <= b.k
),
minover AS (
  SELECT s.g, s.i, p.k,
         MIN(s.avg_ij) AS mn
  FROM segavg s JOIN pos p ON s.g = p.g AND s.i <= p.k AND p.k <= s.j
  GROUP BY 1, 2, 3
),
fit AS (
  SELECT g, k, MAX(mn) AS {out}
  FROM minover WHERE i <= k GROUP BY 1, 2
)
SELECT p.g, p.x, p.n,
       (CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE)) / 1000000.0 AS y_mean,
       f.{out}
FROM pos p JOIN fit f ON p.g = f.g AND p.k = f.k
ORDER BY p.g, p.x
"""
