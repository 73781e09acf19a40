"""Banded dynamic time warping (asymmetric step pattern) between
same-length integer series — sequence alignment as a DataFrame op.

Variant: the Sakoe & Chiba (1978) ASYMMETRIC step pattern — moves
``(i-1,j) (i-1,j-1) (i-1,j-2)`` — under a Sakoe-Chiba band
``|i-j| <= r``. The asymmetric pattern advances exactly one row per
step, so DP row ``i`` depends ONLY on row ``i-1``: the whole DP is a
row recurrence, which is what makes it replayable in SQL (a recursive
CTE carrying the previous row as a list) — the classic symmetric
pattern's within-row dependency is not. Costs are integer ``|a-b|``,
out-of-band cells a large-literal INF; everything stays int64
(real paths <= n * max_cost << INF), so both engines produce identical
bits.

Scale shape: series are built with one groupBy over the fact table;
the pair DP runs per pair in an Arrow kernel — O(n*(2r+1)) per pair,
state two rows. Pairing is over a bounded key dimension (callers pair
series of a low-cardinality key, or pre-block candidates); the kernel
never sees more than one pair per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

INF = 1_000_000_000_000_000  # out-of-band sentinel, >> any real path cost


def dtw_band_asymmetric(a: np.ndarray, b: np.ndarray, r: int) -> int:
    """Banded asymmetric-step DTW distance between equal-length int64
    series (the Python reference the Arrow kernel runs; the SQL replay
    mirrors it row for row)."""
    n = len(a)
    assert len(b) == n
    row = np.full(n + 1, INF, dtype=np.int64)  # 1-based
    row[1] = abs(int(a[0]) - int(b[0]))
    for i in range(2, n + 1):
        new = np.full(n + 1, INF, dtype=np.int64)
        for j in range(1, n + 1):
            if abs(i - j) > r:
                continue
            best = row[j]
            if j >= 2 and row[j - 1] < best:
                best = row[j - 1]
            if j >= 3 and row[j - 2] < best:
                best = row[j - 2]
            new[j] = abs(int(a[i - 1]) - int(b[j - 1])) + best
        row = new
    return int(row[n])


def dtw_pairs(
    pairs: DataFrame,
    a_col: str = "aa",
    b_col: str = "bb",
    key_cols: tuple[str, str] = ("key_a", "key_b"),
    r: int = 8,
) -> DataFrame:
    """``(key_a, key_b, dtw_dist)`` for a frame of candidate pairs, each
    row carrying both series as equal-length int64 arrays."""
    ka, kb = key_cols
    schema = f"`{ka}` string, `{kb}` string, dtw_dist long"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            a = np.asarray(row[a_col], dtype=np.int64)
            b = np.asarray(row[b_col], dtype=np.int64)
            out.append(
                {
                    ka: row[ka],
                    kb: row[kb],
                    "dtw_dist": dtw_band_asymmetric(a, b, r),
                }
            )
        return pd.DataFrame(out)

    # every group is a single pair row, so this is a plain per-row
    # map: mapInPandas scores whole Arrow batches with the same
    # kernel, no per-pair pandas frame construction (guide §4)
    return pairs.mapInPandas(
        lambda it: (kernel(b) for b in it if len(b)), schema
    )


def sql_dtw_cte(
    pairs_cte: str,
    n_expr: str,
    r: int,
    out_cte: str = "dtw",
) -> str:
    """Recursive-CTE replay of :func:`dtw_band_asymmetric`.

    ``pairs_cte`` must expose ``(key_a, key_b, aa, bb)`` with ``aa``/
    ``bb`` equal-length BIGINT lists; ``n_expr`` is the series length
    (a SQL expression over the pair row, e.g. ``len(aa)``). Emits
    ``out_cte`` with ``(key_a, key_b, dtw_dist)``.
    """
    return f"""
{out_cte}_rows AS (
  SELECT key_a, key_b, aa, bb, {n_expr} AS n, 1 AS i,
         list_transform(range(1, {n_expr} + 1),
           j -> CASE WHEN j = 1 THEN abs(aa[1] - bb[1])
                     ELSE {INF} END) AS dp
  FROM {pairs_cte}
  UNION ALL
  SELECT key_a, key_b, aa, bb, n, i + 1,
         list_transform(range(1, n + 1),
           j -> CASE WHEN abs((i + 1) - j) <= {r} THEN
                  abs(aa[i + 1] - bb[j]) + LEAST(
                    dp[j],
                    CASE WHEN j >= 2 THEN dp[j - 1] ELSE {INF} END,
                    CASE WHEN j >= 3 THEN dp[j - 2] ELSE {INF} END)
                ELSE {INF} END)
  FROM {out_cte}_rows WHERE i < n
),
{out_cte} AS (
  SELECT key_a, key_b, dp[n] AS dtw_dist
  FROM {out_cte}_rows WHERE i = n
)"""
