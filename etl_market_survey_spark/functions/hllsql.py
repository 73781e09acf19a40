"""Spark's HyperLogLog++ replayed exactly — Python model and DuckDB SQL.

``approx_count_distinct`` was the last engine-specific sketch keeping a
query (q56) off the bit-exact gate. Spark's implementation
(``HyperLogLogPlusPlusHelper``, semantics read from the decompiled
bytecode) is:

- ``hash = xxhash64(value, seed=42)`` (the closed hashLong form for
  LongType — already SQL-replayable via ``functions/xxh64sql``);
- ``idx = hash >>> (64 - p)``; ``w = (hash << p) | 2^(p-1)``;
  ``rank = nlz(w) + 1``; register[idx] keeps the max rank;
- estimate: ``zInverse`` is the SEQUENTIAL float sum of ``1 / 2^M_j``
  over register index order (float rounding makes the order part of
  the semantics — the SQL replay folds in the same order through a
  recursive CTE); ``E = alpha_m * m^2 / zInverse``; linear counting
  ``H = m * ln(m / V)`` when small; the HLL++ empirical bias
  correction (Heule et al. 2013) for ``E < 5m``: a 6-nearest-neighbor
  sliding window over the published raw-estimate table, averaging the
  matching bias entries (tables in ``_hll_tables``, extracted verbatim
  from Spark — public Apache-2.0 / paper-appendix constants);
- final value is ``Math.round`` = floor(x + 0.5).

The Python model below is pinned bit-exact against
``F.approx_count_distinct`` in tests; :func:`sql_hll_count_longs`
emits the DuckDB replay.
"""

from __future__ import annotations

import math

from ._hll_tables import BIAS_DATA, K, RAW_ESTIMATE_DATA, THRESHOLDS
from .xxh64sql import M64, hash_long


def hll_precision(rsd: float) -> int:
    return int(math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0)))


def _alpha_m2(p: int) -> float:
    m = 1 << p
    if p == 4:
        alpha = 0.673
    elif p == 5:
        alpha = 0.697
    elif p == 6:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m


def _estimate_bias(e: float, p: int) -> float:
    import bisect

    raw = RAW_ESTIMATE_DATA[p - 4]
    biases = BIAS_DATA[p - 4]
    nearest = bisect.bisect_left(raw, e)
    low = max(nearest - K + 1, 0)
    high = min(low + K, len(raw))
    while high < len(raw) and (e - raw[high]) ** 2 < (e - raw[low]) ** 2:
        low += 1
        high += 1
    s = 0.0
    for j in range(low, high):
        s += biases[j]
    return s / (high - low)


def _e_bias_corrected(e: float, p: int) -> float:
    m = 1 << p
    if p < 19 and e < 5.0 * m:
        return e - _estimate_bias(e, p)
    return e


def hll_registers_longs(values, p: int) -> list[int]:
    m = 1 << p
    regs = [0] * m
    pad = 1 << (p - 1)
    for v in values:
        h = hash_long(v & M64, 42)
        idx = h >> (64 - p)
        w = ((h << p) & M64) | pad
        rank = 64 - w.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def hll_estimate(regs: list[int], p: int) -> int:
    m = 1 << p
    z_inverse = 0.0
    v_zero = 0
    for M in regs:  # sequential register order — part of the semantics
        z_inverse += 1.0 / (1 << M)
        if M == 0:
            v_zero += 1
    e = _alpha_m2(p) / z_inverse
    if v_zero > 0:
        h = m * math.log(m / float(v_zero))
        if (p < 19 and h <= THRESHOLDS[p - 4]) or e <= 2.5 * m:
            est = h
        else:
            est = _e_bias_corrected(e, p)
    else:
        est = _e_bias_corrected(e, p)
    return int(math.floor(est + 0.5))  # Java Math.round


def hll_count_longs(values, rsd: float = 0.05) -> int:
    """= Spark ``F.approx_count_distinct(long_col, rsd)``."""
    p = hll_precision(rsd)
    return hll_estimate(hll_registers_longs(values, p), p)


def _dlit(x: float) -> str:
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"  # force DOUBLE literal


def sql_hll_count_longs(
    groups_cte: str,
    rsd: float = 0.05,
    out_cte: str = "hll_out",
) -> str:
    """CTE block replaying ``approx_count_distinct(long_col, rsd)`` per
    group, bit-for-bit. ``groups_cte`` must expose DISTINCT ``(g, v)``
    pairs (v BIGINT). Emits ``out_cte`` with ``(g, approx)``. Paste
    inside a WITH RECURSIVE list."""
    from .xxh64sql import sql_xxhash64_long_cte

    p = hll_precision(rsd)
    m = 1 << p
    L = len(RAW_ESTIMATE_DATA[p - 4])
    raw_lits = ", ".join(_dlit(x) for x in RAW_ESTIMATE_DATA[p - 4])
    bias_lits = ", ".join(_dlit(x) for x in BIAS_DATA[p - 4])
    thr = _dlit(THRESHOLDS[p - 4])
    am2 = _dlit(_alpha_m2(p))
    two64 = "18446744073709551616"
    uhv = f"CAST((CAST(hv AS HUGEINT) + {two64}) % {two64} AS UBIGINT)"
    w = (
        f"CAST((CAST(uhv AS HUGEINT) * {1 << p}) % {two64}"
        f" + {1 << (p - 1)} AS UBIGINT)"
    )
    # bias average: up to K sequential adds in table order (trailing
    # +0.0 terms preserve IEEE value), one divide
    terms = " + ".join(
        f"CASE WHEN low + {k} <= high THEN t.biases[low + {k}] ELSE 0.0 END"
        for k in range(1, K + 1)
    )
    return f"""
hll_tab AS MATERIALIZED (
  SELECT [{raw_lits}] AS raws, [{bias_lits}] AS biases
),
hll_vals AS (SELECT DISTINCT v FROM {groups_cte}),
{sql_xxhash64_long_cte('hll_vals', out_cte='hll_xx')},
hll_hashed AS (
  SELECT pr.g, {uhv} AS uhv
  FROM {groups_cte} pr JOIN hll_xx x ON pr.v = x.v
),
hll_reg AS MATERIALIZED (
  SELECT g, CAST(uhv >> {64 - p} AS INTEGER) AS idx,
         MAX(64 - length(ltrim(bin(w), '0')) + 1) AS mreg
  FROM (SELECT g, uhv, {w} AS w FROM hll_hashed)
  GROUP BY 1, 2
),
hll_groups AS MATERIALIZED (SELECT DISTINCT g FROM {groups_cte}),
hll_grid AS MATERIALIZED (
  SELECT hg.g, gs.i AS idx, COALESCE(r.mreg, 0) AS mr
  FROM hll_groups hg CROSS JOIN generate_series(0, {m - 1}) AS gs(i)
  LEFT JOIN hll_reg r ON r.g = hg.g AND r.idx = gs.i
),
hll_fold(g, idx, z, vz) AS (
  -- the SEQUENTIAL float fold of 1/2^M in register order: float
  -- rounding order is part of Spark's semantics, so it replays as a
  -- recurrence, not a SUM()
  SELECT g, -1, CAST(0.0 AS DOUBLE), 0 FROM hll_groups
  UNION ALL
  SELECT f.g, f.idx + 1,
         f.z + 1.0 / power(2.0, CAST(gr.mr AS DOUBLE)),
         f.vz + CASE WHEN gr.mr = 0 THEN 1 ELSE 0 END
  FROM hll_fold f JOIN hll_grid gr ON gr.g = f.g AND gr.idx = f.idx + 1
  WHERE f.idx < {m - 1}
),
hll_zv AS (SELECT g, z, vz FROM hll_fold WHERE idx = {m - 1}),
hll_e AS (
  SELECT g, vz, {am2} / z AS e,
         CASE WHEN vz > 0
              THEN CAST({m} AS DOUBLE)
                   * ln(CAST({m} AS DOUBLE) / CAST(vz AS DOUBLE))
         END AS h
  FROM hll_zv
),
hll_branch AS (
  SELECT g, vz, e, h,
         (vz > 0 AND (h <= {thr} OR e <= {_dlit(2.5 * m)})) AS use_h,
         (e < {_dlit(5.0 * m)}) AS needs_bias
  FROM hll_e
),
hll_need AS (
  SELECT b.g, b.e,
         len(list_filter(t.raws, x -> x < b.e)) AS nearest
  FROM hll_branch b CROSS JOIN hll_tab t
  WHERE NOT use_h AND needs_bias
),
hll_slide(g, e, low, high) AS (
  SELECT g, e,
         greatest(nearest - {K - 1}, 0),
         least(greatest(nearest - {K - 1}, 0) + {K}, {L})
  FROM hll_need
  UNION ALL
  SELECT b.g, b.e, b.low + 1, b.high + 1
  FROM hll_slide b CROSS JOIN hll_tab t
  WHERE b.high < {L}
    AND (b.e - t.raws[b.high + 1]) * (b.e - t.raws[b.high + 1])
      < (b.e - t.raws[b.low + 1]) * (b.e - t.raws[b.low + 1])
),
hll_slide_done AS (
  SELECT g, e, low, high,
         row_number() OVER (PARTITION BY g ORDER BY low DESC) AS rn
  FROM hll_slide
),
hll_bias AS (
  SELECT s.g, ({terms}) / (high - low) AS bias
  FROM hll_slide_done s CROSS JOIN hll_tab t
  WHERE s.rn = 1
),
{out_cte} AS (
  SELECT b.g,
         CAST(FLOOR(
           CASE WHEN b.use_h THEN b.h
                WHEN b.needs_bias THEN b.e - bi.bias
                ELSE b.e END + 0.5) AS BIGINT) AS approx
  FROM hll_branch b LEFT JOIN hll_bias bi ON b.g = bi.g
)"""
