"""Histogram + Δt-grid queries — the physics-pipeline core shapes
(SURVEY A6/A7, J4/R4, A2, A5) mapped onto the testdata.

q11_histogram_auto — A6 with numpy-'auto' bin policy.
q12_hist2d         — A7 fixed-grid 2D density.
q13_delta_t        — J4/R4: per-order pulse pair x 9x9 threshold grid.
q14_time_resolution — A2+A5: MAD per (k1,k2) + deterministic argmin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.histogram import histogram, histogram2d, sql_histogram_auto
from ..operators.delta_t import best_threshold_pair, delta_t_grid, mad_per_threshold_pair
from .registry import load, register

# ---------------------------------------------------------------------------
# q11 — auto-binned histogram of l_extendedprice
# ---------------------------------------------------------------------------


@register("q11_histogram_auto", sql_histogram_auto("lineitem", "l_extendedprice"))
def q11_histogram_auto(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return histogram(li, "l_extendedprice").orderBy("bin")


# ---------------------------------------------------------------------------
# q12 — 2D histogram of (l_quantity, l_discount) on a 12x8 grid
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
WITH st AS (
  SELECT MIN(l_quantity) xmn, MAX(l_quantity) xmx,
         MIN(l_discount) ymn, MAX(l_discount) ymx
  FROM lineitem
)
SELECT
  CAST(LEAST(CAST(FLOOR((l_quantity - st.xmn) / ((st.xmx - st.xmn) / 12.0)) AS INT), 11) AS INT) AS bx,
  CAST(LEAST(CAST(FLOOR((l_discount - st.ymn) / ((st.ymx - st.ymn) / 8.0)) AS INT), 7) AS INT) AS by,
  COUNT(*) AS count
FROM lineitem, st
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q12_hist2d", _Q12_ORACLE)
def q12_hist2d(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return histogram2d(li, "l_quantity", "l_discount", nx=12, ny=8).orderBy("bx", "by")


# ---------------------------------------------------------------------------
# q13/q14 — Δt grid + MAD + argmin
# Mapping: trigger = l_orderkey; pulse-1/2 base times = min extendedprice of
# linenumber 1 / 2 (min: dup-safe, deterministic); t_k = base * k/100.
# ---------------------------------------------------------------------------

_PULSES_SQL = """
  SELECT l_orderkey,
         MIN(CASE WHEN l_linenumber = 1 THEN l_extendedprice END) AS t1,
         MIN(CASE WHEN l_linenumber = 2 THEN l_extendedprice END) AS t2
  FROM lineitem GROUP BY l_orderkey
  HAVING t1 IS NOT NULL AND t2 IS NOT NULL
"""

_Q13_ORACLE = f"""
WITH pulses AS ({_PULSES_SQL}),
     ks AS (SELECT UNNEST(generate_series(10, 90, 10)) AS k)
SELECT p.l_orderkey,
       k1.k AS "k_1 (%)", k2.k AS "k_2 (%)",
       p.t1 * k1.k / 100.0 - p.t2 * k2.k / 100.0 AS "Δt (s)"
FROM pulses p, ks k1, ks k2
ORDER BY p.l_orderkey, "k_1 (%)", "k_2 (%)"
"""


def _pulses(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.min(F.when(F.col("l_linenumber") == 1, F.col("l_extendedprice"))).alias("t1"),
            F.min(F.when(F.col("l_linenumber") == 2, F.col("l_extendedprice"))).alias("t2"),
        )
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    )


@register("q13_delta_t", _Q13_ORACLE)
def q13_delta_t(spark, sf_dir):
    dt = delta_t_grid(_pulses(spark, sf_dir), "l_orderkey", "t1", "t2")
    return dt.withColumnsRenamed({}).orderBy("l_orderkey", "k_1 (%)", "k_2 (%)")


_Q14_ORACLE = f"""
WITH pulses AS ({_PULSES_SQL}),
     ks AS (SELECT UNNEST(generate_series(10, 90, 10)) AS k),
     dt AS (
       SELECT k1.k AS k1, k2.k AS k2,
              p.t1 * k1.k / 100.0 - p.t2 * k2.k / 100.0 AS d
       FROM pulses p, ks k1, ks k2
     ),
     med AS (SELECT k1, k2, median(d) AS m FROM dt GROUP BY k1, k2),
     mad AS (
       SELECT dt.k1, dt.k2, 1.4826 * median(abs(dt.d - med.m)) AS kmad
       FROM dt JOIN med USING (k1, k2) GROUP BY dt.k1, dt.k2
     )
SELECT k1 AS "k_1 (%)", k2 AS "k_2 (%)", kmad AS "MAD(Δt) k_MADstd (s)"
FROM mad ORDER BY kmad ASC, k1, k2 LIMIT 1
"""


@register("q14_time_resolution", _Q14_ORACLE)
def q14_time_resolution(spark, sf_dir):
    dt = delta_t_grid(_pulses(spark, sf_dir), "l_orderkey", "t1", "t2")
    mad = mad_per_threshold_pair(dt)
    return best_threshold_pair(mad)
