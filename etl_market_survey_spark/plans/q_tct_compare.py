"""TCT + comparison/reporting queries (SURVEY A3/A11/A12/U5/U7/J2/J6/F4/
X6/W2) mapped onto the testdata.

q33_pad_tagging   — A11 two-channel left/right labeling.
q34_normalization — A12 conditional-median range normalization.
q35_calibration   — J6 scalar broadcast + U5 linear calibration + U7
                    theory-constant conversion + F4 error propagation.
q36_iv_pipeline   — the IV-curve reporting shape: W2 half-curve -> X6 abs
                    -> A3 mean/std with flattened names -> J2 composite
                    re-join of two aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.stats import davg, dstd, sql_davg, sql_dstd
from ..operators.tct import normalize_collected_charge, tag_pads
from ..operators.windows import half_curve
from .registry import load, register

# ---------------------------------------------------------------------------
# q33 — pad tagging: channels = l_linestatus, position = l_quantity,
# charge = l_extendedprice, one scan per l_returnflag
# ---------------------------------------------------------------------------

_Q33_ORACLE = """
WITH mid AS (
  SELECT l_returnflag, (MIN(l_quantity) + MAX(l_quantity)) / 2.0 AS m
  FROM lineitem GROUP BY 1
),
lm AS (
  SELECT l.l_returnflag, l.l_linestatus,
         AVG(l.l_extendedprice) FILTER (WHERE l.l_quantity < mid.m) AS left_mean
  FROM lineitem l JOIN mid USING (l_returnflag)
  GROUP BY 1, 2
),
ranked AS (
  SELECT l_returnflag, l_linestatus,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY left_mean DESC, l_linestatus) AS rn
  FROM lm
)
SELECT l_returnflag, l_linestatus,
       CASE WHEN rn = 1 THEN 'left' ELSE 'right' END AS "Pad"
FROM ranked ORDER BY 1, 2
"""


@register("q33_pad_tagging", _Q33_ORACLE)
def q33_pad_tagging(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return tag_pads(
        li,
        channel_col="l_linestatus",
        position_col="l_quantity",
        charge_col="l_extendedprice",
        scan_keys=["l_returnflag"],
    ).orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# q34 — range normalization: metal = quantity <= 10, silicon = quantity >= 40
# ---------------------------------------------------------------------------

_Q34_ORACLE = """
WITH med AS (
  SELECT l_returnflag,
         median(l_extendedprice) FILTER (WHERE l_quantity <= 10) AS m0,
         median(l_extendedprice) FILTER (WHERE l_quantity >= 40) AS m1
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       (l.l_extendedprice - med.m0) / (med.m1 - med.m0) AS norm_charge
FROM lineitem l JOIN med USING (l_returnflag)
ORDER BY l.l_orderkey, l.l_linenumber, norm_charge
"""


@register("q34_normalization", _Q34_ORACLE)
def q34_normalization(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = normalize_collected_charge(
        li,
        group_keys=["l_returnflag"],
        value_col="l_extendedprice",
        metal_cond=F.col("l_quantity") <= 10,
        silicon_cond=F.col("l_quantity") >= 40,
        out="norm_charge",
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "norm_charge"
    ).orderBy("l_orderkey", "l_linenumber", "norm_charge")


# ---------------------------------------------------------------------------
# q35 — calibration chain: one-row scalar frame (J6) from an aggregate,
# theory-constant conversion (U7), linear calibration (U5), error
# propagation sqrt(a^2+b^2) (F4)
# ---------------------------------------------------------------------------

_THEORY_CHARGE = 3.2e-15  # stand-in closed-form theory constant (U7 shape)

_Q35_ORACLE = f"""
WITH cal AS (
  SELECT {sql_davg('l_extendedprice')} AS mean_price,
         {sql_dstd('l_extendedprice')} AS std_price
  FROM lineitem
)
SELECT l.l_returnflag,
       {sql_davg('l.l_extendedprice / cal.mean_price')} AS avg_normalized,
       {sql_davg(f'{_THEORY_CHARGE} / cal.mean_price * l.l_extendedprice')} AS avg_coulomb,
       SQRT(POW({sql_dstd('l.l_quantity')}, 2.0) + POW({sql_dstd('l.l_discount')}, 2.0)) AS qty_disc_err
FROM lineitem l, cal
GROUP BY l.l_returnflag, cal.mean_price
ORDER BY l.l_returnflag
"""


@register("q35_calibration", _Q35_ORACLE)
def q35_calibration(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    cal = li.agg(
        davg("l_extendedprice").alias("mean_price"),
        dstd("l_extendedprice").alias("std_price"),
    )
    with_cal = li.crossJoin(F.broadcast(cal))
    return (
        with_cal.groupBy("l_returnflag", "mean_price")
        .agg(
            davg(F.col("l_extendedprice") / F.col("mean_price")).alias("avg_normalized"),
            davg(
                F.lit(_THEORY_CHARGE) / F.col("mean_price") * F.col("l_extendedprice")
            ).alias("avg_coulomb"),
            F.sqrt(
                F.pow(dstd("l_quantity"), F.lit(2.0))
                + F.pow(dstd("l_discount"), F.lit(2.0))
            ).alias("qty_disc_err"),
        )
        .drop("mean_price")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q36 — IV-curve reporting pipeline: W2 half-curve by time, X6 abs, A3
# mean/std flattened names, J2 composite-key self-enrichment
# ---------------------------------------------------------------------------

_Q36_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_orderstatus, o_totalprice, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
half AS (
  SELECT * FROM ranked WHERE rn <= CAST(FLOOR(n / 2) AS BIGINT)
),
curve AS (
  SELECT o_orderpriority,
         {sql_davg('ABS(o_totalprice)')} AS "Bias current (A) mean",
         {sql_dstd('ABS(o_totalprice)')} AS "Bias current (A) std"
  FROM half GROUP BY 1
),
counts AS (
  SELECT o_orderpriority, COUNT(*) AS n_orders
  FROM half GROUP BY 1
)
SELECT c.o_orderpriority, c."Bias current (A) mean", c."Bias current (A) std",
       k.n_orders
FROM curve c JOIN counts k USING (o_orderpriority)
ORDER BY c.o_orderpriority
"""


@register("q36_iv_pipeline", _Q36_ORACLE)
def q36_iv_pipeline(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    half = half_curve(orders, ["o_orderpriority"], ["o_orderdate", "o_orderkey"])
    curve = half.groupBy("o_orderpriority").agg(
        davg(F.abs(F.col("o_totalprice"))).alias("Bias current (A) mean"),
        dstd(F.abs(F.col("o_totalprice"))).alias("Bias current (A) std"),
    )
    counts = half.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    return curve.join(counts, "o_orderpriority").orderBy("o_orderpriority")
