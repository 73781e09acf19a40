"""TPC-H anchor completion — the canonical OLAP join/subquery shapes.

Round 1 anchored Q1/Q3/Q4/Q5/Q10/Q14 (q01, q163-q167). This module
completes the decision-support surface with analogs of the remaining
TPC-H queries, adapted to the driver schema (no ``partsupp``; the
``lineitem`` fact doubles as the part<->supplier bridge, and
ship-vs-order-date lateness stands in for the missing commit/receipt
dates). Each query is the textbook distributed plan for its shape:

- scalar subqueries   -> 1-row aggregate + ``crossJoin(broadcast(...))``
  (Q11 q177, Q15 q179, Q17 q181, Q22 q186) — never a driver collect;
- correlated subqueries -> decorrelated aggregate-then-join
  (Q2 q187, Q17 q181, Q20 q184);
- EXISTS / NOT EXISTS -> ``left_semi`` / ``left_anti`` joins or a
  per-group qualifying aggregate (Q16 q180, Q21 q185, Q22 q186);
- disjunctive join predicates stay a residual filter on one equi-join,
  not a union of scans (Q19 q183);
- every dimension (part 0.2×, supplier 0.01×, nation, region) is
  ``broadcast()``; only fact-fact joins (lineitem ⋈ orders on orderkey)
  shuffle, and every aggregation map-side combines.

Float discipline: all revenue/quantity aggregates go through
``functions/stats.dsum``/``davg`` (exact decimal partials) so hashes
match DuckDB bit-for-bit regardless of partitioning; derived ratios are
single double expressions evaluated identically on both engines.

Dates: timestamps compare as ``unix_micros`` epoch integers (TZ-free,
mirrors DuckDB ``epoch_us``), the q163 pattern.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.stats import davg, dsum, sql_davg, sql_dsum
from .registry import load, register

_REV = "l_extendedprice * (1.0 - l_discount)"

# epoch-µs constants (UTC; data spans 1995-01..2001-11)
_US_1996 = 820_454_400_000_000
_US_1997 = 852_076_800_000_000
_US_1997_H2 = 867_715_200_000_000  # 1997-07-01
_US_1998 = 883_612_800_000_000
_US_1999 = 915_148_800_000_000
_US_60D = 5_184_000_000_000
_US_90D = 7_776_000_000_000

_SHIP_US = "unix_micros(cast(l_shipdate as timestamp))"
_ORDER_US = "unix_micros(cast(o_orderdate as timestamp))"


def _rev():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# q173 — TPC-H Q6: forecast revenue change. Pure scan-side query: both
# the date range and the value predicates reach the parquet reader as
# PushedFilters; the single global aggregate is one map-side-combined
# shuffle of 32 partial rows.
# ---------------------------------------------------------------------------

_Q173_ORACLE = f"""
SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE epoch_us(l_shipdate) >= {_US_1997} AND epoch_us(l_shipdate) < {_US_1998}
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@register("q173_forecast_revenue", _Q173_ORACLE)
def q173_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.expr(_SHIP_US) >= _US_1997)
        & (F.expr(_SHIP_US) < _US_1998)
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q174 — TPC-H Q7: volume shipping between two nations. The only
# shuffles are lineitem⋈orders and orders⋈customer on their keys;
# supplier and both nation lookups broadcast. The nation-pair
# disjunction is a residual filter on the joined keys (Catalyst keeps
# it beside the joins, no union-of-plans).
# ---------------------------------------------------------------------------

_Q174_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum(_REV)} AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE epoch_us(l.l_shipdate) >= {_US_1996} AND epoch_us(l.l_shipdate) < {_US_1998}
  AND ((s.s_nationkey = 1 AND c.c_nationkey = 2)
    OR (s.s_nationkey = 2 AND c.c_nationkey = 1))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("q174_volume_shipping", _Q174_ORACLE)
def q174_volume_shipping(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.expr(_SHIP_US) >= _US_1996) & (F.expr(_SHIP_US) < _US_1998)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("_sn"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("_cn"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(
            ((F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2))
            | ((F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1))
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q175 — TPC-H Q8: national market share. Numerator and denominator are
# two decimal-exact sums over the SAME joined rows (one aggregation,
# conditional numerator), so the share is one deterministic double
# division — no second pass over the fact.
# ---------------------------------------------------------------------------

_Q175_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ({sql_dsum("CASE WHEN s.s_nationkey = 3 THEN " + _REV + " ELSE 0.0 END")}
        / {sql_dsum(_REV)}) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_type = 'ECONOMY'
  AND n2.n_regionkey = 3
  AND epoch_us(o.o_orderdate) >= {_US_1996} AND epoch_us(o.o_orderdate) < {_US_1998}
GROUP BY 1
ORDER BY 1
"""


@register("q175_market_share", _Q175_ORACLE)
def q175_market_share(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load(spark, sf_dir, "orders").filter(
        (F.expr(_ORDER_US) >= _US_1996) & (F.expr(_ORDER_US) < _US_1998)
    )
    cust = load(spark, sf_dir, "customer")
    nat_eu = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    supp = load(spark, sf_dir, "supplier")
    nat_rev = F.when(F.col("s_nationkey") == 3, _rev()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat_eu), cust["c_nationkey"] == nat_eu["n_nationkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((dsum(nat_rev) / dsum(_rev())).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q176 — TPC-H Q9: product-type profit (p_retailprice stands in for the
# missing ps_supplycost). Part/supplier/nation broadcast; the one real
# shuffle is lineitem⋈orders, then a map-side-combined (nation, year)
# rollup.
# ---------------------------------------------------------------------------

_PROFIT = "l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity"

_Q176_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum(_PROFIT)} AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%plate%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


@register("q176_product_profit", _Q176_ORACLE)
def q176_product_profit(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%plate%"))
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q177 — TPC-H Q11: important parts by shipped value for one nation's
# suppliers. The "fraction of total" scalar subquery is a 1-row
# aggregate crossJoin(broadcast)-ed onto the per-part rollup — the
# filtered fact is scanned once per aggregate, never collected.
# ---------------------------------------------------------------------------

_Q177_ORACLE = f"""
WITH f AS (
  SELECT l.l_partkey, l.l_extendedprice, l.l_discount
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey = 7
),
v AS (SELECT l_partkey, {sql_dsum(_REV)} AS part_value FROM f GROUP BY 1),
t AS (SELECT {sql_dsum(_REV)} AS _tot FROM f)
SELECT l_partkey, part_value
FROM v, t
WHERE part_value > 0.001 * _tot
ORDER BY part_value DESC, l_partkey
"""


@register("q177_important_parts", _Q177_ORACLE)
def q177_important_parts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    f = li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
    v = f.groupBy("l_partkey").agg(dsum(_rev()).alias("part_value"))
    t = f.agg(dsum(_rev()).alias("_tot"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("_tot"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# q178 — TPC-H Q13: customer order-count distribution. Left join keeps
# order-less customers (count 0); the priority filter pre-applies to the
# orders side (equivalent to the ON-clause form, and it pushes to the
# scan). Two map-side-combined aggregations, both on small keyspaces.
# ---------------------------------------------------------------------------

_Q178_ORACLE = """
WITH counts AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM counts
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


@register("q178_customer_distribution", _Q178_ORACLE)
def q178_customer_distribution(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    counts = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q179 — TPC-H Q15: top supplier by revenue in a half-year window. The
# per-supplier rollup is computed ONCE and reused for both the max
# scalar (1-row broadcast) and the equality filter — exact doubles on
# both engines make the equality join safe.
# ---------------------------------------------------------------------------

_Q179_ORACLE = f"""
WITH r AS (
  SELECT l_suppkey, {sql_dsum(_REV)} AS total_revenue
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {_US_1997} AND epoch_us(l_shipdate) < {_US_1997_H2}
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM r)
ORDER BY s.s_suppkey
"""


@register("q179_top_supplier", _Q179_ORACLE)
def q179_top_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.expr(_SHIP_US) >= _US_1997) & (F.expr(_SHIP_US) < _US_1997_H2)
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(dsum(_rev()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q180 — TPC-H Q16: supplier diversity per part bucket. The NOT IN
# subquery is a broadcast left_anti join (6 bad suppliers); part
# broadcasts; COUNT(DISTINCT) expands to Spark's two-phase distinct
# aggregate — no row ever leaves the cluster.
# ---------------------------------------------------------------------------

_Q180_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q180_supplier_diversity", _Q180_ORACLE)
def q180_supplier_diversity(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q181 — TPC-H Q17: small-quantity-order revenue. The correlated
# per-part average decorrelates into one rollup joined back to the
# brand-filtered lines; davg/sql_davg keep the 0.2*avg threshold the
# same double on both engines.
# ---------------------------------------------------------------------------

_Q181_ORACLE = f"""
SELECT ({sql_dsum("l.l_extendedprice")} / 7.0) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#2'
  AND l.l_quantity < (
    SELECT 0.2 * {sql_davg("l2.l_quantity")}
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("q181_small_qty_revenue", _Q181_ORACLE)
def q181_small_qty_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    pa = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        davg("l_quantity").alias("_aq")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(pa, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_aq"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q182 — TPC-H Q18: large-volume orders. The HAVING pre-aggregates the
# fact down to qualifying orderkeys BEFORE any join — at 100 TB the
# orders/customer joins see ~1% of orders, not the raw fact.
# ---------------------------------------------------------------------------

_Q182_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum("l_quantity")} AS total_qty
  FROM lineitem GROUP BY 1
  HAVING {sql_dsum("l_quantity")} > 250.0
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       epoch_us(o.o_orderdate) AS order_date_us,
       o.o_totalprice, big.total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q182_large_orders", _Q182_ORACLE)
def q182_large_orders(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250.0)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.expr(_ORDER_US).alias("order_date_us"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q183 — TPC-H Q19: disjunctive predicates over one equi-join. The three
# (brand, size, quantity) triples stay a residual filter on the
# lineitem⋈part hash join — Catalyst does NOT plan a union of three
# scans, and the partkey equi-join still broadcasts.
# ---------------------------------------------------------------------------

_Q183_PRED = """
  ((p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1  AND 10 AND l.l_quantity BETWEEN 1.0  AND 15.0)
OR (p.p_brand = 'Brand#8'  AND p.p_size BETWEEN 5  AND 20 AND l.l_quantity BETWEEN 10.0 AND 25.0)
OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 40 AND l.l_quantity BETWEEN 20.0 AND 35.0))
"""

_Q183_ORACLE = f"""
SELECT {sql_dsum(_REV)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_Q183_PRED}
"""


@register("q183_disjunctive_join", _Q183_ORACLE)
def q183_disjunctive_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")

    def triple(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(
            triple("Brand#2", 1, 10, 1.0, 15.0)
            | triple("Brand#8", 5, 20, 10.0, 25.0)
            | triple("Brand#19", 20, 40, 20.0, 35.0)
        )
        .agg(
            dsum(_rev()).alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q184 — TPC-H Q20 analog: suppliers dominating a part's shipped volume
# (>10% of a red part's total, the availqty/2 stand-in). Both rollups
# scan the same semi-filtered fact; the qualifying supplier set flows
# into a left_semi join — EXISTS without a distinct-shuffle.
# ---------------------------------------------------------------------------

_Q184_ORACLE = f"""
WITH rl AS (
  SELECT l.l_partkey, l.l_suppkey, l.l_quantity
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%red%'
),
sp AS (SELECT l_partkey, l_suppkey, {sql_dsum("l_quantity")} AS q FROM rl GROUP BY 1, 2),
pt AS (SELECT l_partkey, {sql_dsum("l_quantity")} AS tq FROM rl GROUP BY 1)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_regionkey = 3
  AND s.s_suppkey IN (
    SELECT sp.l_suppkey FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
    WHERE sp.q > 0.1 * pt.tq
  )
ORDER BY s.s_suppkey
"""


@register("q184_dominant_suppliers", _Q184_ORACLE)
def q184_dominant_suppliers(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    rl = li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"]).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    # ONE pass over the semi-filtered fact: the (part, supplier) rollup
    # keeps its EXACT DECIMAL partial, so the per-part total is a rollup
    # of those integers (bit-equal to re-aggregating the fact — which is
    # what the oracle does) instead of a second fact scan. The compiled
    # plan still prints two sp branches, but both end in the IDENTICAL
    # aggregate exchange, which AQE dedups at runtime (ReusedExchange —
    # verified on the executed plan): the fact is scanned once.
    scaled = F.floor(F.col("l_quantity") * F.lit(1e6)).cast("decimal(38,0)")
    sp = rl.groupBy("l_partkey", "l_suppkey").agg(F.sum(scaled).alias("_qi"))
    pt = sp.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("_qi").alias("_tqi")
    )
    dom = (
        sp.join(pt, sp["l_partkey"] == pt["_pk"])
        .filter(
            F.col("_qi").cast("double") / F.lit(1e6)
            > F.lit(0.1) * (F.col("_tqi").cast("double") / F.lit(1e6))
        )
        .select("l_suppkey")
    )
    return (
        supp.join(dom, supp["s_suppkey"] == dom["l_suppkey"], "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q185 — TPC-H Q21 analog: the sole late supplier on multi-supplier
# orders (shipdate > orderdate + 60d stands in for receipt > commit).
# The EXISTS / NOT EXISTS pair collapses into one per-order aggregate
# (distinct suppliers vs distinct LATE suppliers) joined back — two
# passes over the joined fact instead of two correlated self-joins.
# ---------------------------------------------------------------------------

_Q185_ORACLE = f"""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {_US_60D}) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
st AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS ns,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl
  FROM lo GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(DISTINCT lo.l_orderkey) AS BIGINT) AS numwait
FROM lo
JOIN st ON lo.l_orderkey = st.l_orderkey
JOIN supplier s ON lo.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE lo.late AND st.ns > 1 AND st.nl = 1 AND n.n_regionkey = 3
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q185_waiting_supplier", _Q185_ORACLE)
def q185_waiting_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    lo = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.expr(_SHIP_US) > F.expr(_ORDER_US) + F.lit(_US_60D)).alias("late"),
        )
    )
    st = lo.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_ns"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("_nl"),
    )
    return (
        lo.filter("late")
        .join(st, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_ns") > 1) & (F.col("_nl") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q186 — TPC-H Q22: dormant rich customers. The global positive-balance
# average is a 1-row broadcast; "no recent orders" is a left_anti join
# against the distinct recent-buyer set (NOT EXISTS, decorrelated).
# ---------------------------------------------------------------------------

_Q186_ORACLE = f"""
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_dsum("c_acctbal")} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT {sql_davg("c2.c_acctbal")} FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND c.c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE epoch_us(o_orderdate) >= {_US_1999}
  )
GROUP BY 1
ORDER BY 1
"""


@register("q186_dormant_customers", _Q186_ORACLE)
def q186_dormant_customers(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    avg_df = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("_ab")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.expr(_ORDER_US) >= _US_1999)
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# q187 — TPC-H Q2 analog: minimum-cost supplier per part (s_acctbal
# stands in for ps_supplycost; the distinct lineitem (part, supplier)
# pairs are the partsupp bridge). Correlated MIN decorrelates into a
# per-part row_number window over the (small) joined bridge.
# ---------------------------------------------------------------------------

_Q187_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
         ROW_NUMBER() OVER (
           PARTITION BY p.p_partkey ORDER BY s.s_acctbal, s.s_suppkey
         ) AS rn
  FROM pairs
  JOIN part p ON pairs.l_partkey = p.p_partkey
  JOIN supplier s ON pairs.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_size = 15 AND n.n_regionkey = 3
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name
FROM j WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q187_min_cost_supplier", _Q187_ORACLE)
def q187_min_cost_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    j = (
        pairs.join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), pairs["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q188 — TPC-H Q12 analog: late-shipment priority mix by line status
# (shipdate > orderdate + 90d in lieu of the missing receipt/commit
# dates). One fact-fact key join, conditional counts in a single
# map-side-combined aggregate.
# ---------------------------------------------------------------------------

_Q188_ORACLE = f"""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + {_US_90D}
  AND epoch_us(l.l_shipdate) >= {_US_1997} AND epoch_us(l.l_shipdate) < {_US_1998}
GROUP BY 1
ORDER BY 1
"""


@register("q188_late_priority_mix", _Q188_ORACLE)
def q188_late_priority_mix(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.expr(_SHIP_US) >= _US_1997) & (F.expr(_SHIP_US) < _US_1998)
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.expr(_SHIP_US) > F.expr(_ORDER_US) + F.lit(_US_90D))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
