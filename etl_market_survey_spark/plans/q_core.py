"""Core scan/filter/agg/join queries (SURVEY §2.1, §2.2, §2.3, §2.4).

q01_pricing_summary — flagship: scan (S1) + filter (F1) + derived-column
    projection (F4) + multi-stat group agg (A1-lite). TPC-H Q1 shape.
q02_mean_std        — the reference's ``mean_std`` kernel (A1):
    mean/std/median/MAD_std per group, flattened `"{col} {stat}"` names.
q03_cuts            — data-driven predicate conjunction (F3) + accepted
    flag semantics (J1 input), on lineitem with l_linenumber as "device".
q04_join_enrich     — equi-join fabric + broadcast dimension enrichment
    (J1/J2/J3): lineitem⋈orders⋈customer⋈nation⋈region rollup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.stats import davg, dsum, mean_std, sql_davg, sql_dstd, sql_dsum
from ..operators.cuts import apply_cuts
from .registry import load, register


# ---------------------------------------------------------------------------
# q01 — pricing summary (flagship)
# ---------------------------------------------------------------------------

_Q01_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_quantity < 50
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q01_pricing_summary", _Q01_ORACLE)
def q01_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_quantity") < 50)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — mean_std multi-stat kernel (A1; reference utils.py:118-146)
# ---------------------------------------------------------------------------

_Q02_ORACLE = f"""
WITH med AS (
  SELECT l_returnflag,
         median(l_quantity) AS mq,
         median(l_extendedprice) AS mp
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l.l_returnflag,
  {sql_davg('l.l_quantity')} AS "l_quantity mean",
  {sql_dstd('l.l_quantity')} AS "l_quantity std",
  median(l.l_quantity) AS "l_quantity median",
  1.4826 * median(abs(l.l_quantity - m.mq)) AS "l_quantity MAD_std",
  {sql_davg('l.l_extendedprice')} AS "l_extendedprice mean",
  {sql_dstd('l.l_extendedprice')} AS "l_extendedprice std",
  median(l.l_extendedprice) AS "l_extendedprice median",
  1.4826 * median(abs(l.l_extendedprice - m.mp)) AS "l_extendedprice MAD_std"
FROM lineitem l JOIN med m USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register("q02_mean_std", _Q02_ORACLE)
def q02_mean_std(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = mean_std(li, by=["l_returnflag"], cols=["l_quantity", "l_extendedprice"])
    # Column order: stats per column grouped, matching the oracle aliases.
    return out.select(
        "l_returnflag",
        "`l_quantity mean`",
        "`l_quantity std`",
        "`l_quantity median`",
        "`l_quantity MAD_std`",
        "`l_extendedprice mean`",
        "`l_extendedprice std`",
        "`l_extendedprice median`",
        "`l_extendedprice MAD_std`",
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q03 — apply_cuts data-driven predicates (F3; clean_beta_scan.py:25-58)
# ---------------------------------------------------------------------------
# Mapping: trigger = l_orderkey, device = l_linenumber (restricted to lines
# 1 and 2 so every "scan" has exactly 2 "devices", matching the reference's
# two-device invariant), variables = l_quantity / l_extendedprice.

_Q03_CUTS = [
    ("l_quantity", 1, "lower", 5.0),
    ("l_quantity", 2, "higher", 45.0),
    ("l_extendedprice", 1, "higher", 60000.0),
]

_Q03_ORACLE = """
SELECT
  l_orderkey,
  (
    COALESCE(bool_and(l_quantity >= 5.0) FILTER (WHERE l_linenumber = 1), FALSE)
    AND COALESCE(bool_and(l_quantity <= 45.0) FILTER (WHERE l_linenumber = 2), FALSE)
    AND COALESCE(bool_and(l_extendedprice <= 60000.0) FILTER (WHERE l_linenumber = 1), FALSE)
  ) AS accepted
FROM lineitem
WHERE l_linenumber IN (1, 2)
GROUP BY l_orderkey
ORDER BY l_orderkey
"""


@register("q03_cuts", _Q03_ORACLE)
def q03_cuts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber").isin(1, 2))
    cuts = spark.createDataFrame(
        _Q03_CUTS, "variable string, device_name int, `cut type` string, `cut value` double"
    )
    out = apply_cuts(li, cuts, trigger_col="l_orderkey", device_col="l_linenumber")
    return out.orderBy("l_orderkey")


# ---------------------------------------------------------------------------
# q04 — join fabric + broadcast dims (J1/J2/J3)
# ---------------------------------------------------------------------------

_Q04_ORACLE = f"""
SELECT
  r.r_name AS region_name,
  n.n_name AS nation_name,
  COUNT(*) AS n_lineitems,
  {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY r.r_name, n.n_name
ORDER BY region_name, nation_name
"""


@register("q04_join_enrich", _Q04_ORACLE)
def q04_join_enrich(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(F.count("*").alias("n_lineitems"), dsum(revenue).alias("revenue"))
        .orderBy("region_name", "nation_name")
    )


# ---------------------------------------------------------------------------
# q163/q164/q165 — the canonical TPC-H join-aggregate shapes (Q3 / Q5 /
# Q10 analogs on this schema), exact-gated with decimal revenue sums.
# The OLAP anchor set: each is the textbook plan — filters pushed to
# every scan, dims broadcast, one map-side-combined revenue aggregation,
# deterministic top-N ordering.
# ---------------------------------------------------------------------------

_REV = "l_extendedprice * (1.0 - l_discount)"

_Q163_ORACLE = f"""
SELECT l.l_orderkey,
       {sql_dsum(_REV)} AS revenue,
       epoch_us(o.o_orderdate) AS order_date_us,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q163_shipping_priority", _Q163_ORACLE)
def q163_shipping_priority(spark, sf_dir):
    # o_orderdate/l_shipdate surface as TIMESTAMP_NTZ; the session is
    # pinned UTC, so a TIMESTAMP cast is instant-preserving and
    # unix_micros mirrors DuckDB's epoch_us exactly
    cutoff_us = 896_659_200_000_000  # 1998-06-01 UTC in epoch-µs (TPC-H date range)
    order_us = "unix_micros(cast(o_orderdate as timestamp))"
    ship_us = "unix_micros(cast(l_shipdate as timestamp))"
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(F.expr(order_us) < cutoff_us)
    li = load(spark, sf_dir, "lineitem").filter(F.expr(ship_us) > cutoff_us)
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "l_orderkey",
            F.expr(order_us).alias("order_date_us"),
            "o_orderpriority",
        )
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date_us", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_Q165_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sql_dsum(_REV)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q165_returned_revenue", _Q165_ORACLE)
def q165_returned_revenue(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(rev).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q164_ORACLE = f"""
SELECT n.n_name,
       {sql_dsum(_REV)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE s.s_nationkey = c.c_nationkey
GROUP BY 1
ORDER BY revenue DESC, n_name
"""


@register("q164_local_supplier_volume", _Q164_ORACLE)
def q164_local_supplier_volume(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# q166 — promo revenue share (TPC-H Q14 shape): the part-dimension join
# with a conditional aggregate ratio; both sums decimal-exact, the
# closing division IEEE-exact.
# q167 — order-priority fulfilment counts (TPC-H Q4 shape): orders with
# at least one late lineitem, counted by priority — the EXISTS
# semi-join surface (left_semi in Spark, EXISTS in SQL).
# ---------------------------------------------------------------------------

_Q166_ORACLE = f"""
SELECT
  {sql_dsum("CASE WHEN p.p_type LIKE 'STANDARD%' THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END")}
    AS promo_revenue,
  {sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS total_revenue,
  {sql_dsum("CASE WHEN p.p_type LIKE 'STANDARD%' THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END")}
    / {sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""


@register("q166_promo_share", _Q166_ORACLE)
def q166_promo_share(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(0.0)
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return j.agg(
        dsum(promo).alias("promo_revenue"),
        dsum(rev).alias("total_revenue"),
        (dsum(promo) / dsum(rev)).alias("promo_share"),
    )


_Q167_ORACLE = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY 1
ORDER BY 1
"""


@register("q167_priority_counts", _Q167_ORACLE)
def q167_priority_counts(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q168 — percent-of-total window (ratio_to_report): each nation's share
# of its region's revenue. Numerators/denominators are exact decimal
# sums (the window SUM runs over the decimal partials), the share is
# one IEEE-exact division — windowed ratio analytics under the gate.
# ---------------------------------------------------------------------------

_Q168_ORACLE = """
WITH rev AS (
  SELECT n.n_regionkey, n.n_name,
         CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 1000000.0)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS nation_rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT n_regionkey, n_name, nation_rev,
       nation_rev /
       (CAST(SUM(CAST(FLOOR(nation_rev * 1000000.0) AS DECIMAL(38,0)))
             OVER (PARTITION BY n_regionkey) AS DOUBLE) / 1000000.0)
         AS region_share
FROM rev
ORDER BY n_regionkey, n_name
"""


@register("q168_region_share", _Q168_ORACLE)
def q168_region_share(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    nation_rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("n_regionkey", "n_name")
        .agg(dsum(rev).alias("nation_rev"))
    )
    # the per-region denominator sums 25/5 already-exact doubles — but
    # window SUM order over doubles is engine-defined, so rescale to the
    # decimal grid for the window too (same discipline as everywhere)
    w = Window.partitionBy("n_regionkey")
    den = (
        F.sum(
            F.floor(F.col("nation_rev") * F.lit(1_000_000.0)).cast("decimal(38,0)")
        ).over(w)
        .cast("double")
        / F.lit(1_000_000.0)
    )
    return nation_rev.select(
        "n_regionkey",
        "n_name",
        "nation_rev",
        (F.col("nation_rev") / den).alias("region_share"),
    ).orderBy("n_regionkey", "n_name")


# ---------------------------------------------------------------------------
# q357 — ROLLUP over the region>nation hierarchy (SQL-surface
# completion: multi-level aggregates in ONE pass instead of N unioned
# groupBys — at 100 TB the rollup reuses a single shuffle's partial
# aggregates for every level, which is exactly why the operator exists).
# grouping_id() disambiguates levels; rollup NULLs are coalesced to a
# sentinel so level totals and genuine keys can't collide in the hash.
# Oracle: DuckDB GROUP BY ROLLUP + GROUPING_ID (both engines follow the
# standard bit order: first listed column = most significant bit).
# ---------------------------------------------------------------------------

_Q357_ORACLE = """
SELECT COALESCE(r_name, '(all)') AS region,
       COALESCE(n_name, '(all)') AS nation,
       CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100.0) AS DECIMAL(38,0))) AS BIGINT)
         AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY gid, region, nation
"""


@register("q357_rollup_hierarchy", _Q357_ORACLE)
def q357_rollup_hierarchy(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = cust.join(
        F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]
    ).join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").cast("bigint").alias("n_cust"),
            F.sum(F.floor(F.col("c_acctbal") * 100.0).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("acctbal_cents"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation"),
            "gid", "n_cust", "acctbal_cents",
        )
        .orderBy("gid", "region", "nation")
    )


# ---------------------------------------------------------------------------
# q358 — CUBE over (priority, status): all four grouping sets — the
# full cross-classification an OLAP dashboard reads from one shuffle.
# Same sentinel + grouping_id discipline as q357.
# ---------------------------------------------------------------------------

_Q358_ORACLE = """
SELECT COALESCE(o_orderpriority, '(all)') AS priority,
       COALESCE(o_orderstatus, '(all)') AS status,
       CAST(GROUPING_ID(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(38,0))) AS BIGINT)
         AS price_cents
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
ORDER BY gid, priority, status
"""


@register("q358_cube_priority_status", _Q358_ORACLE)
def q358_cube_priority_status(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("price_cents"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "gid", "n_orders", "price_cents",
        )
        .orderBy("gid", "priority", "status")
    )


# ---------------------------------------------------------------------------
# q359 — explicit GROUPING SETS (the general form q357/q358
# specialize): three hand-picked sets — (priority, year), (priority),
# (year) — skipping the grand total, which neither rollup nor cube can
# express alone. Spark spells it in SQL (the DataFrame API deliberately
# exposes only rollup/cube); the plan still computes every set off one
# Expand + one shuffle.
# ---------------------------------------------------------------------------

_Q359_ORACLE = """
SELECT COALESCE(o_orderpriority, '(all)') AS priority,
       COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), -1) AS year,
       CAST(GROUPING_ID(o_orderpriority, EXTRACT(year FROM o_orderdate))
            AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, EXTRACT(year FROM o_orderdate)),
                        (o_orderpriority), (EXTRACT(year FROM o_orderdate)))
ORDER BY gid, priority, year
"""


@register("q359_grouping_sets", _Q359_ORACLE)
def q359_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("_q359_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), -1L)
                 AS year,
               CAST(GROUPING_ID() AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM _q359_orders
        GROUP BY GROUPING SETS
          ((o_orderpriority, EXTRACT(year FROM o_orderdate)),
           (o_orderpriority), (EXTRACT(year FROM o_orderdate)))
        ORDER BY gid, priority, year
        """
    )
