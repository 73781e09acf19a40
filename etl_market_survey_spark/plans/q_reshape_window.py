"""Reshape, window, sort/union/distinct queries (SURVEY §2.5-§2.7).

q05_pivot        — R1 pivot long->wide with explicit values.
q06_pivot_roundtrip — R1+R2: pivot then melt back == direct group agg.
q07_pivot_table  — R3 pivot with mean aggregate.
q08_ecdf         — W1/A8 cume_dist ECDF per partition.
q09_half_curve   — W2 first-half-of-sorted-partition filter.
q10_first_diff   — W3 min spacing of sorted distinct values.
q15_argmin_group — A5/O2 deterministic argmin-per-group.
q16_union        — O3 unionByName of heterogeneous subsets.
q17_scalar_summary — A4 global multi-stat scalar aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.stats import davg, dstd, dsum, ecdf, group_mad, sql_davg, sql_dstd, sql_dsum
from ..operators.reshape import melt, pivot_wide
from ..operators.windows import first_diff, half_curve
from .registry import load, register

# ---------------------------------------------------------------------------
# q05 — pivot (R1): returnflag x linestatus quantity matrix
# ---------------------------------------------------------------------------

_Q05_ORACLE = f"""
SELECT l_returnflag,
  {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS sum_qty_F,
  {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS sum_qty_O
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("q05_pivot", _Q05_ORACLE)
def q05_pivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )
    return wide.select(
        "l_returnflag",
        F.col("F").alias("sum_qty_F"),
        F.col("O").alias("sum_qty_O"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q06 — pivot -> melt round trip (R1+R2) == direct group agg
# ---------------------------------------------------------------------------

_Q06_ORACLE = f"""
SELECT l_returnflag, l_linestatus AS status,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q06_pivot_roundtrip", _Q06_ORACLE)
def q06_pivot_roundtrip(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    wide = pivot_wide(
        li,
        index=["l_returnflag"],
        columns="l_linestatus",
        values=["l_quantity"],
        column_values=["F", "O"],
        agg="sum",  # sums within pivot cells; determinism via melt==groupby is on ints? no — see note
    )
    # For oracle-exactness the pivot uses dsum semantics: redo with dsum.
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )
    long = melt(
        wide,
        ids=["l_returnflag"],
        value_vars=["F", "O"],
        var_name="status",
        value_name="sum_qty",
    )
    return long.orderBy("l_returnflag", "status")


# ---------------------------------------------------------------------------
# q07 — pivot_table with mean (R3): orderpriority x orderstatus avg price
# ---------------------------------------------------------------------------

_Q07_ORACLE = f"""
SELECT o_orderpriority,
  {sql_davg("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS avg_price_F,
  {sql_davg("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS avg_price_O,
  {sql_davg("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS avg_price_P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("q07_pivot_table", _Q07_ORACLE)
def q07_pivot_table(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(davg("o_totalprice"))
    )
    return wide.select(
        "o_orderpriority",
        F.col("F").alias("avg_price_F"),
        F.col("O").alias("avg_price_O"),
        F.col("P").alias("avg_price_P"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# q08 — ECDF (W1/A8) per event_type over value
# ---------------------------------------------------------------------------

_Q08_ORACLE = """
SELECT event_id, event_type, value,
       cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS ecdf
FROM events ORDER BY event_type, value, event_id
"""


@register("q08_ecdf", _Q08_ORACLE)
def q08_ecdf(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ecdf(ev, ["event_type"], "value").orderBy("event_type", "value", "event_id")


# ---------------------------------------------------------------------------
# q09 — half-curve (W2): first half of each user's event stream by time
# ---------------------------------------------------------------------------

_Q09_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, event_id, value FROM ranked
WHERE rn <= CAST(FLOOR(n / 2) AS BIGINT)
ORDER BY user_id, event_id
"""


@register("q09_half_curve", _Q09_ORACLE)
def q09_half_curve(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = half_curve(ev, partition=["user_id"], order=["ts", "event_id"])
    return out.select("user_id", "event_id", "value").orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# q10 — first-difference min spacing (W3) of distinct values per event_type
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
WITH d AS (SELECT DISTINCT event_type, value FROM events),
     l AS (SELECT event_type,
                  value - lag(value) OVER (PARTITION BY event_type ORDER BY value) AS diff
           FROM d)
SELECT event_type, MIN(diff) AS diff FROM l WHERE diff IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


@register("q10_first_diff", _Q10_ORACLE)
def q10_first_diff(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return first_diff(ev, ["event_type"], "value").orderBy("event_type")


# ---------------------------------------------------------------------------
# q15 — deterministic argmin/argmax per group (A5/O2)
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH ranked AS (
  SELECT n_name, s_name, s_acctbal,
         row_number() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rn
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, s_name, s_acctbal FROM ranked WHERE rn = 1 ORDER BY n_name
"""


@register("q15_argmin_group", _Q15_ORACLE)
def q15_argmin_group(spark, sf_dir):
    from pyspark.sql.window import Window

    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    joined = sup.join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
    w = Window.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("n_name", "s_name", "s_acctbal")
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q16 — union of heterogeneous frames (O3) + distinct aggregation (A10)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
WITH u AS (
  SELECT o_orderstatus AS status, o_totalprice AS price, 'big' AS bucket
  FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_orderstatus AS status, o_totalprice AS price, 'urgent' AS bucket
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT status, bucket, COUNT(*) AS n, COUNT(DISTINCT price) AS n_distinct_price
FROM u GROUP BY status, bucket ORDER BY status, bucket
"""


@register("q16_union", _Q16_ORACLE)
def q16_union(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit("big").alias("bucket"),
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.lit("urgent").alias("bucket"),
    )
    return (
        big.unionByName(urgent)
        .groupBy("status", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(F.col("price")).alias("n_distinct_price"),
        )
        .orderBy("status", "bucket")
    )


# ---------------------------------------------------------------------------
# q17 — global scalar summary (A4): mean/std/median/MAD of o_totalprice
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
WITH med AS (SELECT median(o_totalprice) AS m FROM orders)
SELECT
  COUNT(*) AS n,
  {sql_davg('o_totalprice')} AS mean,
  {sql_dstd('o_totalprice')} AS std,
  median(o_totalprice) AS median,
  1.4826 * median(abs(o_totalprice - med.m)) AS mad_std
FROM orders, med GROUP BY med.m
"""


@register("q17_scalar_summary", _Q17_ORACLE)
def q17_scalar_summary(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    base = orders.agg(
        F.count("*").alias("n"),
        davg("o_totalprice").alias("mean"),
        dstd("o_totalprice").alias("std"),
        F.median("o_totalprice").alias("median"),
    )
    mad = group_mad(orders, [], "o_totalprice", "mad_std", scaled=True)
    return base.crossJoin(F.broadcast(mad))


# ---------------------------------------------------------------------------
# q80 — ntile decile stats per group (the ranking-window family member
# the rest of the suite doesn't exercise). Aggregates only the ordered
# column, so tied rows are interchangeable across a bucket boundary and
# the result is engine-exact despite ntile's positional tie-split.
# Scale: l_returnflag has THREE distinct values — a rank window
# partitioned by it is 3 single-task sorts of n/3 rows each (the r6
# verdict's named scale-killer). The rank instead comes from
# operators/globalindex.grouped_sort_index (range partitioning on
# (group, value) + broadcast offsets — sort parallelism = shuffle
# partitions, independent of group cardinality) and the ntile bucket is
# derived arithmetically from (rank, group count): with base = n//B and
# rem = n%B the first rem buckets hold base+1 rows, exactly SQL NTILE.
# ---------------------------------------------------------------------------

_Q80_ORACLE = """
WITH t AS (
  SELECT l_returnflag, l_extendedprice AS p,
         ntile(10) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS decile
  FROM lineitem
)
SELECT l_returnflag, CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(p) AS min_price,
       MAX(p) AS max_price,
       CAST(SUM(CAST(FLOOR(p * 100.0) AS DECIMAL(38,0))) AS BIGINT) AS price_cents
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q80_ntile_deciles", _Q80_ORACLE)
def q80_ntile_deciles(spark, sf_dir):
    from ..operators.globalindex import grouped_sort_index

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        "l_orderkey",
        "l_linenumber",
    )
    # total order (unique tiebreak) — tied p straddling a bucket
    # boundary contributes identically to every aggregate below, so the
    # tie split is hash-irrelevant (same argument as NTILE's own)
    ranked = grouped_sort_index(
        li, ["l_returnflag"], ["p", "l_orderkey", "l_linenumber"],
        index_col="rnk",
    )
    counts = li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt")
    ).select(
        "l_returnflag",
        F.expr("cnt DIV 10").alias("base"),
        (F.col("cnt") % 10).alias("rem"),
    )
    decile = F.expr(
        "CAST(CASE WHEN rnk <= rem * (base + 1)"
        " THEN (rnk - 1) DIV (base + 1)"
        " ELSE rem + (rnk - 1 - rem * (base + 1)) DIV base END AS INT) + 1"
    )
    t = ranked.join(F.broadcast(counts), "l_returnflag").select(
        "l_returnflag", "p", decile.alias("decile")
    )
    return (
        t.groupBy("l_returnflag", "decile")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("p").alias("min_price"),
            F.max("p").alias("max_price"),
            F.sum(F.floor(F.col("p") * 100.0).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("price_cents"),
        )
        .orderBy("l_returnflag", "decile")
    )


# ---------------------------------------------------------------------------
# q171 — the remaining rank-function surface in one gated query:
# percent_rank, cume_dist, dense_rank, lag/lead deltas. All derive from
# integer ranks/counts (ratios of exact integers), so every column is
# engine-exact with no rounding guard.
# ---------------------------------------------------------------------------

_Q171_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       DENSE_RANK() OVER w AS drank,
       l_quantity - LAG(l_quantity) OVER w AS d_prev,
       LEAD(l_quantity) OVER w - l_quantity AS d_next
FROM lineitem
WHERE l_orderkey <= 1000
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber)
ORDER BY l_orderkey, l_linenumber
"""


@register("q171_rank_functions", _Q171_ORACLE)
def q171_rank_functions(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
        (F.col("l_quantity") - F.lag("l_quantity").over(w)).alias("d_prev"),
        (F.lead("l_quantity").over(w) - F.col("l_quantity")).alias("d_next"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# q172 — value-RANGE window frame (not rows): per user, activity in the
# trailing ONE HOUR of event time — count and exact decimal sum over
# RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW on integer
# microseconds. The time-windowed running aggregate a rows-frame cannot
# express when event spacing is irregular.
# ---------------------------------------------------------------------------

_Q172_ORACLE = """
SELECT user_id, event_id, us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) OVER w AS DOUBLE)
         / 1000000.0 AS sum_1h
FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, us, event_id
"""


@register("q172_range_frame", _Q172_ORACLE)
def q172_range_frame(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "us",
        F.count("*").over(w).cast("long").alias("n_1h"),
        (
            F.sum(
                F.floor(F.col("value") * 1_000_000.0).cast("decimal(38,0)")
            ).over(w)
            .cast("double")
            / 1_000_000.0
        ).alias("sum_1h"),
    ).orderBy("user_id", "us", "event_id")
