"""Hierarchical rollup (SURVEY §2.4 note: the reference has no grouping
sets, but Spark gives cube/rollup for free — exposed here as the
hypertable-style multi-granularity aggregate a reporting layer needs).

q43_rollup — region -> nation -> (all) revenue rollup with grouping ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.stats import dsum, sql_dsum
from .registry import load, register

_Q43_ORACLE = f"""
SELECT
  COALESCE(r.r_name, '(all)') AS region_name,
  CASE WHEN GROUPING(n.n_name) = 1 THEN '(all)' ELSE n.n_name END AS nation_name,
  COUNT(*) AS n_customers,
  {sql_dsum('c.c_acctbal')} AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY region_name, nation_name
"""


_Q55_ORACLE = """
SELECT
  CASE WHEN GROUPING(l_returnflag) = 1 THEN '(all)' ELSE l_returnflag END AS flag,
  CASE WHEN GROUPING(l_linestatus) = 1 THEN '(all)' ELSE l_linestatus END AS status,
  COUNT(*) AS n,
  CAST(SUM(CAST(FLOOR(l_quantity * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY flag, status
"""


@register("q55_cube", _Q55_ORACLE)
def q55_cube(spark, sf_dir):
    """CUBE grouping sets — all 2^2 marginal totals in one pass (the
    multi-granularity hypertable aggregate)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
            F.grouping("l_returnflag").alias("_gf"),
            F.grouping("l_linestatus").alias("_gs"),
        )
        .select(
            F.when(F.col("_gf") == 1, "(all)").otherwise(F.col("l_returnflag")).alias("flag"),
            F.when(F.col("_gs") == 1, "(all)").otherwise(F.col("l_linestatus")).alias("status"),
            "n",
            "sum_qty",
        )
        .orderBy("flag", "status")
    )


_Q56_RSD = 0.02


def _q56_oracle() -> str:
    """Since round 3, Spark's HLL++ itself replays in SQL
    (functions/hllsql): xxhash64 closed hashLong form, register maxes,
    the SEQUENTIAL float fold of 1/2^M (rounding order is semantics),
    linear-counting and 6-NN empirical-bias-correction branches over
    the published tables — so the 'engine-specific sketch' is now a
    bit-exact-gated function of the key set."""
    from ..functions.hllsql import sql_hll_count_longs

    return f"""
WITH RECURSIVE gp AS (
  SELECT DISTINCT l_returnflag AS g, l_orderkey AS v FROM lineitem
),
{sql_hll_count_longs('gp', _Q56_RSD)},
cnts AS (
  SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
)
SELECT c.l_returnflag,
       CAST(h.approx AS BIGINT) AS approx_orders,
       CAST(c.n_rows AS BIGINT) AS n_rows
FROM cnts c JOIN hll_out h ON c.l_returnflag = h.g
ORDER BY c.l_returnflag
"""


@register("q56_approx_distinct", _q56_oracle())
def q56_approx_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct counts — the 100 TB counting
    path (bounded sketch state vs an exact distinct's full shuffle).
    EXACT since round 3: the oracle replays Spark's HLL++ end to end
    (see _q56_oracle); the error bound against the exact count stays
    asserted in tests."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=_Q56_RSD).alias("approx_orders"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register("q43_rollup", _Q43_ORACLE)
def q43_rollup(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    rolled = joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
        F.grouping("n_name").alias("_gn"),
    )
    return rolled.select(
        F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region_name"),
        F.when(F.col("_gn") == 1, "(all)").otherwise(F.col("n_name")).alias("nation_name"),
        "n_customers",
        "total_acctbal",
    ).orderBy("region_name", "nation_name")


_Q90_K = 512


def _q90_oracle() -> str:
    """Since round 3 the 'engine-specific xxhash64' excuse is gone: the
    closed hashLong form replays in SQL (functions/xxh64sql), so the
    ENTIRE sketch chain — hashing, k-smallest selection, theta, the
    (k-1)/theta estimator, union/intersection/Jaccard set algebra with
    strict below-theta cuts — is oracle-replayable bit-for-bit."""
    from ..functions.xxh64sql import sql_xxhash64_long_cte

    k = _Q90_K
    two63 = "9223372036854775808.0"
    two64 = "18446744073709551616.0"
    frac = lambda h: f"((CAST({h} AS DOUBLE) + {two63}) / {two64})"  # noqa: E731

    def side(out, src):
        return f"""
{out}_keep AS (
  SELECT DISTINCT hv FROM {src} ORDER BY hv LIMIT {k}
),
{out}_st AS (
  SELECT COUNT(*) AS cnt, MAX(hv) AS kth FROM {out}_keep
),
{out}_est AS (
  SELECT cnt,
         CASE WHEN cnt < {k} THEN 1.0 ELSE {frac('kth')} END AS theta,
         CASE WHEN cnt < {k} THEN CAST(cnt AS DOUBLE)
              ELSE ({k} - 1) / {frac('kth')} END AS est
  FROM {out}_st
)"""

    return f"""
WITH la AS (SELECT DISTINCT l_orderkey AS v FROM lineitem),
{sql_xxhash64_long_cte('la', out_cte='xha')},
lb AS (SELECT DISTINCT o_orderkey AS v FROM orders WHERE o_orderstatus = 'F'),
{sql_xxhash64_long_cte('lb', out_cte='xhb')},
{side('sa', 'xha')},
{side('sb', 'xhb')},
u_keep AS (
  SELECT DISTINCT hv FROM (
    SELECT hv FROM sa_keep UNION SELECT hv FROM sb_keep
  ) ORDER BY hv LIMIT {k}
),
u_st AS (SELECT COUNT(*) AS cnt, MAX(hv) AS kth FROM u_keep),
u_est AS (
  SELECT CASE WHEN cnt < {k} THEN CAST(cnt AS DOUBLE)
              ELSE ({k} - 1) / {frac('kth')} END AS est
  FROM u_st
),
th AS (
  SELECT LEAST(a.theta, b.theta) AS theta
  FROM sa_est a CROSS JOIN sb_est b
),
a_below AS (
  SELECT hv FROM sa_keep CROSS JOIN th WHERE {frac('hv')} < th.theta
),
b_below AS (
  SELECT hv FROM sb_keep CROSS JOIN th WHERE {frac('hv')} < th.theta
),
inter AS (
  SELECT COUNT(*) AS nb FROM (
    SELECT hv FROM a_below INTERSECT SELECT hv FROM b_below
  )
),
uni AS (
  SELECT COUNT(*) AS nu FROM (
    SELECT hv FROM a_below UNION SELECT hv FROM b_below
  )
)
SELECT ROUND(sa_est.est, 3) AS est_lineitem_orders,
       ROUND(sb_est.est, 3) AS est_filtered_orders,
       ROUND(u_est.est, 3) AS est_union,
       ROUND(CAST(inter.nb AS DOUBLE) / th.theta, 3) AS est_intersect,
       ROUND(CASE WHEN uni.nu = 0 THEN 0.0
                  ELSE CAST(inter.nb AS DOUBLE) / uni.nu END, 6) AS est_jaccard
FROM sa_est CROSS JOIN sb_est CROSS JOIN u_est
CROSS JOIN th CROSS JOIN inter CROSS JOIN uni
"""


@register("q90_kmv_set_ops", _q90_oracle())
def q90_kmv_set_ops(spark, sf_dir):
    """KMV ("theta") distinct sketch set operations — the bounded-state
    path for distinct-cardinality algebra at 100 TB: estimate the
    distinct order keys on each side of lineitem ⋈ orders and their
    union/intersection/Jaccard WITHOUT a full distinct shuffle (the only
    exchange is ~k candidate hashes per side). EXACT since round 3: the
    oracle replays xxhash64's closed hashLong form in SQL and with it
    the whole theta-sketch algebra (see _q90_oracle). Deterministic —
    no RNG, so every estimate is a pure function of the key sets."""
    from ..operators.sketch import kmv_build

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    a = kmv_build(li, "l_orderkey", k=512)
    b = kmv_build(orders, "o_orderkey", k=512)
    row = [
        (
            round(a.estimate(), 3),
            round(b.estimate(), 3),
            round(a.union(b).estimate(), 3),
            round(a.intersect_estimate(b), 3),
            round(a.jaccard(b), 6),
        )
    ]
    return spark.createDataFrame(
        row,
        "est_lineitem_orders double, est_filtered_orders double, "
        "est_union double, est_intersect double, est_jaccard double",
    )


# ---------------------------------------------------------------------------
# q98 — grouped multi-quantile summary (p25/p50/p75/p95 + IQR). Spark's
# `percentile` and DuckDB's `quantile_cont` are both exact interpolating
# quantiles over the sorted group, so values agree (rounded to 6 as the
# usual libm-ulp guard). The scale rung for quantiles is
# histogram(stats_impl='distributed') — counted-rank selection with no
# single-reducer sort; this query pins the semantics the sketch path
# must reproduce.
# ---------------------------------------------------------------------------

_Q98_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       ROUND(quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25), 6) AS iqr
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q98_grouped_quantiles", _Q98_ORACLE)
def q98_grouped_quantiles(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    q = F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(q.alias("_q"))
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_q")[0], 6).alias("p25"),
        F.round(F.col("_q")[1], 6).alias("p50"),
        F.round(F.col("_q")[2], 6).alias("p75"),
        F.round(F.col("_q")[3], 6).alias("p95"),
        F.round(F.col("_q")[2] - F.col("_q")[0], 6).alias("iqr"),
    ).orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# q100 — winsorization (outlier clipping to the per-group [p05, p95]
# band) followed by a robust mean: the standard numeric-cleaning stage
# before model training. Two aggregations over one shuffle key (AQE
# reuses the exchange): exact interpolating quantiles per group, then a
# broadcast join back to clip and the exact-decimal mean of the clipped
# values. clamp = LEAST/GREATEST both engines; quantile parity as q98.
# ---------------------------------------------------------------------------

_Q100_ORACLE = """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1
),
clipped AS (
  SELECT l.l_returnflag,
         LEAST(GREATEST(l.l_extendedprice, q.lo), q.hi) AS v
  FROM lineitem l JOIN q USING (l_returnflag)
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(FLOOR(v * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
             / 1000000.0 / COUNT(*), 6) AS winsorized_mean
FROM clipped GROUP BY 1 ORDER BY 1
"""


@register("q100_winsorize", _Q100_ORACLE)
def q100_winsorize(spark, sf_dir):
    from ..functions.stats import dsum

    li = load(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("hi"),
    )
    clipped = li.join(F.broadcast(q), "l_returnflag").withColumn(
        "v", F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(dsum("v") / F.count("*"), 6).alias("winsorized_mean"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q102 — KLL-sketch-guided EXACT quantiles (operators/kll). The
# mergeable one-pass sketch brackets each target rank; an exact
# counting pass verifies the bracket (falling back to the full range if
# the sketch lied); selection is by exact counted rank inside the
# bracket. Same contract as the CMS flow: the sketch only prunes, so
# the result is bit-identical to DuckDB's quantile_disc (value at rank
# ceil(q*n)) — no interpolation, so no float-parity concerns at all.
# ---------------------------------------------------------------------------

_Q102_ORACLE = """
SELECT quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.50) AS p50,
       quantile_disc(l_extendedprice, 0.75) AS p75,
       quantile_disc(l_extendedprice, 0.95) AS p95,
       CAST(COUNT(l_extendedprice) AS BIGINT) AS n
FROM lineitem
"""


@register("q102_kll_exact_quantiles", _Q102_ORACLE)
def q102_kll_exact_quantiles(spark, sf_dir):
    from ..operators.kll import kll_exact_quantiles

    li = load(spark, sf_dir, "lineitem")
    qs = [0.25, 0.50, 0.75, 0.95]
    got = kll_exact_quantiles(li, "l_extendedprice", qs, k=512)
    n = li.agg(F.count("l_extendedprice").cast("long")).collect()[0][0]
    return spark.createDataFrame(
        [(got[0.25], got[0.50], got[0.75], got[0.95], n)],
        "p25 double, p50 double, p75 double, p95 double, n bigint",
    )


# ---------------------------------------------------------------------------
# q103 — grouped KMV sketch algebra, exact-gated on the unsaturated
# path: per-returnflag supplier sets are far below k, so each sketch
# holds EVERY distinct hash and the estimate / union / intersection /
# Jaccard columns are exact set algebra (theta = 1). The same plan at
# 100 TB saturates the sketches and degrades gracefully to ~1/sqrt(k)
# estimates (error bound asserted in tests) — the exchange never
# carries more than tasks x k hashes per group either way. Jaccard is
# one IEEE double division of the same exact ints in both engines.
# ---------------------------------------------------------------------------

_Q103_ORACLE = """
WITH s AS (SELECT DISTINCT l_returnflag AS f, l_suppkey AS k FROM lineitem),
cnt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY 1),
inter AS (
  SELECT a.f AS f1, b.f AS f2, CAST(COUNT(*) AS BIGINT) AS i
  FROM s a JOIN s b ON a.k = b.k AND a.f < b.f
  GROUP BY 1, 2
)
SELECT f1, f2, ca.c AS n1, cb.c AS n2, i AS n_intersect,
       ca.c + cb.c - i AS n_union,
       CAST(i AS DOUBLE) / CAST(ca.c + cb.c - i AS DOUBLE) AS jaccard
FROM inter
JOIN cnt ca ON ca.f = f1
JOIN cnt cb ON cb.f = f2
ORDER BY 1, 2
"""


@register("q103_kmv_grouped_algebra", _Q103_ORACLE)
def q103_kmv_grouped_algebra(spark, sf_dir):
    from ..operators.sketch import kmv_estimate_col, kmv_grouped, kmv_set_ops_col

    k = 16384
    li = load(spark, sf_dir, "lineitem")
    sk = kmv_grouped(li, ["l_returnflag"], "l_suppkey", k=k)
    a = sk.select(F.col("l_returnflag").alias("f1"), F.col("hs").alias("ha"))
    b = sk.select(F.col("l_returnflag").alias("f2"), F.col("hs").alias("hb"))
    u, i, j = kmv_set_ops_col(F.col("ha"), F.col("hb"), k)
    return (
        a.join(b, F.col("f1") < F.col("f2"))
        .select(
            "f1",
            "f2",
            kmv_estimate_col(F.col("ha"), k).cast("bigint").alias("n1"),
            kmv_estimate_col(F.col("hb"), k).cast("bigint").alias("n2"),
            i.cast("bigint").alias("n_intersect"),
            u.cast("bigint").alias("n_union"),
            j.alias("jaccard"),
        )
        .orderBy("f1", "f2")
    )


# ---------------------------------------------------------------------------
# q126 — KMV sketch algebra across a rollup hierarchy: ONE sketch pass
# over customers at (nation, segment) grain, then sketches merge up to
# (nation) and () by array algebra — the input is never rescanned for
# the coarser levels. Unsaturated here (1500 customers << k), so every
# level's estimate is the exact distinct count and the DuckDB GROUPING
# SETS oracle matches bit-for-bit; at 100 TB the same plan degrades to
# ~1/sqrt(k) estimates with the exchange still bounded at k hashes per
# group.
# ---------------------------------------------------------------------------

_Q126_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) AS n_distinct,
       CAST(GROUPING(c_nationkey) AS INT) AS g_nation,
       CAST(GROUPING(c_mktsegment) AS INT) AS g_segment
FROM customer
GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment), (c_nationkey), ())
ORDER BY g_nation, g_segment, c_nationkey, c_mktsegment
"""


@register("q126_kmv_rollup", _Q126_ORACLE)
def q126_kmv_rollup(spark, sf_dir):
    from ..operators.sketch import kmv_estimate_col, kmv_grouped, kmv_merge_agg

    k = 16384
    cust = load(spark, sf_dir, "customer")
    # three rollup levels read this grouped-sketch aggregate — cache it
    # so the union computes it once (q78 merge-family rule)
    base = kmv_grouped(
        cust, ["c_nationkey", "c_mktsegment"], "c_custkey", k=k
    ).cache()

    lvl2 = base.select(
        "c_nationkey", "c_mktsegment",
        kmv_estimate_col(F.col("hs"), k).alias("n_distinct"),
        F.lit(0).alias("g_nation"), F.lit(0).alias("g_segment"),
    )
    by_nation = base.groupBy("c_nationkey").agg(kmv_merge_agg("hs", k).alias("hs"))
    lvl1 = by_nation.select(
        "c_nationkey",
        F.lit(None).cast("string").alias("c_mktsegment"),
        kmv_estimate_col(F.col("hs"), k).alias("n_distinct"),
        F.lit(0).alias("g_nation"), F.lit(1).alias("g_segment"),
    )
    total = by_nation.agg(kmv_merge_agg("hs", k).alias("hs"))
    lvl0 = total.select(
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        kmv_estimate_col(F.col("hs"), k).alias("n_distinct"),
        F.lit(1).alias("g_nation"), F.lit(1).alias("g_segment"),
    )
    return (
        lvl2.unionByName(lvl1)
        .unionByName(lvl0)
        .orderBy("g_nation", "g_segment", "c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q132 — sliding window distinct via KMV merge: daily sketches of active
# users are built ONCE, then every 7-day trailing window merges its 7
# sketches by array algebra — no rescan of events per window (the
# COUNT(DISTINCT) OVER sliding-window query that engines cannot
# incrementalize). Unsaturated here ⇒ exact, matching the oracle's
# brute-force per-window distinct counts.
# ---------------------------------------------------------------------------

_Q132_DAY_NS = 86_400 * 10**9
_Q132_WIN = 7

_Q132_ORACLE = f"""
WITH d AS (SELECT DISTINCT epoch_ns(ts) // {_Q132_DAY_NS} AS day FROM events)
SELECT d.day,
       CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
             WHERE epoch_ns(e.ts) // {_Q132_DAY_NS} BETWEEN d.day - {_Q132_WIN - 1} AND d.day
            ) AS DOUBLE) AS n_distinct
FROM d
ORDER BY d.day
"""


@register("q132_sliding_distinct", _Q132_ORACLE)
def q132_sliding_distinct(spark, sf_dir):
    from ..operators.sketch import kmv_estimate_col, kmv_grouped, kmv_merge_agg

    k = 16384
    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.expr(f"ts div {_Q132_DAY_NS}")
    )
    daily = kmv_grouped(ev, ["day"], "user_id", k=k)
    windows = (
        daily.select(F.col("day").alias("src_day"), "hs")
        .join(
            daily.select(F.col("day").alias("day")),
            (F.col("src_day") >= F.col("day") - (_Q132_WIN - 1))
            & (F.col("src_day") <= F.col("day")),
        )
        .groupBy("day")
        .agg(kmv_merge_agg("hs", k).alias("hs"))
    )
    return windows.select(
        "day", kmv_estimate_col(F.col("hs"), k).alias("n_distinct")
    ).orderBy("day")
