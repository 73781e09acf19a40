"""Temporal operators: as-of join and sessionization on the events table.

q41_asof_join  — for every purchase event, the most recent click by the
    same user at-or-before it (oracle: DuckDB's native ASOF JOIN — our
    union+window composition must match it exactly).
q42_sessionize — gap-based sessions (30 min) per user, rolled up.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join, sessionize
from .registry import load, register

# ts is epoch-nanos (long) on the Spark side; DuckDB truncates ns parquet
# timestamps to microseconds on read, so cross-engine time arithmetic is
# expressed in whole microseconds on BOTH sides (epoch_us <-> floor(ns/1e3)).

_Q41_ORACLE = """
SELECT l.event_id,
       l.user_id,
       l.value AS purchase_value,
       r.value AS click_value,
       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


@register("q41_asof_join", _Q41_ORACLE)
def q41_asof_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases, clicks, on="ts", by=["user_id"], value_cols=["value"]
    )
    us = lambda c: F.expr(f"`{c}` div 1000")  # integer floor-div: double division loses ns precision  # noqa: E731
    return joined.select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        F.col("value_asof").alias("click_value"),
        (us("ts") - us("ts_asof")).alias("lag_us"),
    ).orderBy("event_id")


_GAP_US = 30 * 60 * 1_000_000  # 30 min in micros

_Q42_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM sessions GROUP BY 1, 2 ORDER BY 1, 2
"""


_Q49_ORACLE = """
SELECT event_type,
       (epoch_us(ts) // 3600000000) AS hour_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q49_tumbling_window", _Q49_ORACLE)
def q49_tumbling_window(spark, sf_dir):
    """Batch event-time tumbling windows — the batch twin of
    streaming.windowed_counts (same grouping, integer-µs bucket keys so
    the oracle replays it)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_bucket", F.expr("(ts div 1000) div 3600000000"))
        .groupBy("event_type", "hour_bucket")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("value") * 1000000.0).cast("decimal(38,0)")).cast("double")
                / 1000000.0
            ).alias("sum_value"),
        )
        .orderBy("event_type", "hour_bucket")
    )


@register("q42_sessionize", _Q42_ORACLE)
def q42_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn(
        "_ts_us", F.expr("ts div 1000")  # integer floor-div (not double /)
    )
    sess = sessionize(ev, ["user_id"], "_ts_us", gap=_GAP_US)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("_ts_us") - F.min("_ts_us")).alias("duration_us"),
            (
                F.sum(F.floor(F.col("value") * 1000000.0).cast("decimal(38,0)")).cast("double")
                / 1000000.0
            ).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


_BAND_US = 300 * 1_000_000  # 5 min band, integer micros

_Q69_ORACLE = f"""
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS sum_gap_us,
       CAST(MAX(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS max_gap_us
FROM events a JOIN events b
  ON a.event_type = b.event_type
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + {_BAND_US}
GROUP BY 1 ORDER BY 1
"""


@register("q69_band_join", _Q69_ORACLE)
def q69_band_join(spark, sf_dir):
    """Event self band-join: per type, all ordered pairs at most 5 min
    apart. The DuckDB oracle states it as a theta join (its IEJoin eats
    that); our plan is the bucketized equi-join from operators/rangejoin
    — Spark would otherwise fall back to a nested-loop join."""
    from ..operators.rangejoin import band_join

    ev = load(spark, sf_dir, "events").withColumn("_us", F.expr("ts div 1000"))
    a = ev.select("event_type", F.col("_us").alias("a_us"))
    b = ev.select("event_type", F.col("_us").alias("b_us"))
    pairs = band_join(
        a, b, keys=["event_type"], left_on="a_us", right_on="b_us",
        lower=0, upper=_BAND_US,
    )
    gap = F.col("b_us") - F.col("a_us")
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(gap).cast("bigint").alias("sum_gap_us"),
            F.max(gap).cast("bigint").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q81 — conversion funnel (view -> click -> purchase per user). The
# operator is a one-shuffle sorted-array automaton; the oracle replays
# the equivalent greedy-earliest semantics as a k-join cascade
# (t1 = min view; t2 = min click > t1; t3 = min purchase > t2).
# ---------------------------------------------------------------------------

_Q81_ORACLE = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
  WHERE event_type IN ('view', 'click', 'purchase') AND value > 99.0
),
users AS (SELECT DISTINCT user_id FROM base),
s1 AS (SELECT user_id, MIN(us) AS t1 FROM base WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT b.user_id, MIN(b.us) AS t2
  FROM base b JOIN s1 ON b.user_id = s1.user_id AND b.us > s1.t1
  WHERE b.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT b.user_id, MIN(b.us) AS t3
  FROM base b JOIN s2 ON b.user_id = s2.user_id AND b.us > s2.t2
  WHERE b.event_type = 'purchase' GROUP BY 1
),
per_user AS (
  SELECT u.user_id,
         CASE WHEN s3.t3 IS NOT NULL THEN 3
              WHEN s2.t2 IS NOT NULL THEN 2
              WHEN s1.t1 IS NOT NULL THEN 1
              ELSE 0 END AS n_completed,
         s3.t3 - s1.t1 AS dur_us
  FROM users u
  LEFT JOIN s1 ON u.user_id = s1.user_id
  LEFT JOIN s2 ON u.user_id = s2.user_id
  LEFT JOIN s3 ON u.user_id = s3.user_id
)
SELECT CAST(n_completed AS INT) AS n_completed,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(dur_us) AS BIGINT) AS total_funnel_us
FROM per_user GROUP BY 1 ORDER BY 1
"""


@register("q81_funnel", _Q81_ORACLE)
def q81_funnel(spark, sf_dir):
    from ..operators.funnel import funnel_match

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > 99.0)  # pushed to the scan
        .select("user_id", F.expr("ts div 1000").alias("us"), "event_type")
    )
    fm = funnel_match(
        ev, ["user_id"], "us", "event_type", ["view", "click", "purchase"]
    )
    dur = F.when(
        F.col("n_completed") == 3,
        F.element_at("stage_ts", 3) - F.element_at("stage_ts", 1),
    )
    return (
        fm.select("user_id", "n_completed", dur.alias("dur_us"))
        .groupBy(F.col("n_completed").cast("int").alias("n_completed"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("dur_us").cast("bigint").alias("total_funnel_us"),
        )
        .orderBy("n_completed")
    )


# ---------------------------------------------------------------------------
# q86 — time-weighted average per key (the TimescaleDB `time_weight`
# shape): each observation holds until the next one, so the mean weights
# value by its holding duration. Exact: integer-µs durations x integer
# cents, summed in decimal; the division happens once per key on
# identical integers. One window (lead) + one groupBy — both on the same
# key partitioning, so AQE folds them into one shuffle.
# ---------------------------------------------------------------------------

_Q86_ORACLE = """
WITH b AS (
  SELECT user_id, epoch_us(ts) AS us, CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT user_id, cents,
         lead(us) OVER (PARTITION BY user_id ORDER BY us, cents) - us AS dt_us
  FROM b
)
SELECT user_id,
       CAST(COUNT(dt_us) AS BIGINT) AS n_intervals,
       CAST(SUM(CAST(dt_us AS HUGEINT)) AS BIGINT) AS span_us,
       CAST(SUM(CAST(cents * dt_us AS HUGEINT)) AS DOUBLE)
         / CAST(SUM(CAST(dt_us AS HUGEINT)) AS DOUBLE) / 100.0 AS twa_value
FROM w WHERE dt_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


@register("q86_time_weighted_avg", _Q86_ORACLE)
def q86_time_weighted_avg(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
    )
    # deterministic tiebreak on equal timestamps: order by (us, cents)
    w = Window.partitionBy("user_id").orderBy("us", "cents")
    with_dt = ev.withColumn("dt_us", F.lead("us").over(w) - F.col("us")).filter(
        F.col("dt_us").isNotNull()
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return (
        with_dt.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(dec(F.col("dt_us"))).cast("bigint").alias("span_us"),
            (
                F.sum(dec(F.col("cents") * F.col("dt_us"))).cast("double")
                / F.sum(dec(F.col("dt_us"))).cast("double")
                / 100.0
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q87 — cohort retention: users grouped by first-active day; for each
# (cohort, day-offset), distinct returning users. The canonical growth-
# analytics rollup. Two shuffles on user_id (first-seen min + dedup),
# one on the cohort matrix — all key-bounded.
# ---------------------------------------------------------------------------

_Q87_ORACLE = """
WITH b AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
firsts AS (SELECT user_id, MIN(day) AS cohort_day FROM b GROUP BY 1),
active AS (SELECT DISTINCT user_id, day FROM b)
SELECT f.cohort_day,
       CAST(a.day - f.cohort_day AS INT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active a JOIN firsts f USING (user_id)
WHERE a.day - f.cohort_day IN (0, 1, 7)
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q87_cohort_retention", _Q87_ORACLE)
def q87_cohort_retention(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts div 1000) div 86400000000").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    joined = active.join(firsts, "user_id").withColumn(
        "day_offset", (F.col("day") - F.col("cohort_day")).cast("int")
    )
    return (
        joined.filter(F.col("day_offset").isin(0, 1, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# q89 — general event-pattern automaton (MATCH_RECOGNIZE-lite): the
# funnel generalized to quantified tokens, here `signup view+ purchase`.
# Spark side is the one-shuffle NFA-bitmask fold; the oracle rebuilds
# each user's alphabet-filtered, time-ordered type string and counts
# non-overlapping leftmost-shortest matches with a lazy RE2 regex
# (equivalent policy; tie order at equal ts = event_type, mirrored in
# the automaton's struct(ts, t) array_sort).
# ---------------------------------------------------------------------------

_Q89_ORACLE = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us, event_type
  FROM events WHERE event_type IN ('signup', 'view', 'purchase')
),
strings AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'signup' THEN 's'
                                    WHEN 'view' THEN 'v'
                                    ELSE 'p' END,
                    '' ORDER BY us, event_type) AS seq
  FROM base GROUP BY 1
),
per_user AS (
  SELECT user_id, len(regexp_extract_all(seq, 'sv+?p')) AS n_matches
  FROM strings
)
SELECT CAST(n_matches AS BIGINT) AS n_matches,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""


@register("q89_pattern_match", _Q89_ORACLE)
def q89_pattern_match(spark, sf_dir):
    from ..operators.pattern import pattern_match

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_type"
    )
    pm = pattern_match(
        ev,
        ["user_id"],
        "us",
        "event_type",
        [("signup", "1"), ("view", "+"), ("purchase", "1")],
    )
    return (
        pm.groupBy(F.col("n_matches").cast("bigint").alias("n_matches"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("n_matches")
    )


# ---------------------------------------------------------------------------
# q101 — full-regex event pattern (alternation + grouping): the q89
# automaton upgraded from quantified tokens to a Thompson-compiled
# regex, `signup (view|click)* purchase`. Execution is unchanged (one
# shuffle + JVM bitmask fold); the oracle replays the identical
# leftmost-shortest non-overlapping policy with a lazy regex over each
# user's alphabet-filtered, time-ordered code string.
# ---------------------------------------------------------------------------

_Q101_ORACLE = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us, event_type
  FROM events WHERE event_type IN ('signup', 'view', 'click', 'purchase')
),
strings AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'signup' THEN 's'
                                    WHEN 'view' THEN 'v'
                                    WHEN 'click' THEN 'c'
                                    ELSE 'p' END,
                    '' ORDER BY us, event_type) AS seq
  FROM base GROUP BY 1
),
per_user AS (
  SELECT user_id, len(regexp_extract_all(seq, 's[vc]*?p')) AS n_matches
  FROM strings
)
SELECT CAST(n_matches AS BIGINT) AS n_matches,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""


@register("q101_regex_match", _Q101_ORACLE)
def q101_regex_match(spark, sf_dir):
    from ..operators.pattern import pattern_match

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_type"
    )
    pm = pattern_match(
        ev, ["user_id"], "us", "event_type", "signup (view|click)* purchase"
    )
    return (
        pm.groupBy(F.col("n_matches").cast("bigint").alias("n_matches"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("n_matches")
    )


# ---------------------------------------------------------------------------
# q111 — pattern captures: q89's automaton (`signup view+ purchase`)
# upgraded to report per-token completion timestamps for each user's
# FIRST match (funnel step times generalized to quantified contiguous
# patterns). The oracle replays the identical fold as a recursive CTE:
# chain-state histories as scalar columns (h11; h21,h22), transitions
# as CASE arithmetic over the time-ordered event sequence, captures
# frozen at the first accept. Bit-exact, including the leftmost-attempt
# preference and the contiguity (attempt-killing) semantics.
# ---------------------------------------------------------------------------

_Q111_ORACLE = """
WITH RECURSIVE base AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY us, sym) AS rn,
         us, sym
  FROM (SELECT user_id, epoch_us(ts) AS us, event_type AS sym FROM events
        WHERE event_type IN ('signup', 'view', 'purchase'))
),
fold AS (
  SELECT user_id, 0 AS rn, CAST(0 AS BIGINT) AS n,
         CAST(NULL AS BIGINT) AS h11, CAST(NULL AS BIGINT) AS h21,
         CAST(NULL AS BIGINT) AS h22, CAST(NULL AS BIGINT) AS c1,
         CAST(NULL AS BIGINT) AS c2,  CAST(NULL AS BIGINT) AS c3
  FROM (SELECT DISTINCT user_id FROM base)
  UNION ALL
  SELECT user_id, rn,
         n + CASE WHEN hit THEN 1 ELSE 0 END,
         CASE WHEN hit THEN NULL ELSE nh11 END,
         CASE WHEN hit THEN NULL ELSE nh21 END,
         CASE WHEN hit THEN NULL ELSE nh22 END,
         COALESCE(c1, CASE WHEN hit THEN h21 END),
         COALESCE(c2, CASE WHEN hit THEN h22 END),
         COALESCE(c3, CASE WHEN hit THEN us END)
  FROM (
    SELECT f.user_id, b.rn, f.n, b.us, f.h21, f.h22, f.c1, f.c2, f.c3,
           (b.sym = 'purchase' AND f.h21 IS NOT NULL) AS hit,
           CASE WHEN b.sym = 'signup' THEN b.us END AS nh11,
           CASE WHEN b.sym = 'view' AND f.h21 IS NOT NULL THEN f.h21
                WHEN b.sym = 'view' AND f.h11 IS NOT NULL THEN f.h11 END AS nh21,
           CASE WHEN b.sym = 'view' AND f.h21 IS NOT NULL THEN f.h22
                WHEN b.sym = 'view' AND f.h11 IS NOT NULL THEN b.us END AS nh22
    FROM fold f JOIN base b ON b.user_id = f.user_id AND b.rn = f.rn + 1
  )
)
SELECT f.user_id, f.n AS n_matches,
       f.c1 AS t_step1, f.c2 AS t_step2, f.c3 AS t_step3
FROM fold f
JOIN (SELECT user_id, MAX(rn) AS mx FROM base GROUP BY 1) m
  ON f.user_id = m.user_id AND f.rn = m.mx
ORDER BY f.user_id
"""


@register("q111_pattern_captures", _Q111_ORACLE)
def q111_pattern_captures(spark, sf_dir):
    from ..operators.pattern import pattern_match_captures

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_type"
    )
    out = pattern_match_captures(
        ev,
        ["user_id"],
        "us",
        "event_type",
        [("signup", "1"), ("view", "+"), ("purchase", "1")],
    )
    return out.select(
        "user_id",
        F.col("n_matches").cast("bigint"),
        "t_step1",
        "t_step2",
        "t_step3",
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q123 — grid resampling with linear interpolation (operators/resample):
# each user's irregular event series lands on a daily grid, values
# linearly interpolated between bracketing events. One exchange, two
# window fills, int64 timestamp deltas before any double cast, one
# fixed-rounding interpolation expression — replayed verbatim by the
# oracle.
# ---------------------------------------------------------------------------

_Q123_STEP_NS = 86_400 * 10**9  # 1 day


def _q123_oracle() -> str:
    from ..operators.resample import sql_resample_linear

    return (
        sql_resample_linear(
            "events", "user_id", "epoch_ns(ts)", "value", _Q123_STEP_NS, "event_id"
        )
        + " ORDER BY user_id, ts_grid"
    )


@register("q123_resample_interp", _q123_oracle())
def q123_resample_interp(spark, sf_dir):
    from ..operators.resample import resample_linear

    ev = load(spark, sf_dir, "events")
    return resample_linear(
        ev, "user_id", "ts", "value", _Q123_STEP_NS, seq_col="event_id"
    ).orderBy("user_id", "ts_grid")


# ---------------------------------------------------------------------------
# q133 — geometric-weight moving average (the bounded-horizon EWMA a
# monitoring rollup wants): per user over event-time order, the last 4
# observations weighted 8/4/2/1. Exact: values land on the 1e-6 decimal
# grid BEFORE weighting, weights are integer powers of two, and partial
# heads renormalize over the weights actually present — one double
# division at the end, replayed verbatim by the oracle.
# ---------------------------------------------------------------------------

_Q133_H = 4


def _q133_pieces(engine: str):
    # weight 2^(H-1) for the current row, halving per step back
    num, den = [], []
    for i in range(_Q133_H):
        w = 2 ** (_Q133_H - 1 - i)
        if engine == "sql":
            v = f"lag(vq, {i}) OVER w" if i else "vq"
            num.append(f"COALESCE({v} * {w}, 0)")
            den.append(f"(CASE WHEN {v} IS NOT NULL THEN {w} ELSE 0 END)")
        else:
            v = F.lag("vq", i).over(_q133_w()) if i else F.col("vq")
            num.append(F.coalesce(v * w, F.lit(0)).cast("decimal(38,0)"))
            den.append(F.when(v.isNotNull(), F.lit(w)).otherwise(F.lit(0)))
    return num, den


def _q133_w():
    from pyspark.sql.window import Window

    return Window.partitionBy("user_id").orderBy("ts", "event_id")


@register(
    "q133_weighted_moving_avg",
    f"""
WITH q AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0)) AS vq
  FROM events
)
SELECT user_id, event_id,
       CAST({' + '.join(_q133_pieces('sql')[0])} AS DOUBLE)
       / (1000000.0 * ({' + '.join(_q133_pieces('sql')[1])})) AS wma
FROM q
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""",
)
def q133_weighted_moving_avg(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn(
        "vq", F.floor(F.col("value") * 1000000.0).cast("decimal(38,0)")
    )
    num, den = _q133_pieces("spark")
    total_num = num[0]
    for n in num[1:]:
        total_num = total_num + n
    total_den = den[0]
    for d in den[1:]:
        total_den = total_den + d
    wma = total_num.cast("double") / (F.lit(1000000.0) * total_den)
    return ev.select("user_id", "event_id", wma.alias("wma")).orderBy(
        "user_id", "event_id"
    )


# ---------------------------------------------------------------------------
# q134 — interval apportionment (operators/intervals): each order's
# fulfillment span [o_orderdate, max(l_shipdate)) spreads over 7-day
# epochs by exact overlap; per-epoch totals answer "active fulfillment
# time per week" with no calendar join. All int64 ns arithmetic; the
# oracle replays the explode arithmetically.
# ---------------------------------------------------------------------------

_Q134_BUCKET_NS = 7 * 86_400 * 10**9

_Q134_ORACLE = f"""
WITH iv AS (
  SELECT o.o_orderkey,
         epoch_ns(o.o_orderdate) AS s,
         epoch_ns(MAX(l.l_shipdate)) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
x AS (
  SELECT o_orderkey, s, e,
         unnest(range(s // {_Q134_BUCKET_NS}, (e - 1) // {_Q134_BUCKET_NS} + 1)) AS bucket
  FROM iv WHERE e > s
),
ap AS (
  SELECT bucket,
         LEAST(e, (bucket + 1) * {_Q134_BUCKET_NS})
         - GREATEST(s, bucket * {_Q134_BUCKET_NS}) AS overlap_ns
  FROM x
)
SELECT bucket, SUM(overlap_ns) AS total_ns, COUNT(*) AS n_intervals
FROM ap WHERE overlap_ns > 0
GROUP BY bucket
ORDER BY bucket
"""


@register("q134_interval_apportion", _Q134_ORACLE)
def q134_interval_apportion(spark, sf_dir):
    from ..operators.intervals import apportion_intervals, bucket_totals

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("_maxship"))
        .select(
            "o_orderkey",
            # scans surface TIMESTAMP_NTZ; the container runs UTC, so the
            # cast is a no-op relabel and matches DuckDB's epoch_ns
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias("s"),
            (F.unix_micros(F.col("_maxship").cast("timestamp")) * 1000).alias("e"),
        )
    )
    ap = apportion_intervals(iv, "s", "e", _Q134_BUCKET_NS)
    return bucket_totals(ap).orderBy("bucket")


# ---------------------------------------------------------------------------
# q147 — rolling exact median (telemetry smoothing): per user, ordered by
# (event time, event_id), the discrete median of the trailing 10-row
# value window. Discrete = an actual element is returned (DuckDB
# quantile_disc convention, 1-based rank ceil(n/2)), so both engines
# pick the identical double and the hash is exact — no interpolation to
# disagree about. Spark side: sort_array over the frame's collect_list;
# window state is bounded at 10 rows.
# ---------------------------------------------------------------------------

_Q147_W = 10

_Q147_ORACLE = f"""
SELECT user_id, epoch_us(ts) AS us, event_id,
       quantile_disc(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {_Q147_W - 1} PRECEDING AND CURRENT ROW
       ) AS roll_med
FROM events
ORDER BY user_id, us, event_id
"""


@register("q147_rolling_median", _Q147_ORACLE)
def q147_rolling_median(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-(_Q147_W - 1), 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    med = F.element_at(arr, F.ceil(F.size(arr) / 2).cast("int"))
    return ev.select(
        "user_id", "us", "event_id", med.alias("roll_med")
    ).orderBy("user_id", "us", "event_id")


# ---------------------------------------------------------------------------
# q158 — CUSUM drift detection per user (operators/cusum): the Page
# sequential detector over each user's event-value stream, alarms
# included. A stateful recurrence on DOUBLES — and still hash-exact,
# because +/max are IEEE-exact and the oracle's recursive CTE replays
# the identical fold (the q144 pattern extended to float state).
# ---------------------------------------------------------------------------

_Q158_K, _Q158_H = 55.0, 120.0


def _q158_oracle() -> str:
    from ..operators.cusum import sql_cusum_per_key

    inner = (
        "(SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events)"
    )
    body = sql_cusum_per_key(
        inner, "user_id", ["us", "event_id"], "value", _Q158_K, _Q158_H
    )
    return f"SELECT * FROM ({body}) ORDER BY user_id, us, event_id"


@register("q158_cusum_drift", _q158_oracle())
def q158_cusum_drift(spark, sf_dir):
    from ..operators.cusum import cusum_per_key

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_id", "value"
    )
    return cusum_per_key(
        ev, "user_id", ["us", "event_id"], "value", _Q158_K, _Q158_H
    ).orderBy("user_id", "us", "event_id")


# ---------------------------------------------------------------------------
# q159 — EWMA smoothing per user (the monitoring companion to q158's
# CUSUM): alpha*x + (1-alpha)*s fold in event order, IEEE-exact ops
# only, recursive-CTE oracle — float recurrence, hash-gated.
# ---------------------------------------------------------------------------

_Q159_ALPHA = 0.25


def _q159_oracle() -> str:
    from ..operators.cusum import sql_ewma_per_key

    inner = "(SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events)"
    body = sql_ewma_per_key(
        inner, "user_id", ["us", "event_id"], "value", _Q159_ALPHA
    )
    return f"SELECT * FROM ({body}) ORDER BY user_id, us, event_id"


@register("q159_ewma", _q159_oracle())
def q159_ewma(spark, sf_dir):
    from ..operators.cusum import ewma_per_key

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_id", "value"
    )
    return ewma_per_key(
        ev, "user_id", ["us", "event_id"], "value", _Q159_ALPHA
    ).orderBy("user_id", "us", "event_id")


# ---------------------------------------------------------------------------
# q160 — first/last-touch attribution: for every purchase, the first and
# the most recent preceding touch ('click'/'view') by the same user
# within a 7-day lookback. Pure min_by/max_by over an interval-bounded
# join on integer microseconds — the product-analytics join OLAP teams
# actually run; deterministic ties via (us, event_id) packing.
# ---------------------------------------------------------------------------

_Q160_LOOKBACK_US = 7 * 86_400_000_000


def _q160_oracle() -> str:
    return f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id AS touch_id, event_type, epoch_us(ts) AS touch_us
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT c.user_id, c.conv_id, c.conv_us, t.touch_id, t.event_type, t.touch_us
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.touch_us < c.conv_us
   AND t.touch_us >= c.conv_us - {_Q160_LOOKBACK_US}
)
SELECT user_id, conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       arg_min(touch_id, CAST(touch_us AS DECIMAL(38,0)) * 1000000 + touch_id) AS first_touch_id,
       arg_min(event_type, CAST(touch_us AS DECIMAL(38,0)) * 1000000 + touch_id) AS first_touch_type,
       arg_max(touch_id, CAST(touch_us AS DECIMAL(38,0)) * 1000000 + touch_id) AS last_touch_id,
       arg_max(event_type, CAST(touch_us AS DECIMAL(38,0)) * 1000000 + touch_id) AS last_touch_type
FROM j
GROUP BY user_id, conv_id
ORDER BY user_id, conv_id
"""


@register("q160_touch_attribution", _q160_oracle())
def q160_touch_attribution(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.expr("ts div 1000").alias("conv_us"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        "event_type",
        F.expr("ts div 1000").alias("touch_us"),
    )
    j = conv.join(touch, "user_id").filter(
        (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(_Q160_LOOKBACK_US))
    )
    # packed deterministic order key in decimal (µs epoch * 1e6 would
    # overflow int64): time dominates, event_id breaks ties
    key = (
        F.col("touch_us").cast("decimal(38,0)") * F.lit(1_000_000)
        + F.col("touch_id")
    )
    return (
        j.groupBy("user_id", "conv_id")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.min_by("touch_id", key).alias("first_touch_id"),
            F.min_by("event_type", key).alias("first_touch_type"),
            F.max_by("touch_id", key).alias("last_touch_id"),
            F.max_by("event_type", key).alias("last_touch_type"),
        )
        .orderBy("user_id", "conv_id")
    )


# ---------------------------------------------------------------------------
# q161 — SCD Type-2 history from a change log (the warehouse dimension-
# maintenance pattern): each user's event stream becomes versioned rows
# with [valid_from, valid_to) intervals — valid_to = next change's
# timestamp (lead window), open row NULL — plus a version number and
# is_current flag. One window, no self-join.
# ---------------------------------------------------------------------------

_Q161_ORACLE = """
SELECT user_id,
       event_id,
       event_type AS state,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER w AS valid_to_us,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       lead(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


@register("q161_scd2_history", _Q161_ORACLE)
def q161_scd2_history(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w).alias("valid_to_us"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("us").over(w).isNull().alias("is_current"),
    ).orderBy("user_id", "version")


# ---------------------------------------------------------------------------
# q162 — conversion-path analysis: for every purchase, the ordered
# sequence of preceding touch types in the 7-day lookback joined into a
# path string ("view>view>click"), then the top paths by conversion
# count. Order-stable assembly (sort_array of (time,id)-keyed structs ==
# string_agg ORDER BY), deterministic ranking ties.
# ---------------------------------------------------------------------------

_Q162_LOOKBACK_US = 7 * 86_400_000_000


def _q162_oracle() -> str:
    return f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id AS touch_id, event_type, epoch_us(ts) AS touch_us
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT c.conv_id, t.event_type, t.touch_us, t.touch_id
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.touch_us < c.conv_us
   AND t.touch_us >= c.conv_us - {_Q162_LOOKBACK_US}
),
paths AS (
  SELECT conv_id,
         string_agg(event_type, '>' ORDER BY touch_us, touch_id) AS path
  FROM j GROUP BY conv_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS conversions
FROM paths
GROUP BY path
ORDER BY conversions DESC, path
LIMIT 20
"""


@register("q162_conversion_paths", _q162_oracle())
def q162_conversion_paths(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.expr("ts div 1000").alias("conv_us"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        "event_type",
        F.expr("ts div 1000").alias("touch_us"),
    )
    j = conv.join(touch, "user_id").filter(
        (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(_Q162_LOOKBACK_US))
    )
    paths = j.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("touch_us", "touch_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("conversions"))
        .orderBy(F.col("conversions").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q169 — point-in-time (AS OF) dimension lookup: every purchase event
# enriched with the user's state VERSION that was valid at purchase
# time, against the q161-style SCD2 intervals — the join that makes
# training-data labels leak-free (no future state bleeding into past
# examples). Interval containment join on integer microseconds.
# ---------------------------------------------------------------------------

_Q169_ORACLE = """
WITH hist AS (
  SELECT user_id, event_id AS ver_event_id, event_type AS state,
         epoch_us(ts) AS valid_from_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to_us
  FROM events
),
conv AS (
  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_us
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.conv_id, c.conv_us,
       h.ver_event_id, h.state, h.valid_from_us
FROM conv c JOIN hist h
  ON c.user_id = h.user_id
 AND h.valid_from_us <= c.conv_us
 AND (h.valid_to_us IS NULL OR c.conv_us < h.valid_to_us)
ORDER BY c.user_id, c.conv_id
"""


@register("q169_pit_join", _Q169_ORACLE)
def q169_pit_join(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "ver_event_id")
    hist = (
        ev.select(
            "user_id",
            F.col("event_id").alias("ver_event_id"),
            F.col("event_type").alias("state"),
            F.expr("ts div 1000").alias("us"),
        )
        .withColumn("valid_from_us", F.col("us"))
        .withColumn("valid_to_us", F.lead("us").over(w))
        .drop("us")
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.expr("ts div 1000").alias("conv_us"),
    )
    return (
        conv.join(hist, "user_id")
        .filter(
            (F.col("valid_from_us") <= F.col("conv_us"))
            & (
                F.col("valid_to_us").isNull()
                | (F.col("conv_us") < F.col("valid_to_us"))
            )
        )
        .select(
            "user_id", "conv_id", "conv_us", "ver_event_id", "state", "valid_from_us"
        )
        .orderBy("user_id", "conv_id")
    )


# ---------------------------------------------------------------------------
# q170 — gaps-and-islands: each user's longest streak of consecutive
# active days. The classic day_number - dense_rank grouping constant:
# rows in one unbroken run share (day - rank), so one groupBy collapses
# islands. All-integer — exact.
# ---------------------------------------------------------------------------

_Q170_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
runs AS (
  SELECT user_id, day,
         day - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
islands AS (
  SELECT user_id, grp,
         CAST(COUNT(*) AS BIGINT) AS streak_days,
         MIN(day) AS start_day
  FROM runs GROUP BY 1, 2
)
SELECT user_id,
       MAX(streak_days) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       MIN(start_day) AS first_active_day
FROM islands
GROUP BY user_id
ORDER BY user_id
"""


@register("q170_active_streaks", _Q170_ORACLE)
def q170_active_streaks(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("(ts div 1000) div 86400000000").alias("day")
    ).distinct()
    runs = days.withColumn(
        "grp",
        F.col("day")
        - F.dense_rank().over(Window.partitionBy("user_id").orderBy("day")),
    )
    islands = runs.groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("streak_days"),
        F.min("day").alias("start_day"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.max("streak_days").alias("longest_streak"),
            F.count("*").cast("long").alias("n_streaks"),
            F.min("start_day").alias("first_active_day"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q237 — Theil-Sen robust trend (operators/robustfit) of monthly revenue
# per returnflag: median of all pairwise month-slopes (breakdown ~29% —
# one wild month can't drag the line, unlike q203's least squares). The
# pairwise stage runs on the per-month AGGREGATE (bounded by calendar),
# every slope is one double division of exact-decimal revenues, and the
# medians are the interpolating percentile both engines share — the
# oracle replays bit-for-bit.
# ---------------------------------------------------------------------------


def _q237_oracle() -> str:
    from ..functions.stats import sql_dsum
    from ..operators.robustfit import sql_theil_sen

    rev = "l_extendedprice * (1.0 - l_discount)"
    return f"""
WITH pts AS (
  SELECT l_returnflag AS g,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS DOUBLE) AS x,
         {sql_dsum(rev)} AS y
  FROM lineitem GROUP BY 1, 2
),
{sql_theil_sen('pts', 'l_returnflag')}
SELECT l_returnflag, slope, intercept, n_points FROM ts_out ORDER BY l_returnflag
"""


@register("q237_theil_sen", _q237_oracle())
def q237_theil_sen(spark, sf_dir):
    from ..functions.stats import dsum
    from ..operators.robustfit import theil_sen

    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pts = li.groupBy(
        F.col("l_returnflag"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("double")
        .alias("_mx"),
    ).agg(dsum(rev).alias("_my"))
    return (
        theil_sen(pts, ["l_returnflag"], "_mx", "_my")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q238 — classical additive seasonal decomposition (operators/seasonal)
# of monthly revenue per returnflag: centered MA-12 trend (half-weight
# ends, integral decimal numerator), per-phase seasonal effects centered
# to sum to zero, residual = y - trend - seasonal. Windows run over the
# per-month aggregate (bounded by calendar); every division happens once
# in double from exact decimal sums, so the oracle replays bit-for-bit.
# ---------------------------------------------------------------------------


def _q238_oracle() -> str:
    from ..functions.stats import sql_dsum
    from ..operators.seasonal import sql_seasonal_decompose

    rev = "l_extendedprice * (1.0 - l_discount)"
    return f"""
WITH pts AS (
  SELECT l_returnflag AS g,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS x,
         {sql_dsum(rev)} AS y
  FROM lineitem GROUP BY 1, 2
),
{sql_seasonal_decompose('pts', 12)}
SELECT g AS l_returnflag, x AS month_x, y, trend, seasonal, resid
FROM sd_out ORDER BY l_returnflag, month_x
"""


@register("q238_seasonal_decompose", _q238_oracle())
def q238_seasonal_decompose(spark, sf_dir):
    from ..functions.stats import dsum
    from ..operators.seasonal import seasonal_decompose

    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pts = li.groupBy(
        F.col("l_returnflag"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("_mx"),
    ).agg(dsum(rev).alias("_my"))
    return (
        seasonal_decompose(pts, ["l_returnflag"], "_mx", "_my", period=12)
        .select(
            "l_returnflag",
            F.col("x").alias("month_x"),
            "y",
            "trend",
            "seasonal",
            "resid",
        )
        .orderBy("l_returnflag", "month_x")
    )


# ---------------------------------------------------------------------------
# q239 — Holt double-exponential (level + trend) smoothing per user
# (operators/cusum.holt_per_key): the trend-aware monitoring smoother
# next to q159's EWMA. A two-variable float recurrence in event order —
# the recursive-CTE oracle replays every IEEE op bit-for-bit, incl. the
# classic l1=x1 / t1=x2-x1 init and one-step-ahead forecasts.
# ---------------------------------------------------------------------------

_Q239_ALPHA, _Q239_BETA = 0.3, 0.1


def _q239_oracle() -> str:
    from ..operators.cusum import sql_holt_per_key

    inner = "(SELECT user_id, epoch_us(ts) AS us, event_id, value FROM events)"
    body = sql_holt_per_key(
        inner, "user_id", ["us", "event_id"], "value", _Q239_ALPHA, _Q239_BETA
    )
    return f"SELECT * FROM ({body}) ORDER BY user_id, us, event_id"


@register("q239_holt_smoothing", _q239_oracle())
def q239_holt_smoothing(spark, sf_dir):
    from ..operators.cusum import holt_per_key

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_id", "value"
    )
    return holt_per_key(
        ev, "user_id", ["us", "event_id"], "value", _Q239_ALPHA, _Q239_BETA
    ).orderBy("user_id", "us", "event_id")


# ---------------------------------------------------------------------------
# q244 — Mann-Kendall monotone-trend test (operators/robustfit) of
# monthly revenue per returnflag: the significance companion to q237's
# Theil-Sen slope (the pair the monitoring literature prescribes
# together). S is an exact integer pair-sign sum; the tie-corrected
# variance is integer arithmetic over one double division; p-values go
# through the engine-shared exact erf expression.
# ---------------------------------------------------------------------------


def _q244_oracle() -> str:
    from ..functions.stats import sql_dsum
    from ..operators.robustfit import sql_mann_kendall

    rev = "l_extendedprice * (1.0 - l_discount)"
    return f"""
WITH pts AS (
  SELECT l_returnflag AS g,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS DOUBLE) AS x,
         {sql_dsum(rev)} AS y
  FROM lineitem GROUP BY 1, 2
),
{sql_mann_kendall('pts', 'l_returnflag')}
SELECT l_returnflag, s_stat, var_s, z, p_value, n_points FROM mk_out
ORDER BY l_returnflag
"""


@register("q244_mann_kendall", _q244_oracle())
def q244_mann_kendall(spark, sf_dir):
    from ..functions.stats import dsum
    from ..operators.robustfit import mann_kendall

    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pts = li.groupBy(
        F.col("l_returnflag"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("double")
        .alias("_mx"),
    ).agg(dsum(rev).alias("_my"))
    return mann_kendall(pts, ["l_returnflag"], "_mx", "_my").orderBy(
        "l_returnflag"
    )


# ---------------------------------------------------------------------------
# q249 — as-of join direction surface (operators/asof): for every
# purchase, the latest click at-or-before (backward), the earliest
# click at-or-after (forward), and the nearest click (ties to backward,
# the pandas merge_asof convention) — all three from the union+window
# shape, one shuffle on the user key, no range-join explosion. The
# oracle computes each direction independently via arg_min/arg_max over
# an interval join, so the window algebra is checked against a
# different algorithm entirely.
# ---------------------------------------------------------------------------

_Q249_ORACLE = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
  FROM events WHERE event_type = 'click'
),
bwd AS (
  SELECT p.purchase_id,
         arg_max(c.cus, CAST(c.cus AS DECIMAL(38,0)) * 10000000 + c.click_id) AS bwd_us
  FROM p JOIN c ON p.user_id = c.user_id AND c.cus <= p.us
  GROUP BY 1
),
fwd AS (
  SELECT p.purchase_id,
         arg_min(c.cus, CAST(c.cus AS DECIMAL(38,0)) * 10000000 + c.click_id) AS fwd_us
  FROM p JOIN c ON p.user_id = c.user_id AND c.cus >= p.us
  GROUP BY 1
)
SELECT p.user_id, p.purchase_id, p.us,
       b.bwd_us, f.fwd_us,
       CASE WHEN f.fwd_us IS NULL THEN b.bwd_us
            WHEN b.bwd_us IS NOT NULL AND (p.us - b.bwd_us) <= (f.fwd_us - p.us)
            THEN b.bwd_us ELSE f.fwd_us END AS nearest_us
FROM p
LEFT JOIN bwd b ON p.purchase_id = b.purchase_id
LEFT JOIN fwd f ON p.purchase_id = f.purchase_id
ORDER BY p.user_id, p.purchase_id
"""


@register("q249_asof_directions", _Q249_ORACLE)
def q249_asof_directions(spark, sf_dir):
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.expr("ts div 1000").alias("us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.expr("ts div 1000").alias("us")
    )
    b = asof_join(p, c, "us", ["user_id"], value_cols=[], suffix="_b")
    f = asof_join(
        b, c, "us", ["user_id"], value_cols=[], suffix="_f",
        direction="forward",
    )
    n = asof_join(
        f, c, "us", ["user_id"], value_cols=[], suffix="_n",
        direction="nearest",
    )
    return n.select(
        "user_id",
        "purchase_id",
        "us",
        F.col("us_b").alias("bwd_us"),
        F.col("us_f").alias("fwd_us"),
        F.col("us_n").alias("nearest_us"),
    ).orderBy("user_id", "purchase_id")


# ---------------------------------------------------------------------------
# q251 — period-over-period BI readout: monthly revenue per returnflag
# with month-over-month and year-over-year percent changes (lag 1 and
# lag 12 over the bounded per-month aggregate — the reporting staple).
# Exact-decimal revenue, one double division per ratio.
# ---------------------------------------------------------------------------


def _q251_oracle() -> str:
    from ..functions.stats import sql_dsum

    rev = "l_extendedprice * (1.0 - l_discount)"
    return f"""
WITH pts AS (
  SELECT l_returnflag AS g,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mx,
         {sql_dsum(rev)} AS rev
  FROM lineitem GROUP BY 1, 2
)
SELECT g AS l_returnflag, mx AS month_x, rev,
       (rev - LAG(rev, 1) OVER w) / LAG(rev, 1) OVER w AS mom_pct,
       (rev - LAG(rev, 12) OVER w) / LAG(rev, 12) OVER w AS yoy_pct
FROM pts
WINDOW w AS (PARTITION BY g ORDER BY mx)
ORDER BY l_returnflag, month_x
"""


@register("q251_period_over_period", _q251_oracle())
def q251_period_over_period(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..functions.stats import dsum

    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pts = li.groupBy(
        F.col("l_returnflag"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("month_x"),
    ).agg(dsum(rev).alias("rev"))
    w = W.partitionBy("l_returnflag").orderBy("month_x")
    mom = (F.col("rev") - F.lag("rev", 1).over(w)) / F.lag("rev", 1).over(w)
    yoy = (F.col("rev") - F.lag("rev", 12).over(w)) / F.lag("rev", 12).over(w)
    return pts.select(
        "l_returnflag",
        "month_x",
        "rev",
        mom.alias("mom_pct"),
        yoy.alias("yoy_pct"),
    ).orderBy("l_returnflag", "month_x")


# ---------------------------------------------------------------------------
# q252 — sweep-line interval concurrency: how many orders are OPEN
# (ordered but not yet shipped) at each boundary day, and each month's
# peak. Classic interval analytics: +1/-1 boundary events, a running
# sum over the day axis — routed through the two-phase
# prefix.distributed_cumsum (no single-reducer window over the
# boundary stream), then a per-month max. The oracle replays with a
# plain ordered window, proving the two-phase scan exact.
# ---------------------------------------------------------------------------

_Q252_ORACLE = """
WITH spans AS (
  SELECT o.o_orderdate AS d0, MAX(l.l_shipdate) AS d1
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
bounds AS (
  SELECT CAST(epoch_us(d0) // 86400000000 AS BIGINT) AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT CAST(epoch_us(d1) // 86400000000 AS BIGINT) AS day, -1 AS delta FROM spans
),
daily AS (
  SELECT day, SUM(delta) AS net FROM bounds GROUP BY 1
),
running AS (
  SELECT day,
         CAST(SUM(net) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS open_orders
  FROM daily
)
SELECT CAST(day // 30 AS BIGINT) AS month_bucket,
       CAST(MAX(open_orders) AS BIGINT) AS peak_open
FROM running
GROUP BY 1 ORDER BY 1
"""


@register("q252_interval_concurrency", _Q252_ORACLE)
def q252_interval_concurrency(spark, sf_dir):
    from ..operators.prefix import distributed_cumsum

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("d1"))
    )
    day = lambda c: F.expr(  # noqa: E731
        f"unix_micros(cast({c} as timestamp)) div 86400000000"
    ).cast("long")
    bounds = spans.select(day("o_orderdate").alias("day"), F.lit(1).alias("delta")).unionByName(
        spans.select(day("d1").alias("day"), F.lit(-1).alias("delta"))
    )
    daily = bounds.groupBy("day").agg(F.sum("delta").alias("net"))
    running = distributed_cumsum(daily, "day", "net", out="open_orders")
    return (
        running.groupBy(F.expr("day div 30").cast("long").alias("month_bucket"))
        .agg(F.max("open_orders").cast("long").alias("peak_open"))
        .orderBy("month_bucket")
    )


# ---------------------------------------------------------------------------
# q261 — SAX symbolization + motif support (operators/sax): each user's
# event-value series (integer cents, ordered by ts then event_id)
# collapses to an 8-segment SAX word over breakpoints [500, 1000, 1500]
# cents; output is per-user word plus how many users share it (the
# motif-candidate support). Counted segment allocation
# (seg = (rank-1)*W div n) and cross-multiplied symbol tests keep every
# step in exact integer arithmetic — the oracle replays it verbatim.
# ---------------------------------------------------------------------------

_Q261_W = 8
_Q261_BP = [500, 1000, 1500]

_Q261_ORACLE = f"""
WITH r AS (
  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
seg AS (
  SELECT user_id, ((rn - 1) * {_Q261_W}) // n AS s,
         SUM(v) AS sv, COUNT(*) AS c, MAX(n) AS n
  FROM r GROUP BY 1, 2
),
sym AS (
  SELECT user_id, s, n,
         CASE WHEN sv < {_Q261_BP[0]} * c THEN 'a'
              WHEN sv < {_Q261_BP[1]} * c THEN 'b'
              WHEN sv < {_Q261_BP[2]} * c THEN 'c'
              ELSE 'd' END AS y
  FROM seg
),
words AS (
  SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_points,
         STRING_AGG(y, '' ORDER BY s) AS sax_word
  FROM sym GROUP BY 1
)
SELECT user_id, n_points, sax_word,
       CAST(COUNT(*) OVER (PARTITION BY sax_word) AS BIGINT) AS n_users_same_word
FROM words ORDER BY user_id
"""


@register("q261_sax_motifs", _Q261_ORACLE)
def q261_sax_motifs(spark, sf_dir):
    from ..operators.sax import sax_words

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    words = sax_words(
        ev, "user_id", ["ts", "event_id"], "cents", _Q261_W, _Q261_BP,
    )
    return words.withColumn(
        "n_users_same_word",
        F.count("*").over(Window.partitionBy("sax_word")).cast("long"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q266 — interval coalescing (operators/intervals.coalesce_intervals):
# each event covers [t, t+300] seconds; overlapping/touching covers
# merge into per-user islands (uptime stitching / covered-time union —
# the complement of q252's concurrency count). One window + one
# groupBy, integer seconds throughout; the oracle replays the same
# running-max island recurrence.
# ---------------------------------------------------------------------------

_Q266_COVER_S = 300

_Q266_ORACLE = f"""
WITH iv AS (
  SELECT user_id, epoch_ns(ts) // 1000000000 AS s,
         epoch_ns(ts) // 1000000000 + {_Q266_COVER_S} AS e
  FROM events
),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS nw
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT user_id, CAST(island AS BIGINT) AS island_id,
       CAST(MIN(s) AS BIGINT) AS start, CAST(MAX(e) AS BIGINT) AS "end",
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM isl GROUP BY 1, 2
ORDER BY user_id, island_id
"""


@register("q266_interval_coalesce", _Q266_ORACLE)
def q266_interval_coalesce(spark, sf_dir):
    from ..operators.intervals import coalesce_intervals

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts div 1000000000").alias("s"),
        (F.expr("ts div 1000000000") + _Q266_COVER_S).alias("e"),
    )
    return coalesce_intervals(ev, "user_id", "s", "e").orderBy(
        "user_id", "island_id"
    )


# ---------------------------------------------------------------------------
# q286 — rolling OLS slope: per user, the trailing-10-event linear
# trend of spend (cents) against the event index — the windowed trend
# feature time-series models consume. All four moment sums are exact
# integers over ROWS frames; the slope is one pinned double division
# (the q84/q191 deterministic-OLS kernel in a window).
# ---------------------------------------------------------------------------

_Q286_W = 10

_Q286_ORACLE = f"""
WITH r AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS x
  FROM events
),
wsum AS (
  SELECT user_id, event_id, x,
         COUNT(*) OVER wf AS n,
         SUM(x) OVER wf AS sx,
         SUM(y) OVER wf AS sy,
         SUM(x * y) OVER wf AS sxy,
         SUM(x * x) OVER wf AS sxx
  FROM r
  WINDOW wf AS (PARTITION BY user_id ORDER BY x
                ROWS BETWEEN {_Q286_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, CAST(n AS BIGINT) AS n,
       ROUND(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) END, 9) AS slope_cents
FROM wsum
WHERE n >= 3
ORDER BY user_id, event_id
"""


@register("q286_rolling_ols_slope", _Q286_ORACLE)
def q286_rolling_ols_slope(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    r = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("y"),
    ).withColumn(
        "x",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long"),
    ).drop("ts")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-(_Q286_W - 1), 0)
    )
    wsum = r.select(
        "user_id",
        "event_id",
        F.count("*").over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wf).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        wsum.filter(F.col("n") >= 3)
        .select(
            "user_id",
            "event_id",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.when(den == 0, F.lit(0.0)).otherwise(
                    num.cast("double") / den.cast("double")
                ),
                9,
            ).alias("slope_cents"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# q305 — banded dynamic time warping between daily revenue series
# (operators/dtw): Sakoe-Chiba ASYMMETRIC step pattern, |i-j| <= 8
# band, integer |a-b| costs over dense per-event-type daily cent
# totals. The asymmetric pattern makes the DP a pure row recurrence,
# so the oracle replays the entire alignment as a recursive CTE
# carrying the previous DP row as a list — the kernel's answer is
# proven, not assumed (the q128 rule applied to time-series warping).
# ---------------------------------------------------------------------------

_Q305_R = 8


def _q305_oracle() -> str:
    from ..operators.dtw import sql_dtw_cte

    return f"""
WITH RECURSIVE ev AS (
  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS absday,
         CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT MIN(absday) AS d0, MAX(absday) AS d1 FROM ev),
daily AS (
  SELECT t, absday - b.d0 AS day, CAST(SUM(cents) AS BIGINT) AS v
  FROM ev CROSS JOIN bounds b GROUP BY 1, 2
),
grid AS (
  SELECT tt.t, g.day
  FROM (SELECT DISTINCT t FROM ev) tt CROSS JOIN bounds b
  CROSS JOIN LATERAL (SELECT unnest(range(0, b.d1 - b.d0 + 1)) AS day) g
),
dense AS (
  SELECT g.t, g.day, COALESCE(d.v, 0) AS v
  FROM grid g LEFT JOIN daily d ON d.t = g.t AND d.day = g.day
),
series AS (SELECT t, list(v ORDER BY day) AS arr FROM dense GROUP BY 1),
pairs AS (
  SELECT a.t AS key_a, b.t AS key_b, a.arr AS aa, b.arr AS bb
  FROM series a JOIN series b ON a.t < b.t
),
{sql_dtw_cte('pairs', 'len(aa)', _Q305_R)}
SELECT key_a, key_b, CAST(dtw_dist AS BIGINT) AS dtw_dist
FROM dtw ORDER BY key_a, key_b
"""


@register("q305_dtw_series", _q305_oracle())
def q305_dtw_series(spark, sf_dir):
    from ..operators.dtw import dtw_pairs

    ev = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.expr("(ts div 1000) div 86400000000").alias("absday"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    ev = ev.cache()  # feeds bounds, daily sums, and the type dimension
    bounds = ev.agg(
        F.min("absday").alias("d0"), F.max("absday").alias("d1")
    )
    daily = (
        ev.crossJoin(F.broadcast(bounds))
        .select("t", (F.col("absday") - F.col("d0")).alias("day"), "cents")
        .groupBy("t", "day")
        .agg(F.sum("cents").alias("v"))
    )
    grid = (
        ev.select("t")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "t",
            F.explode(
                F.sequence(F.lit(0), F.col("d1") - F.col("d0"))
            ).alias("day"),
        )
    )
    dense = grid.join(daily, ["t", "day"], "left").select(
        "t", "day", F.coalesce("v", F.lit(0)).alias("v")
    )
    series = dense.groupBy("t").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))),
            lambda s: s["v"],
        ).alias("arr")
    )
    pairs = (
        series.select(F.col("t").alias("key_a"), F.col("arr").alias("aa"))
        .join(
            series.select(F.col("t").alias("key_b"), F.col("arr").alias("bb")),
            F.col("key_a") < F.col("key_b"),
        )
    )
    return dtw_pairs(pairs, r=_Q305_R).orderBy("key_a", "key_b")


# ---------------------------------------------------------------------------
# q315 — dominant-period detection: a Goertzel periodogram (bins
# k=2..10 over the N-day grid) on each event type's daily cent totals,
# reporting the strongest frequency — the seasonality probe a
# monitoring pipeline runs before fitting seasonal models (q238). The
# per-(series, bin) sequential folds run in the q304 Arrow kernel with
# bin-specific 2cos(w) literals; the oracle replays every fold in a
# recursive CTE carrying the SAME literals. N is pinned to the data's
# day span at build time via the deterministic day grid.
# ---------------------------------------------------------------------------

_Q315_BINS = tuple(range(2, 11))
_Q315_N = 30  # events.parquet spans 30 days at every sf (TESTDATA.md)


def _q315_oracle() -> str:
    from ..operators.dsp import goertzel_coeff, sql_goertzel_multi_cte

    n = _Q315_N
    coeff_case = " ".join(
        f"WHEN {k} THEN {goertzel_coeff(k, n)!r}" for k in _Q315_BINS
    )
    bins_values = ", ".join(f"({k})" for k in _Q315_BINS)
    goe = sql_goertzel_multi_cte("samples")
    return f"""
WITH RECURSIVE ev AS (
  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS absday,
         CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT MIN(absday) AS d0 FROM ev),
daily AS (
  SELECT t, absday - b.d0 AS day, CAST(SUM(cents) AS BIGINT) AS v
  FROM ev CROSS JOIN bounds b GROUP BY 1, 2
),
grid AS (
  SELECT tt.t, g.day
  FROM (SELECT DISTINCT t FROM ev) tt
  CROSS JOIN (SELECT unnest(range(0, {n})) AS day) g
),
dense AS (
  SELECT g.t, g.day, COALESCE(d.v, 0) AS v
  FROM grid g LEFT JOIN daily d ON d.t = g.t AND d.day = g.day
),
samples AS (
  SELECT d.t || '|' || CAST(b.k AS VARCHAR) AS key,
         CASE b.k {coeff_case} END AS coeff,
         d.day AS n, CAST(d.v AS DOUBLE) AS x
  FROM dense d CROSS JOIN (VALUES {bins_values}) b(k)
),
{goe},
powers AS (
  SELECT split_part(key, '|', 1) AS t,
         CAST(split_part(key, '|', 2) AS INT) AS k,
         ROUND(LOG2(s1 * s1 + s2 * s2 - coeff * s1 * s2 + 1.0), 9) AS pwb
  FROM goem
),
best AS (
  SELECT t, k, pwb,
         ROW_NUMBER() OVER (PARTITION BY t ORDER BY pwb DESC, k) AS rn
  FROM powers
)
SELECT t AS event_type, k AS dominant_bin,
       ROUND(CAST({n} AS DOUBLE) / k, 6) AS period_days, pwb AS power_bits
FROM best WHERE rn = 1 ORDER BY event_type
"""


@register("q315_periodogram", _q315_oracle())
def q315_periodogram(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.dsp import audio_filterbank_powers

    n = _Q315_N
    ev = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.expr("(ts div 1000) div 86400000000").alias("absday"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    ev = ev.cache()  # bounds + daily + type dimension
    bounds = ev.agg(F.min("absday").alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(bounds))
        .select("t", (F.col("absday") - F.col("d0")).alias("day"), "cents")
        .groupBy("t", "day")
        .agg(F.sum("cents").alias("v"))
    )
    grid = (
        ev.select("t")
        .distinct()
        .select(
            "t", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("day")
        )
    )
    dense = grid.join(daily, ["t", "day"], "left").select(
        "t", "day", F.coalesce("v", F.lit(0)).alias("v")
    )
    bins = ", ".join(str(k) for k in _Q315_BINS)
    samples = dense.withColumn("k", F.explode(F.expr(f"array({bins})")))
    powers = audio_filterbank_powers(
        samples, ["t"], "v", "day", "k", n
    ).select(
        "t",
        "k",
        # log2 round-9: raw powers at 1e12 magnitude carry cross-engine
        # 1-ulp fold noise that ROUND(x, 6) cannot mask (the q304 rule)
        F.round(F.log2(F.col("power") + F.lit(1.0)), 9).alias("pwb"),
    )
    win = Window.partitionBy("t").orderBy(F.desc("pwb"), "k")
    return (
        powers.select("t", "k", "pwb", F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            F.col("t").alias("event_type"),
            F.col("k").alias("dominant_bin"),
            F.round(F.lit(float(n)) / F.col("k"), 6).alias("period_days"),
            F.col("pwb").alias("power_bits"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q324 — Croston intermittent-demand forecasting (operators/cusum.
# croston_per_key): per slow-moving part (5 pinned keys), smooth
# demand sizes and inter-demand intervals over demand days only —
# THE standard for sparse/lumpy series where Holt (q239) and seasonal
# models (q238) degenerate. Per-key Arrow fold; recursive-CTE oracle
# replays the identical IEEE recurrence (gate cost scales with series
# length, the q320 rule).
# ---------------------------------------------------------------------------

_Q324_ALPHA = 0.1
_Q324_PARTS = (1, 2, 3, 4, 5)


def _q324_oracle() -> str:
    from ..operators.cusum import sql_croston_per_key

    keys = ", ".join(str(k) for k in _Q324_PARTS)
    body = sql_croston_per_key(
        "demand", "part", "day", "q", _Q324_ALPHA
    )
    return f"""
WITH RECURSIVE demand AS (
  SELECT l_partkey AS part,
         CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS day,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem WHERE l_partkey IN ({keys})
  GROUP BY 1, 2
),
{body.split('WITH RECURSIVE', 1)[1]}
SELECT k AS part, CAST(n_demands AS BIGINT) AS n_demands,
       ROUND(z, 9) AS level, ROUND(p, 9) AS interval,
       ROUND(z / p, 9) AS forecast
FROM cr ORDER BY part
"""


@register("q324_croston_forecast", _q324_oracle())
def q324_croston_forecast(spark, sf_dir):
    from ..operators.cusum import croston_per_key

    demand = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey").isin(*_Q324_PARTS))
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
            ).alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    return croston_per_key(demand, "part", "day", "q", _Q324_ALPHA).orderBy(
        "part"
    )


# ---------------------------------------------------------------------------
# q367 — calendar-function surface (SQL-surface completion): month
# truncation, end-of-month, add_months with end-of-month clamping
# (Jan 31 + 1m -> Feb 28 on BOTH engines), ISO week-of-year and
# quarter extracts — the date algebra every partition-by-month 100 TB
# layout leans on. Grouped to months so the gate frame stays bounded.
# ---------------------------------------------------------------------------

_Q367_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
       CAST(EXTRACT(week FROM o_orderdate) AS INT) AS iso_week,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY 1, 2, 3, 4, 5
ORDER BY month_start, month_end, next_month, qtr, iso_week
"""


@register("q367_calendar_functions", _Q367_ORACLE)
def q367_calendar_functions(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    return (
        o.groupBy(
            F.trunc("d", "month").alias("month_start"),
            F.last_day("d").alias("month_end"),
            F.add_months("d", 1).alias("next_month"),
            F.quarter("d").cast("int").alias("qtr"),
            F.weekofyear("d").cast("int").alias("iso_week"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("month_start", "month_end", "next_month", "qtr", "iso_week")
    )
