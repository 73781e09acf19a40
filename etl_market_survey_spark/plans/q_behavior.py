"""Behavioral / graph-traversal analytics batch (round 2).

q194 BFS min-hops (visited-pruned frontier vs unpruned recursive-CTE
oracle), q195 cumulative-distinct users, q196 retention cohorts, q197
Markov transitions, q208 Kaplan-Meier churn curves, q221 A/B z-test,
q222 frequent trigram sequences, q224 mixed-language audit, q225
language-classifier confusion.

All exact: integer counts, integer day/week arithmetic via epoch-µs
``div`` (both engines truncate nonnegative identically), round-9 libm
terms, and single double divisions where rates are emitted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import load, register

_US_DAY = 86_400_000_000

# ts is epoch-nanos (long) on the Spark side; µs-truncate to match
# DuckDB's µs-resolution timestamps
_EV_US = "(ts div 1000)"

# ---------------------------------------------------------------------------
# q194 — BFS min-hops from part 1 over the "shipped in the same order"
# part graph, ≤3 hops. Spark prunes with a visited anti-join per level
# (frontier cost stays proportional to NEW nodes); the oracle's
# recursive CTE walks unpruned and takes MIN(hop) — identical result.
# ---------------------------------------------------------------------------

_Q194_SOURCE = 1
_Q194_HOPS = 3

_Q194_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
bfs AS (
  SELECT CAST({_Q194_SOURCE} AS BIGINT) AS node, 0 AS hop
  UNION
  SELECT e.dst, b.hop + 1
  FROM bfs b JOIN edges e ON b.node = e.src
  WHERE b.hop < {_Q194_HOPS}
)
SELECT node, CAST(MIN(hop) AS INT) AS hops
FROM bfs GROUP BY 1 ORDER BY 1
"""


@register("q194_bfs_hops", _Q194_ORACLE)
def q194_bfs_hops(spark, sf_dir):
    from ..operators.bfs import bfs_hops

    li = load(spark, sf_dir, "lineitem")
    # co-order edges from per-order part SETS (one groupBy shuffle +
    # in-array pair expansion) instead of a fact self-join — ~2x faster,
    # same edge set. Safe because order width is bounded (<= ~13 parts);
    # a pathological thousand-line key would want the join form back.
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("_ps"))
    edges = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, x -> transform("
                    "filter(_ps, y -> y != x), y -> struct(x AS src, y AS dst))))"
                )
            ).alias("_p")
        )
        .select("_p.src", "_p.dst")
        .distinct()
    )
    # part node set is dims-sized: the per-level size gate picks
    # broadcast frontier/visited joins (one shuffle per level) here
    return bfs_hops(edges, _Q194_SOURCE, _Q194_HOPS).orderBy("node")


# ---------------------------------------------------------------------------
# q195 — daily active / new / cumulative-distinct users. Cumulative
# COUNT(DISTINCT) decomposes into "count users on their first day" +
# running sum — two small-key aggregations instead of a quadratic
# re-scan per day; the running sum windows over one row per day.
# ---------------------------------------------------------------------------

_Q195_ORACLE = f"""
WITH ud AS (
  SELECT user_id, epoch_us(ts) // {_US_DAY} AS day FROM events
),
active AS (
  SELECT day, COUNT(DISTINCT user_id) AS n_active FROM ud GROUP BY 1
),
first_day AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY 1),
news AS (SELECT day, COUNT(*) AS n_new FROM first_day GROUP BY 1)
SELECT a.day,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER (
         ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_users
FROM active a LEFT JOIN news n ON a.day = n.day
ORDER BY a.day
"""


@register("q195_cumulative_users", _Q195_ORACLE)
def q195_cumulative_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr(f"{_EV_US} div {_US_DAY}").alias("day")
    )
    active = ud.groupBy("day").agg(F.countDistinct("user_id").alias("n_active"))
    first_day = ud.groupBy("user_id").agg(F.min("day").alias("_fd"))
    news = first_day.groupBy(F.col("_fd").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    # DELIBERATE global window: it runs over the per-DAY aggregate, whose
    # cardinality is bounded by the calendar (~thousands of rows at any
    # corpus scale), not by the event count — the single-partition sort
    # is a no-op cost-wise. Row-level scans never see this window.
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(news, "day", "left")
        .select(
            "day",
            F.col("n_active").cast("long").alias("n_active"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("long"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q196 — weekly retention triangle: users bucketed by first-activity
# week, distinct-counted at each week offset. Two aggregations + one
# key join; the cohort dimension never leaves the cluster.
# ---------------------------------------------------------------------------

_Q196_ORACLE = f"""
WITH uw AS (
  SELECT DISTINCT user_id, (epoch_us(ts) // {_US_DAY}) // 7 AS week FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
SELECT c.cohort_week,
       CAST(u.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw u JOIN cohort c ON u.user_id = c.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("q196_retention_cohorts", _Q196_ORACLE)
def q196_retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr(f"({_EV_US} div {_US_DAY}) div 7").alias("week")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q197 — event-type Markov transition matrix from per-user lag pairs:
# one window pass (ordered by µs-truncated ts + event_id, the
# cross-engine-stable total order), integer pair counts, and one double
# division for the row-normalized probability.
# ---------------------------------------------------------------------------

_Q197_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type, COUNT(*) AS n_trans
  FROM ordered WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT prev_type, SUM(n_trans) AS n_from FROM pairs GROUP BY 1)
SELECT p.prev_type, p.event_type,
       CAST(p.n_trans AS BIGINT) AS n_trans,
       (CAST(p.n_trans AS DOUBLE) / CAST(t.n_from AS DOUBLE)) AS p_trans
FROM pairs p JOIN totals t ON p.prev_type = t.prev_type
ORDER BY 1, 2
"""


@register("q197_markov_transitions", _Q197_ORACLE)
def q197_markov_transitions(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr(_EV_US), "event_id")
    pairs = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_trans"))
    )
    totals = pairs.groupBy(F.col("prev_type").alias("_pt")).agg(
        F.sum("n_trans").alias("n_from")
    )
    return (
        pairs.join(F.broadcast(totals), pairs["prev_type"] == totals["_pt"])
        .select(
            "prev_type",
            "event_type",
            F.col("n_trans").cast("long").alias("n_trans"),
            (
                F.col("n_trans").cast("double") / F.col("n_from").cast("double")
            ).alias("p_trans"),
        )
        .orderBy("prev_type", "event_type")
    )


# ---------------------------------------------------------------------------
# q208 — Kaplan-Meier churn curves per first-event type: duration =
# active span in days, churn = no activity on the feed's final day
# (still-active users are right-censored; the synthetic feed is dense,
# so the horizon is tight). Risk sets from a reverse running
# sum; the product limit rides exp(Σ round-9 ln terms) with an exact
# decimal windowed sum — the libm discipline, survival edition.
# ---------------------------------------------------------------------------


def _q208_oracle() -> str:
    from ..operators.survival import sql_kaplan_meier

    users = f"""
  SELECT user_id,
         ARG_MIN(event_type,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
                 lpad(CAST(event_id AS VARCHAR), 12, '0')) AS first_type,
         (MAX(epoch_us(ts)) // {_US_DAY}) - (MIN(epoch_us(ts)) // {_US_DAY}) + 1
           AS dur,
         CASE WHEN MAX(epoch_us(ts)) // {_US_DAY} <=
                   (SELECT MAX(epoch_us(ts)) // {_US_DAY} FROM events) - 1
              THEN 1 ELSE 0 END AS churn
  FROM events GROUP BY 1
"""
    inner = sql_kaplan_meier(f"({users})", "first_type", "dur", "churn")
    return f"""
SELECT g AS first_type, dur, n_at_risk, d_events, log_surv, surv
FROM ({inner})
ORDER BY first_type, dur
"""


@register("q208_kaplan_meier", _q208_oracle())
def q208_kaplan_meier(spark, sf_dir):
    from ..operators.survival import kaplan_meier

    ev = load(spark, sf_dir, "events")
    day = F.expr(f"{_EV_US} div {_US_DAY}")
    users = ev.groupBy("user_id").agg(
        F.min_by(
            "event_type",
            F.concat(
                F.lpad(F.expr(_EV_US).cast("string"), 20, "0"),
                F.lit("|"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ),
        ).alias("first_type"),
        (F.max(day) - F.min(day) + 1).alias("dur"),
        F.max(day).alias("_last"),
    )
    horizon = ev.agg(F.max(day).alias("_max_day"))
    users = users.crossJoin(F.broadcast(horizon)).withColumn(
        "churn",
        F.when(F.col("_last") <= F.col("_max_day") - 1, 1).otherwise(0),
    )
    return kaplan_meier(users, ["first_type"], "dur", "churn").orderBy(
        "first_type", "dur"
    )


# ---------------------------------------------------------------------------
# q221 — A/B experiment readout: users deterministically hash-split
# into two arms (the md5 discipline — stable on any layout/engine),
# per-arm click-through rates, and the pooled two-proportion z-score
# (round-9 gated sqrt). The experimentation staple, end to end exact.
# ---------------------------------------------------------------------------

_Q221_ORACLE = """
WITH assign AS (
  SELECT user_id,
         CASE WHEN md5(concat_ws(chr(31), '17', CAST(user_id AS VARCHAR)))
                   < '80000000000000000000000000000000'
              THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id FROM events)
),
m AS (
  SELECT a.arm,
         COUNT(*) AS n_events,
         SUM(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks
  FROM events e JOIN assign a ON e.user_id = a.user_id
  GROUP BY 1
),
w AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN n_events END) AS na,
    MAX(CASE WHEN arm = 'A' THEN n_clicks END) AS ca,
    MAX(CASE WHEN arm = 'B' THEN n_events END) AS nb,
    MAX(CASE WHEN arm = 'B' THEN n_clicks END) AS cb
  FROM m
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS clicks_a,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS clicks_b,
       (CAST(ca AS DOUBLE) / na) AS rate_a,
       (CAST(cb AS DOUBLE) / nb) AS rate_b,
       ROUND(
         (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
         / SQRT((CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 / na + 1.0 / nb)),
         9) AS z_score
FROM w
"""


@register("q221_ab_test", _Q221_ORACLE)
def q221_ab_test(spark, sf_dir):
    from ..operators.sampling import _hash_rank

    ev = load(spark, sf_dir, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "arm",
            F.when(
                _hash_rank(["user_id"], 17)
                < "80000000000000000000000000000000",
                "A",
            ).otherwise("B"),
        )
    )
    m = (
        ev.join(F.broadcast(assign), "user_id")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "n_clicks"
            ),
        )
    )
    w = m.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_events"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_clicks"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_events"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_clicks"))).alias("cb"),
    )
    na, ca = F.col("na").cast("double"), F.col("ca").cast("double")
    nb, cb = F.col("nb").cast("double"), F.col("cb").cast("double")
    pooled = (ca + cb) / (na + nb)
    return w.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("clicks_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("clicks_b"),
        (ca / na).alias("rate_a"),
        (cb / nb).alias("rate_b"),
        F.round(
            (ca / na - cb / nb)
            / F.sqrt(
                pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
            ),
            9,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# q222 — frequent behavior sequences (PrefixSpan's contiguous-trigram
# core): per-user event-type trigrams from two lag passes, counted by
# occurrences AND by distinct supporting users, top-25 by support. The
# sequence-mining staple over any event log.
# ---------------------------------------------------------------------------

_Q222_TOP = 25

_Q222_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS prev1,
         LAG(event_type, 2) OVER w AS prev2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
tri AS (
  SELECT user_id, prev2 AS e1, prev1 AS e2, event_type AS e3
  FROM ordered WHERE prev2 IS NOT NULL
),
counts AS (
  SELECT e1, e2, e3,
         COUNT(*) AS n_occur,
         COUNT(DISTINCT user_id) AS n_users
  FROM tri GROUP BY 1, 2, 3
)
SELECT e1, e2, e3, CAST(n_occur AS BIGINT) AS n_occur,
       CAST(n_users AS BIGINT) AS n_users
FROM counts
ORDER BY n_users DESC, n_occur DESC, e1, e2, e3
LIMIT {_Q222_TOP}
"""


@register("q222_frequent_sequences", _Q222_ORACLE)
def q222_frequent_sequences(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr(_EV_US), "event_id")
    tri = (
        ev.select(
            "user_id",
            F.lag("event_type", 2).over(w).alias("e1"),
            F.lag("event_type", 1).over(w).alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .filter(F.col("e1").isNotNull())
    )
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(
            F.count("*").cast("long").alias("n_occur"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(
            F.col("n_users").desc(), F.col("n_occur").desc(), "e1", "e2", "e3"
        )
        .limit(_Q222_TOP)
    )


# ---------------------------------------------------------------------------
# q224 — mixed-language document audit: sentence segments re-run the
# stopword language ID individually; a document whose segments disagree
# (n_langs > 1, low dominant share) is flagged for curation review —
# the code-switch / boilerplate-contamination check multilingual
# corpora need. Integer counts + one division; the per-segment lang
# CASE replays the q22 heuristic parameterized on the segment.
# ---------------------------------------------------------------------------


def _q224_lang_case(expr: str) -> str:
    from ..functions.text import STOPWORDS, sql_stopword_hits

    hits = {lang: sql_stopword_hits(expr, lang) for lang in sorted(STOPWORDS)}
    mx = "GREATEST(" + ", ".join(hits.values()) + ")"
    return (
        f"CASE WHEN {mx} = 0 THEN 'und' "
        + " ".join(f"WHEN {hits[lang]} = {mx} THEN '{lang}'" for lang in sorted(STOPWORDS))
        + " END"
    )


def _q224_oracle() -> str:
    case = _q224_lang_case("seg")
    return f"""
WITH segs AS (
  SELECT doc_id, seg
  FROM (
    SELECT doc_id, unnest(string_split(text, '. ')) AS seg FROM documents
  ) WHERE seg <> ''
),
langs AS (SELECT doc_id, {case} AS lang FROM segs),
cnts AS (
  SELECT doc_id, lang, COUNT(*) AS n FROM langs WHERE lang <> 'und' GROUP BY 1, 2
),
dom AS (
  SELECT doc_id, lang AS dom_lang, n AS dom_n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) AS rn,
         SUM(n) OVER (PARTITION BY doc_id) AS n_classified,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_langs
  FROM cnts
),
base AS (SELECT doc_id, COUNT(*) AS n_segs FROM segs GROUP BY 1)
SELECT b.doc_id,
       CAST(b.n_segs AS BIGINT) AS n_segs,
       CAST(COALESCE(d.n_langs, 0) AS BIGINT) AS n_langs,
       d.dom_lang,
       (CAST(d.dom_n AS DOUBLE) / d.n_classified) AS dom_share
FROM base b LEFT JOIN (SELECT * FROM dom WHERE rn = 1) d ON b.doc_id = d.doc_id
ORDER BY b.doc_id
"""


@register("q224_mixed_language", _q224_oracle())
def q224_mixed_language(spark, sf_dir):
    from ..functions.text import detect_language

    docs = load(spark, sf_dir, "documents")
    segs = (
        docs.select(
            "doc_id", F.explode(F.split("text", "\\. ")).alias("seg")
        )
        .filter(F.col("seg") != "")
    )
    langs = segs.select("doc_id", detect_language("seg").alias("lang"))
    cnts = (
        langs.filter(F.col("lang") != "und")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n"))
    )
    wdoc = Window.partitionBy("doc_id")
    dom = (
        cnts.withColumn(
            "rn",
            F.row_number().over(wdoc.orderBy(F.col("n").desc(), "lang")),
        )
        .withColumn("n_classified", F.sum("n").over(wdoc))
        .withColumn("n_langs", F.count("*").over(wdoc))
        .filter(F.col("rn") == 1)
    )
    base = segs.groupBy("doc_id").agg(F.count("*").alias("n_segs"))
    return (
        base.join(dom, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_segs").cast("long").alias("n_segs"),
            F.coalesce("n_langs", F.lit(0)).cast("long").alias("n_langs"),
            F.col("lang").alias("dom_lang"),
            (F.col("n").cast("double") / F.col("n_classified")).alias("dom_share"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q225 — multi-class confusion matrix: the stopword language classifier
# scored against the table's labeled lang column, with per-true-class
# recall — the labeled-eval counterpart of the binary confusion q211.
# ---------------------------------------------------------------------------


def _q225_oracle() -> str:
    case = _q224_lang_case("text")
    return f"""
WITH pred AS (SELECT lang AS true_lang, {case} AS pred_lang FROM documents),
cells AS (
  SELECT true_lang, pred_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
),
tot AS (SELECT true_lang, SUM(n) AS n_true FROM cells GROUP BY 1)
SELECT c.true_lang, c.pred_lang,
       CAST(c.n AS BIGINT) AS n,
       (CAST(c.n AS DOUBLE) / t.n_true) AS frac_of_true
FROM cells c JOIN tot t ON c.true_lang = t.true_lang
ORDER BY 1, 2
"""


@register("q225_langid_confusion", _q225_oracle())
def q225_langid_confusion(spark, sf_dir):
    from ..functions.text import detect_language

    docs = load(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        detect_language("text").alias("pred_lang"),
    )
    cells = pred.groupBy("true_lang", "pred_lang").agg(F.count("*").alias("n"))
    tot = cells.groupBy(F.col("true_lang").alias("_tl")).agg(
        F.sum("n").alias("n_true")
    )
    return (
        cells.join(F.broadcast(tot), cells["true_lang"] == F.col("_tl"))
        .select(
            "true_lang",
            "pred_lang",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("n_true")).alias("frac_of_true"),
        )
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# q228 — feature-store point-in-time training join: purchase labels
# pick up each user's LATEST-AS-OF feature values (daily cumulative
# clicks, daily mean view value — each published at its day boundary)
# with no future leakage — the canonical leakage-free training-set
# assembly, as two chained as-of joins (operators/asof), gated against
# DuckDB's native ASOF LEFT JOIN.
# ---------------------------------------------------------------------------


def _q228_oracle() -> str:
    from ..functions.stats import sql_davg

    return f"""
WITH labels AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, epoch_us(ts) // {_US_DAY} AS day, COUNT(*) AS c
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
f1 AS (
  SELECT user_id, (day + 1) * {_US_DAY} AS t_us,
         CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS clicks_cum
  FROM clicks
),
f2 AS (
  SELECT user_id, (epoch_us(ts) // {_US_DAY} + 1) * {_US_DAY} AS t_us,
         {sql_davg("value")} AS view_mean
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT l.event_id, l.user_id, l.t_us,
       f1.clicks_cum AS clicks_cum_f1,
       f2.view_mean AS view_mean_f2
FROM labels l
ASOF LEFT JOIN f1 ON l.user_id = f1.user_id AND l.t_us >= f1.t_us
ASOF LEFT JOIN f2 ON l.user_id = f2.user_id AND l.t_us >= f2.t_us
ORDER BY l.event_id
"""


@register("q228_feature_store_join", _q228_oracle())
def q228_feature_store_join(spark, sf_dir):
    from ..functions.stats import davg
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    us = F.expr(_EV_US)
    day = F.expr(f"{_EV_US} div {_US_DAY}")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("t_us")
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", day.alias("day"))
        .agg(F.count("*").alias("c"))
        .select(
            "user_id",
            ((F.col("day") + 1) * _US_DAY).alias("t_us"),
            F.sum("c").over(wcum).cast("long").alias("clicks_cum"),
        )
    )
    f2 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", day.alias("day"))
        .agg(davg("value").alias("view_mean"))
        .select(
            "user_id", ((F.col("day") + 1) * _US_DAY).alias("t_us"), "view_mean"
        )
    )
    j1 = asof_join(
        labels, f1, on="t_us", by=["user_id"],
        value_cols=["clicks_cum"], suffix="_f1x",
    )
    j2 = asof_join(
        j1, f2, on="t_us", by=["user_id"],
        value_cols=["view_mean"], suffix="_f2x",
    )
    return j2.select(
        "event_id",
        "user_id",
        "t_us",
        F.col("clicks_cum_f1x").alias("clicks_cum_f1"),
        F.col("view_mean_f2x").alias("view_mean_f2"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q234 — weighted single-source shortest paths (distributed Bellman-
# Ford, operators/sssp) over the nation trade graph: directed edge
# cust_nation -> supp_nation per trading pair, integer weight derived
# from the pair's lineitem count (1 + cnt % 20). Distances are exact
# int64 sums, so the DuckDB oracle — a bounded-hop walk enumeration
# whose UNION-dedup state space is polynomial (V x maxdist x hops) —
# replays the relaxation fixed point bit-for-bit.
# ---------------------------------------------------------------------------


def _q234_oracle() -> str:
    from ..operators.sssp import sql_sssp

    return f"""
WITH RECURSIVE e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(1 + (COUNT(*) % 20) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
{sql_sssp('e', 0, 24)}
SELECT CAST(node AS BIGINT) AS node, dist FROM sssp_out ORDER BY node
"""


@register("q234_sssp", _q234_oracle())
def q234_sssp(spark, sf_dir):
    from ..operators.sssp import sssp

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .agg((F.lit(1) + F.count("*") % 20).cast("long").alias("w"))
    )
    return (
        sssp(edges, 0, "src", "dst", "w")
        .select(F.col("node").cast("long").alias("node"), "dist")
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# q246 — RFM customer segmentation (the marketing-analytics staple):
# per customer, Recency (days since last order at the corpus horizon),
# Frequency (order count) and Monetary (exact-decimal total spend),
# each quintile-scored with a deterministic total order (metric +
# custkey tiebreak), plus the classic "champion / loyal / at-risk /
# hibernating / other" rule labels. Pure integer/decimal arithmetic +
# ntile windows — both engines share the same quintile definition.
# ---------------------------------------------------------------------------

_Q246_ORACLE = """
WITH horizon AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
base AS (
  SELECT o.o_custkey AS custkey,
         CAST(date_diff('day', MAX(o.o_orderdate), h.maxd) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
           / 1000000.0 AS monetary
  FROM orders o CROSS JOIN horizon h
  GROUP BY o.o_custkey, h.maxd
),
scored AS (
  SELECT custkey, recency_days, frequency, monetary,
         CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey) AS INT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS INT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary DESC, custkey) AS INT) AS m_score
  FROM base
)
SELECT custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       CASE WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2 THEN 'champion'
            WHEN f_score <= 2 THEN 'loyal'
            WHEN r_score >= 4 AND m_score <= 2 THEN 'at_risk'
            WHEN r_score >= 4 THEN 'hibernating'
            ELSE 'other' END AS segment
FROM scored
ORDER BY custkey
"""


@register("q246_rfm_segmentation", _Q246_ORACLE)
def q246_rfm_segmentation(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..functions.stats import dsum

    orders = load(spark, sf_dir, "orders")
    horizon = orders.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        orders.crossJoin(F.broadcast(horizon))
        .groupBy(F.col("o_custkey").alias("custkey"), "maxd")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count("*").cast("long").alias("frequency"),
            dsum("o_totalprice").alias("monetary"),
        )
        .select(
            "custkey",
            F.datediff(F.col("maxd"), F.col("_last")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    # DELIBERATE global windows: they rank the per-CUSTOMER aggregate
    # (dimension-sized, not fact-sized); at true scale swap in
    # prefix.distributed_rank + ceil(rank*5/n) for the same quintiles.
    scored = (
        base.withColumn(
            "r_score",
            F.ntile(5).over(W.orderBy(F.asc("recency_days"), F.asc("custkey"))),
        )
        .withColumn(
            "f_score",
            F.ntile(5).over(W.orderBy(F.desc("frequency"), F.asc("custkey"))),
        )
        .withColumn(
            "m_score",
            F.ntile(5).over(W.orderBy(F.desc("monetary"), F.asc("custkey"))),
        )
    )
    seg = (
        F.when(
            (F.col("r_score") <= 2)
            & (F.col("f_score") <= 2)
            & (F.col("m_score") <= 2),
            "champion",
        )
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("m_score") <= 2), "at_risk")
        .when(F.col("r_score") >= 4, "hibernating")
        .otherwise("other")
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        seg.alias("segment"),
    ).orderBy("custkey")


# ---------------------------------------------------------------------------
# q247 — Markov-chain marketing attribution with removal effects
# (operators/attribution, Anderl et al. 2014): per-user journeys cut at
# the first purchase become a START -> touches -> CONV/NULL chain;
# transition probabilities are single divisions of integer counts, the
# absorption probabilities come from K-step value iteration on the
# exact 1e-12 floor grid (order-free integer sums), and every channel's
# removal effect re-runs the iteration with its inbound edges
# redirected to NULL. The oracle replays journeys, counts, and the full
# per-variant value iteration in one recursive CTE — the model-based
# attribution answer, bit-for-bit.
# ---------------------------------------------------------------------------


def _q247_oracle() -> str:
    from ..operators.attribution import K_STEPS

    grid = "1000000000000.0"
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
fc AS (
  SELECT user_id, MIN(rn) AS crn FROM ev WHERE event_type = 'purchase' GROUP BY 1
),
kept AS (
  SELECT e.user_id, e.event_type, e.rn, f.crn
  FROM ev e LEFT JOIN fc f USING (user_id)
  WHERE f.crn IS NULL OR e.rn <= f.crn
),
lagged AS (
  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS prev
  FROM kept
),
steps AS (
  SELECT COALESCE(prev, '__start__') AS src_state,
         CASE WHEN event_type = 'purchase' THEN '__conv__'
              ELSE event_type END AS dst_state
  FROM lagged
),
lasts AS (
  SELECT event_type AS src_state, '__null__' AS dst_state
  FROM (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS lrn FROM kept)
  WHERE crn IS NULL AND rn = lrn
),
cnt AS (
  SELECT src_state, dst_state, COUNT(*) AS n
  FROM (SELECT * FROM steps UNION ALL SELECT * FROM lasts)
  GROUP BY 1, 2
),
tot AS (SELECT src_state, SUM(n) AS t FROM cnt GROUP BY 1),
base_tr AS MATERIALIZED (
  SELECT c.src_state, c.dst_state, CAST(c.n AS DOUBLE) / t.t AS p
  FROM cnt c JOIN tot t USING (src_state)
  UNION ALL SELECT '__conv__', '__conv__', 1.0
  UNION ALL SELECT '__null__', '__null__', 1.0
),
channels AS MATERIALIZED (
  SELECT DISTINCT ch FROM (
    SELECT src_state AS ch FROM cnt UNION SELECT dst_state FROM cnt
  ) WHERE ch NOT IN ('__start__', '__conv__', '__null__')
),
variants AS MATERIALIZED (
  SELECT '__base__' AS variant, CAST(NULL AS VARCHAR) AS rc
  UNION ALL SELECT ch, ch FROM channels
),
trans AS MATERIALIZED (
  SELECT v.variant, b.src_state,
         CASE WHEN v.rc IS NOT NULL AND b.dst_state = v.rc
              THEN '__null__' ELSE b.dst_state END AS dst_state,
         SUM(b.p) AS p
  FROM variants v JOIN base_tr b ON v.rc IS NULL OR b.src_state <> v.rc
  GROUP BY 1, 2, 3
),
states AS (
  SELECT '__start__' AS s UNION SELECT '__conv__' UNION SELECT '__null__'
  UNION SELECT ch FROM channels
),
vstates AS MATERIALIZED (
  SELECT v.variant, st.s
  FROM variants v JOIN states st ON v.rc IS NULL OR st.s <> v.rc
),
vit(variant, k, state, v) AS (
  SELECT variant, 0, s,
         CAST(CASE WHEN s = '__conv__' THEN 1.0 ELSE 0.0 END AS DOUBLE)
  FROM vstates
  UNION ALL
  SELECT t.variant, r.k + 1, t.src_state,
         CAST(SUM(CAST(FLOOR(t.p * r.v * {grid}) AS DECIMAL(38,0))) AS DOUBLE)
           / {grid}
  FROM vit r JOIN trans t
    ON t.variant = r.variant AND t.dst_state = r.state
  WHERE r.k < {K_STEPS}
  GROUP BY t.variant, r.k, t.src_state
),
fin AS (
  SELECT variant, v FROM vit WHERE k = {K_STEPS} AND state = '__start__'
),
basep AS (SELECT v AS bp FROM fin WHERE variant = '__base__'),
eff AS (
  SELECT f.variant AS channel, b.bp, f.v AS rp, b.bp - f.v AS effect
  FROM fin f CROSS JOIN basep b WHERE f.variant <> '__base__'
),
tote AS (
  SELECT CASE WHEN SUM(CAST(FLOOR(effect * 1000000000.0) AS BIGINT)) = 0
              THEN 1
              ELSE SUM(CAST(FLOOR(effect * 1000000000.0) AS BIGINT)) END AS te
  FROM eff
)
SELECT channel, bp AS base_p, rp AS removed_p, effect AS removal_effect,
       CAST(CAST(FLOOR(effect * 1000000000.0) AS BIGINT) AS DOUBLE)
         / CAST(te AS DOUBLE) AS share
FROM eff CROSS JOIN tote
ORDER BY channel
"""


@register("q247_markov_attribution", _q247_oracle())
def q247_markov_attribution(spark, sf_dir):
    from ..operators.attribution import markov_attribution

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_id", "event_type"
    )
    return markov_attribution(
        ev, "user_id", ["us", "event_id"], "event_type", "purchase"
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# q288 — Nelson-Aalen cumulative hazard (operators/survival.
# nelson_aalen): the additive hazard view over the q208 churn cohort
# (duration = active-span days per user, churn = inactive on the final
# day). Every increment is (d * 1e9) div n — pure integer fixed-point,
# no float until display; the oracle replays the identical grid.
# ---------------------------------------------------------------------------


def _q288_oracle() -> str:
    from ..operators.survival import sql_nelson_aalen

    users = f"""
  SELECT user_id,
         ARG_MIN(event_type,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
                 lpad(CAST(event_id AS VARCHAR), 12, '0')) AS first_type,
         (MAX(epoch_us(ts)) // {_US_DAY}) - (MIN(epoch_us(ts)) // {_US_DAY}) + 1
           AS dur,
         CASE WHEN MAX(epoch_us(ts)) // {_US_DAY} <=
                   (SELECT MAX(epoch_us(ts)) // {_US_DAY} FROM events) - 1
              THEN 1 ELSE 0 END AS churn
  FROM events GROUP BY 1
"""
    inner = sql_nelson_aalen(f"({users})", "first_type", "dur", "churn")
    return f"""
SELECT g AS first_type, dur, n_at_risk, d_events, cum_hazard_g9, cum_hazard
FROM ({inner})
ORDER BY first_type, dur
"""


@register("q288_nelson_aalen", _q288_oracle())
def q288_nelson_aalen(spark, sf_dir):
    from ..operators.survival import nelson_aalen

    ev = load(spark, sf_dir, "events")
    day = F.expr(f"{_EV_US} div {_US_DAY}")
    users = ev.groupBy("user_id").agg(
        F.min_by(
            "event_type",
            F.concat(
                F.lpad(F.expr(_EV_US).cast("string"), 20, "0"),
                F.lit("|"),
                F.lpad(F.col("event_id").cast("string"), 12, "0"),
            ),
        ).alias("first_type"),
        (F.max(day) - F.min(day) + 1).alias("dur"),
    )
    horizon = ev.agg(F.max(day).alias("_h"))
    last_day = ev.groupBy("user_id").agg(F.max(day).alias("_last"))
    cohort = (
        users.join(last_day, "user_id")
        .crossJoin(F.broadcast(horizon))
        .withColumn(
            "churn",
            F.when(F.col("_last") <= F.col("_h") - 1, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    return nelson_aalen(cohort, ["first_type"], "dur", "churn").orderBy(
        "first_type", "dur"
    )


# ---------------------------------------------------------------------------
# q306 — Shapley-value channel attribution (Shapley 1953 as applied to
# marketing paths, e.g. Zhao et al. 2018): users' touched-channel SETS
# become 4-bit masks, v(S) = conversion rate of users with exactly that
# set (data-driven characteristic function), and each channel's credit
# is the exact Shapley sum over the 8 subsets not containing it with
# literal |S|!(n-|S|-1)!/n! weights. Everything after the one per-user
# aggregate is algebra over a 16-row mask table — the scale-correct
# shape (the fact table is touched once; Shapley runs on the bounded
# coalition lattice). Complements q247's Markov removal-effect model.
# ---------------------------------------------------------------------------

_Q306_CHANNELS = ("click", "error", "signup", "view")  # sorted; bit i


def _q306_oracle() -> str:
    n = len(_Q306_CHANNELS)
    bit_case = " ".join(
        f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(_Q306_CHANNELS)
    )
    # |S|! (n-|S|-1)! / n! for |S| = 0..3 with n = 4
    w_case = "CASE bit_count(s) WHEN 0 THEN 0.25 WHEN 1 THEN " \
        "0.08333333333333333 WHEN 2 THEN 0.08333333333333333 " \
        "WHEN 3 THEN 0.25 END"
    chan_rows = ", ".join(
        f"({i}, '{c}')" for i, c in enumerate(_Q306_CHANNELS)
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(DISTINCT CASE event_type {bit_case} ELSE 0 END) AS BIGINT)
           AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
mask_stats AS (
  SELECT mask, COUNT(*) AS users, SUM(conv) AS convs FROM per_user GROUP BY 1
),
lattice AS (
  SELECT g.m AS mask,
         COALESCE(CAST(ms.convs AS DOUBLE) / ms.users, 0.0) AS v
  FROM (SELECT unnest(range(0, {1 << n})) AS m) g
  LEFT JOIN mask_stats ms ON ms.mask = g.m
),
chans AS (SELECT * FROM (VALUES {chan_rows}) AS t(i, channel)),
terms AS (
  SELECT c.channel,
         ({w_case}) * (lw.v - lo.v) AS term
  FROM chans c
  JOIN (SELECT unnest(range(0, {1 << n})) AS s) sub
    ON (s & (1 << c.i)) = 0
  JOIN lattice lo ON lo.mask = sub.s
  JOIN lattice lw ON lw.mask = sub.s + (1 << c.i)
)
SELECT channel,
       ROUND(CAST(SUM(CAST(FLOOR(term * 1000000000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000000000.0, 9) AS shapley
FROM terms GROUP BY 1 ORDER BY channel
"""


@register("q306_shapley_attribution", _q306_oracle())
def q306_shapley_attribution(spark, sf_dir):
    n = len(_Q306_CHANNELS)
    bit = F.lit(0)
    for i, c in enumerate(_Q306_CHANNELS):
        bit = F.when(F.col("event_type") == c, F.lit(1 << i)).otherwise(bit)
    per_user = (
        load(spark, sf_dir, "events")
        .select("user_id", bit.alias("b"),
                (F.col("event_type") == "purchase").cast("int").alias("cv"))
        .groupBy("user_id")
        .agg(
            F.sum_distinct(F.col("b")).cast("long").alias("mask"),
            F.max("cv").alias("conv"),
        )
    )
    mask_stats = per_user.groupBy("mask").agg(
        F.count("*").alias("users"), F.sum("conv").alias("convs")
    )
    grid = spark.range(0, 1 << n).select(F.col("id").alias("m"))
    lattice = grid.join(
        F.broadcast(mask_stats), F.col("mask") == F.col("m"), "left"
    ).select(
        F.col("m").alias("mask"),
        F.coalesce(
            F.col("convs").cast("double") / F.col("users"), F.lit(0.0)
        ).alias("v"),
    )
    chans = spark.createDataFrame(
        [(i, c) for i, c in enumerate(_Q306_CHANNELS)], "i int, channel string"
    )
    subs = spark.range(0, 1 << n).select(F.col("id").alias("s"))
    w = (
        F.when(F.expr("bit_count(s)") == 0, F.lit(0.25))
        .when(F.expr("bit_count(s)") == 1, F.lit(0.08333333333333333))
        .when(F.expr("bit_count(s)") == 2, F.lit(0.08333333333333333))
        .when(F.expr("bit_count(s)") == 3, F.lit(0.25))
    )
    lo = lattice.select(F.col("mask").alias("lo_mask"), F.col("v").alias("lo_v"))
    lw = lattice.select(F.col("mask").alias("lw_mask"), F.col("v").alias("lw_v"))
    terms = (
        F.broadcast(chans)
        .join(subs, F.expr("(s & (1 << i)) = 0"))
        .join(F.broadcast(lo), F.col("lo_mask") == F.col("s"))
        .join(
            F.broadcast(lw),
            F.col("lw_mask") == F.expr("s + (1 << i)"),
        )
        .select("channel", (w * (F.col("lw_v") - F.col("lo_v"))).alias("term"))
    )
    return (
        terms.groupBy("channel")
        .agg(
            F.round(
                F.sum(
                    F.floor(F.col("term") * 1000000000000.0).cast("long")
                ).cast("double")
                / 1000000000000.0,
                9,
            ).alias("shapley")
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# q308 — Bradley-Terry preference strengths via Hunter's (2004) MM
# iterations — the pairwise-comparison model behind reward-model /
# ranking pipelines. Comparisons: per user, event_type a "beats" b
# when the user did a more often; n_ab aggregates wins. Three MM
# rounds w_i <- W_i / sum_j m_ij/(w_i+w_j) run as chained algebra over
# the 5-item table; every cross-item sum goes through a 1e-9
# integer-grid fold and every update is round-9 gated, so the float
# trajectory is engine-independent and the oracle replays it exactly.
# Scale shape: one per-(user, type) count, one per-user pair compare
# (bounded by the type dimension), then O(items^2) iteration algebra.
# ---------------------------------------------------------------------------

_Q308_ITER = 3


def _q308_oracle() -> str:
    it = """
w{k} AS (
  SELECT m.i,
         ROUND(MAX(wn.wins) /
           (CAST(SUM(CAST(FLOOR((m.m / (wa.wv + wb.wv)) * 1000000000.0)
                          AS BIGINT)) AS DOUBLE) / 1000000000.0), 9) AS wv
  FROM m
  JOIN w{j} wa ON wa.i = m.i
  JOIN w{j} wb ON wb.i = m.j
  JOIN wins wn ON wn.i = m.i
  GROUP BY m.i
)"""
    its = ",".join(
        it.format(k=k, j=k - 1) for k in range(1, _Q308_ITER + 1)
    )
    return f"""
WITH per_user AS (
  SELECT user_id, event_type AS t, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
duels AS (
  SELECT a.t AS i, b.t AS j, COUNT(*) AS n
  FROM per_user a JOIN per_user b
    ON a.user_id = b.user_id AND a.t <> b.t AND a.c > b.c
  GROUP BY 1, 2
),
m AS (
  SELECT i, j, CAST(SUM(n) AS DOUBLE) AS m FROM (
    SELECT i, j, n FROM duels
    UNION ALL SELECT j, i, n FROM duels
  ) GROUP BY 1, 2
),
wins AS (
  SELECT i, CAST(SUM(n) AS DOUBLE) AS wins FROM duels GROUP BY 1
),
w0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS wv FROM m),
{its},
tot AS (
  SELECT CAST(SUM(CAST(FLOOR(wv * 1000000000.0) AS BIGINT)) AS DOUBLE)
         / 1000000000.0 AS t
  FROM w{_Q308_ITER}
)
SELECT w.i AS event_type,
       CAST(wn.wins AS BIGINT) AS wins,
       ROUND(w.wv / tot.t, 9) AS strength
FROM w{_Q308_ITER} w JOIN wins wn ON wn.i = w.i CROSS JOIN tot
ORDER BY event_type
"""


@register("q308_bradley_terry", _q308_oracle())
def q308_bradley_terry(spark, sf_dir):
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.col("event_type").alias("t"))
        .agg(F.count("*").alias("c"))
    )
    per_user = per_user.cache()  # both sides of the duel self-join
    a = per_user.select(
        F.col("user_id").alias("u"), F.col("t").alias("i"), F.col("c").alias("ca")
    )
    b = per_user.select(
        F.col("user_id").alias("u"), F.col("t").alias("j"), F.col("c").alias("cb")
    )
    duels = (
        a.join(b, "u")
        .filter((F.col("i") != F.col("j")) & (F.col("ca") > F.col("cb")))
        .groupBy("i", "j")
        .agg(F.count("*").alias("n"))
    )
    duels = duels.cache()  # feeds m (twice), wins
    m = (
        duels.select("i", "j", "n")
        .unionByName(
            duels.select(
                F.col("j").alias("i"), F.col("i").alias("j"), "n"
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("n").cast("double").alias("m"))
    )
    m = m.cache()  # referenced every iteration
    wins = duels.groupBy("i").agg(F.sum("n").cast("double").alias("wins"))
    wins = wins.cache()
    w = m.select("i").distinct().select("i", F.lit(1.0).alias("wv"))
    for _ in range(_Q308_ITER):
        wa = w.select(F.col("i").alias("ai"), F.col("wv").alias("wva"))
        wb = w.select(F.col("i").alias("bi"), F.col("wv").alias("wvb"))
        w = (
            m.join(wa, F.col("ai") == F.col("i"))
            .join(wb, F.col("bi") == F.col("j"))
            .join(F.broadcast(wins), "i")
            .groupBy("i")
            .agg(
                F.round(
                    F.max("wins")
                    / (
                        F.sum(
                            F.floor(
                                (F.col("m") / (F.col("wva") + F.col("wvb")))
                                * 1000000000.0
                            ).cast("long")
                        ).cast("double")
                        / 1000000000.0
                    ),
                    9,
                ).alias("wv")
            )
        )
    tot = w.agg(
        (
            F.sum(F.floor(F.col("wv") * 1000000000.0).cast("long")).cast(
                "double"
            )
            / 1000000000.0
        ).alias("t")
    )
    return (
        w.join(F.broadcast(wins), "i")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("i").alias("event_type"),
            F.col("wins").cast("long").alias("wins"),
            F.round(F.col("wv") / F.col("t"), 9).alias("strength"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q339 — dialogue transcript assembly + turn validation (the SFT-prep
# step between raw logs and trainable conversations): each user's
# event stream becomes a transcript — turns ordered by (ts, event_id),
# roles alternating user/assistant from the turn index, each turn
# rendered "role: event_type(value_cents)" — with the validity checks
# a data pipeline enforces before training (starts with user, strict
# alternation by construction, minimum 4 turns). Output: per-thread
# turn count, md5 of the rendered transcript (pins every byte), and
# the keep flag. Order-stable string assembly, zero Python.
# ---------------------------------------------------------------------------

_Q339_MIN_TURNS = 4

_Q339_ORACLE = f"""
WITH turns AS (
  SELECT user_id AS thread_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_ns(ts), event_id) - 1 AS turn,
         event_type,
         CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
  FROM events
),
rendered AS (
  SELECT thread_id, turn,
         (CASE WHEN turn % 2 = 0 THEN 'user: ' ELSE 'assistant: ' END)
           || event_type || '(' || CAST(cents AS VARCHAR) || ')' AS line
  FROM turns
)
SELECT thread_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       md5(string_agg(line, chr(10) ORDER BY turn)) AS transcript_md5,
       COUNT(*) >= {_Q339_MIN_TURNS} AS keep
FROM rendered GROUP BY 1 ORDER BY thread_id
"""


@register("q339_dialogue_flatten", _Q339_ORACLE)
def q339_dialogue_flatten(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("thread_id"),
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("thread_id").orderBy("ts", "event_id")
    turns = ev.select(
        "thread_id",
        (F.row_number().over(w) - 1).alias("turn"),
        "event_type",
        "cents",
    )
    line = F.concat(
        F.when(F.col("turn") % 2 == 0, F.lit("user: ")).otherwise(
            F.lit("assistant: ")
        ),
        F.col("event_type"),
        F.lit("("),
        F.col("cents").cast("string"),
        F.lit(")"),
    )
    return (
        turns.select("thread_id", "turn", line.alias("line"))
        .groupBy("thread_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("turn", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                )
            ).alias("transcript_md5"),
            (F.count("*") >= _Q339_MIN_TURNS).alias("keep"),
        )
        .orderBy("thread_id")
    )


# ---------------------------------------------------------------------------
# q342 — token-bucket rate-limiter replay: simulate the standard
# (capacity 5, refill 1/60s) bucket over each user's event stream and
# report who would have been throttled — the abuse/quota audit an
# API-log pipeline runs offline. A true sequential recurrence:
# tokens = min(C, tokens + dt/60) then spend-or-reject per event —
# per-key Arrow fold (the Holt/CUSUM contract), recursive-CTE oracle
# replaying the identical IEEE arithmetic. Gated on users 0-14 (the
# oracle folds one row per step; the operator itself is all-key).
# ---------------------------------------------------------------------------

_Q342_CAP = "5.0"
_Q342_REFILL_S = "60.0"
_Q342_USERS = 15


def _q342_oracle() -> str:
    c, rf = _Q342_CAP, _Q342_REFILL_S
    return f"""
WITH RECURSIVE r AS (
  SELECT user_id AS k, epoch_ns(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_ns(ts), event_id) AS rn
  FROM events WHERE user_id < {_Q342_USERS}
),
p AS (
  SELECT k, rn, t, {c} - 1.0 AS tokens, 0 AS rejected
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.k, r.rn, r.t,
         CASE WHEN LEAST({c}, p.tokens
                         + (r.t - p.t) / 1000000000.0 / {rf}) >= 1.0
              THEN LEAST({c}, p.tokens
                         + (r.t - p.t) / 1000000000.0 / {rf}) - 1.0
              ELSE LEAST({c}, p.tokens
                         + (r.t - p.t) / 1000000000.0 / {rf}) END,
         CASE WHEN LEAST({c}, p.tokens
                         + (r.t - p.t) / 1000000000.0 / {rf}) >= 1.0
              THEN 0 ELSE 1 END
  FROM r JOIN p ON r.k = p.k AND r.rn = p.rn + 1
)
SELECT k AS user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(rejected) AS BIGINT) AS n_rejected,
       ROUND(MAX_BY(tokens, rn), 9) AS tokens_left
FROM p GROUP BY 1 ORDER BY user_id
"""


@register("q342_token_bucket", _q342_oracle())
def q342_token_bucket(spark, sf_dir):
    import pandas as pd

    cap = float(_Q342_CAP)
    rf = float(_Q342_REFILL_S)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < _Q342_USERS)
        .select("user_id", "ts", "event_id")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        tokens = cap - 1.0
        rejected = 0
        last = None
        for t in pdf["ts"].tolist():
            if last is None:
                last = t
                continue
            tokens = min(cap, tokens + (t - last) / 1000000000.0 / rf)
            if tokens >= 1.0:
                tokens = tokens - 1.0
            else:
                rejected += 1
            last = t
        return pd.DataFrame(
            [
                {
                    "user_id": pdf["user_id"].iloc[0],
                    "n_events": len(pdf),
                    "n_rejected": rejected,
                    "tokens_left": round(tokens, 9),
                }
            ]
        )

    # many small per-user groups: partition-level mapInPandas via
    # per_group_map (per-task overhead instead of per-key; same kernel)
    from ..operators.groupmap import per_group_map

    return per_group_map(
        ev,
        ["user_id"],
        "user_id long, n_events long, n_rejected long, tokens_left double",
        run,
        order_cols=("ts", "event_id"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q343 — bot detection by inter-event regularity: per user, the
# coefficient of variation of inter-event gaps (lag windows ->
# exact-decimal mean/std in MILLISECOND units, the dsum domain) — near-
# constant cadence (low CV) is the classic automation signature human
# traffic doesn't show. Flags CV < 0.3 with a minimum-events floor.
# Gaps are measured in SECONDS: the dstd sum-of-squares must stay
# under the dsum int64 ceiling (the q302 rule; ms-squared would not).
# ---------------------------------------------------------------------------

_Q343_CV_T = 0.3
_Q343_MIN_EVENTS = 20


def _q343_oracle() -> str:
    from ..functions.stats import sql_davg, sql_dstd

    return f"""
WITH gaps AS (
  SELECT user_id,
         CAST(epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
           AS DOUBLE) / 1000000000.0 AS gap_s
  FROM events
),
st AS (
  SELECT user_id, COUNT(gap_s) AS n_gaps,
         {sql_davg('gap_s')} AS mean_s, {sql_dstd('gap_s')} AS std_s
  FROM gaps WHERE gap_s IS NOT NULL GROUP BY 1
)
SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
       ROUND(mean_s, 6) AS mean_gap_s,
       ROUND(std_s / mean_s, 9) AS cv,
       (n_gaps >= {_Q343_MIN_EVENTS}
        AND std_s / mean_s < {_Q343_CV_T}) AS bot_flag
FROM st ORDER BY user_id
"""


@register("q343_bot_regularity", _q343_oracle())
def q343_bot_regularity(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.stats import davg, dstd

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = load(spark, sf_dir, "events").select(
        "user_id",
        (
            (F.col("ts") - F.lag("ts").over(w)).cast("double") / 1000000000.0
        ).alias("gap_s"),
    )
    st = (
        gaps.filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            davg("gap_s").alias("mean_s"),
            dstd("gap_s").alias("std_s"),
        )
    )
    return st.select(
        "user_id",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.round("mean_s", 6).alias("mean_gap_s"),
        F.round(F.col("std_s") / F.col("mean_s"), 9).alias("cv"),
        (
            (F.col("n_gaps") >= _Q343_MIN_EVENTS)
            & (F.col("std_s") / F.col("mean_s") < _Q343_CV_T)
        ).alias("bot_flag"),
    ).orderBy("user_id")
