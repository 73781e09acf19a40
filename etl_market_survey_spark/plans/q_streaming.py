"""Structured Streaming with an exact oracle.

q53_streaming_rollup runs a real streaming query (file-source replay of
the events table, watermarked tumbling-window aggregation, availableNow
trigger into a memory sink) and returns the drained result as a batch
DataFrame — so the DuckDB gate verifies STREAMING output bit-for-bit
against batch SQL. Window sums use the deterministic kernel; window
starts are returned as epoch microseconds (engine-portable).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from .registry import load, register

_Q53_ORACLE = """
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q53_streaming_rollup", _Q53_ORACLE)
def q53_streaming_rollup(spark, sf_dir):
    from ..streaming.events import read_event_stream, run_available_now, windowed_counts

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    name = run_available_now(
        windowed_counts(stream), f"q53_rollup_{uuid.uuid4().hex[:8]}"
    )
    drained = spark.table(name)
    return drained.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("window_start_us", "event_type")


# ---------------------------------------------------------------------------
# q58/q59 — event-time interval join (click -> purchase attribution).
# One operator definition; q58 runs it on batch frames (exact oracle),
# q59 runs the REAL stream-stream symmetric hash join with watermarks on
# both sides and drains it — against the same oracle, bit-for-bit.
# ---------------------------------------------------------------------------

_IJ_ORACLE = """
WITH c AS (
  SELECT event_id AS left_id, user_id, epoch_us(ts) AS cus
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS right_id, user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
)
SELECT p.right_id, c.left_id, p.user_id, p.pus - c.cus AS delay_us
FROM p JOIN c ON p.user_id = c.user_id
 AND c.cus <= p.pus AND c.cus > p.pus - 1800000000
ORDER BY right_id, left_id
"""


@register("q58_interval_join", _IJ_ORACLE)
def q58_interval_join(spark, sf_dir):
    from ..streaming.joins import event_interval_join
    from .registry import load

    ev = load(spark, sf_dir, "events")
    out = event_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id",
        interval="30 minutes",
    )
    return out.orderBy("right_id", "left_id")


@register("q59_streaming_interval_join", _IJ_ORACLE)
def q59_streaming_interval_join(spark, sf_dir):
    from ..streaming.events import read_event_stream, run_available_now
    from ..streaming.joins import event_interval_join

    clicks = read_event_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    joined = event_interval_join(
        clicks, purchases, key="user_id", interval="30 minutes"
    )
    name = run_available_now(
        joined, f"q59_ij_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    return spark.table(name).orderBy("right_id", "left_id")


# ---------------------------------------------------------------------------
# q63 — streaming dedup with watermark-bounded state. The event feed is
# projected so that rows sharing a dup_key are bit-identical (key-derived
# event time and payload): any first-arrival winner is the same row, which
# makes the drained streaming output EXACTLY "SELECT DISTINCT" — verified
# against DuckDB. The drain uses a delay longer than the replay span, so
# no state is evicted mid-drain; production sets delay = max duplicate lag
# and accepts re-emission beyond it (see streaming/dedup.py).
# ---------------------------------------------------------------------------

_Q63_ORACLE = """
WITH k AS (SELECT DISTINCT event_id % 4096 AS dup_key FROM events)
SELECT dup_key % 16 AS grp,
       COUNT(*) AS n_keys,
       CAST(SUM(dup_key) AS BIGINT) AS sum_key
FROM k GROUP BY 1 ORDER BY 1
"""


def _dedup_projection(df):
    # duplicates of a key are identical rows: time and payload derive
    # from the key itself
    key = F.pmod("event_id", F.lit(4096))
    return df.select(
        key.alias("dup_key"),
        # offset clear of epoch 0: the initial watermark is epoch 0 and
        # rows at-or-before the watermark are discarded as late
        F.timestamp_micros(
            (key * F.lit(60_000_000) + F.lit(1_000_000_000_000_000)).cast("long")
        ).alias("event_time"),
    )


@register("q63_streaming_dedup", _Q63_ORACLE)
def q63_streaming_dedup(spark, sf_dir):
    from ..streaming.dedup import dedup_within_watermark
    from ..streaming.events import read_event_stream, run_available_now

    stream = _dedup_projection(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    deduped = dedup_within_watermark(
        stream, ["dup_key"], "event_time", delay="3650 days"
    )
    name = run_available_now(
        deduped, f"q63_dedup_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    drained = spark.table(name)
    return (
        drained.groupBy(F.pmod("dup_key", F.lit(16)).alias("grp"))
        .agg(F.count("*").alias("n_keys"), F.sum("dup_key").alias("sum_key"))
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# q72 — stream-static enrichment join: the streaming event feed joins the
# static customer dimension (broadcast into every micro-batch; the dim is
# re-resolvable per batch, the standard slowly-changing-dim serving
# shape), then a running per-nation rollup drains in complete mode. The
# oracle replays it as a plain batch join+groupBy — bit-for-bit.
# ---------------------------------------------------------------------------

_Q72_ORACLE = """
SELECT c.c_nationkey AS nationkey,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


@register("q72_stream_static_join", _Q72_ORACLE)
def q72_stream_static_join(spark, sf_dir):
    from ..streaming.events import read_event_stream, run_available_now
    from .registry import load

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"], "inner"
    )
    rolled = (
        enriched.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 1000000.0).cast("decimal(38,0)")).cast("double")
                / 1000000.0
            ).alias("sum_value"),
        )
    )
    name = run_available_now(rolled, f"q72_ss_{uuid.uuid4().hex[:8]}")
    return spark.table(name).orderBy("nationkey")


# ---------------------------------------------------------------------------
# q91 — streaming weighted reservoir (A-ES over the event stream): per
# event type, keep the 5 highest-A-ES-key events by weight = value. The
# key is the same pure hash function as batch q88, so the drained
# reservoir is bit-identical to the batch draw and the DuckDB oracle
# replays it directly — an exact gate on a stateful streaming operator.
# ---------------------------------------------------------------------------

_Q91_K = 5
_Q91_SEED = 11


def _q91_oracle() -> str:
    from ..operators.sampling import sql_hash_rank, sql_weighted_key

    key = sql_weighted_key(["event_id"], "value", _Q91_SEED)
    tie = sql_hash_rank(["event_id"], _Q91_SEED)
    return f"""
WITH keyed AS (
  SELECT event_type, event_id, value, {key} AS es_key, {tie} AS tie
  FROM events WHERE value > 0
),
ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY es_key DESC, tie) AS rn
  FROM keyed
)
SELECT event_type AS grp, CAST(rn AS INT) AS rn,
       CAST(event_id AS VARCHAR) AS id, value AS weight
FROM ranked WHERE rn <= {_Q91_K} ORDER BY grp, rn
"""


@register("q91_streaming_reservoir", _q91_oracle())
def q91_streaming_reservoir(spark, sf_dir):
    from pyspark.sql.window import Window

    from ..streaming.events import read_event_stream, run_available_now
    from ..streaming.reservoir import weighted_reservoir_stream

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("value") > 0
    )
    res = weighted_reservoir_stream(
        stream, _Q91_K, "value", ["event_id"], seed=_Q91_SEED, by=["event_type"]
    )
    name = run_available_now(
        res, f"q91_reservoir_{uuid.uuid4().hex[:8]}", output_mode="update"
    )
    drained = spark.table(name)
    last = drained.withColumn(
        "_last", F.max("n_seen").over(Window.partitionBy("grp"))
    )
    return (
        last.filter(F.col("n_seen") == F.col("_last"))
        .select("grp", F.col("es_rank").cast("int").alias("rn"), "id", "weight")
        .orderBy("grp", "rn")
    )


# ---------------------------------------------------------------------------
# q95 — streaming CDC apply: the event feed maintains a keyed
# copy-on-write table (per (user, type): newest event wins by
# (us, event_id)) through batch-id-versioned snapshots. Because the
# merge is event-time-conditional (upsert_latest), the drained table is
# a pure function of the row set — so the oracle is one argmax window
# over the whole feed, whatever the micro-batch split was.
# ---------------------------------------------------------------------------

_Q95_ORACLE = """
WITH b AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id, value FROM events
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) AS rn
  FROM b
)
SELECT user_id, event_type, us, event_id, value
FROM r WHERE rn = 1 ORDER BY user_id, event_type
"""


@register("q95_streaming_cdc", _Q95_ORACLE)
def q95_streaming_cdc(spark, sf_dir):
    import tempfile

    from ..streaming.cdc import read_cdc_table, write_stream_cdc
    from ..streaming.events import read_event_stream

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("us"),
        "event_id", "value",
    )
    tmp = tempfile.mkdtemp(prefix="q95_cdc_")
    q = write_stream_cdc(
        stream, f"{tmp}/tbl", f"{tmp}/ckpt",
        keys=["user_id", "event_type"], order_cols=["us", "event_id"],
    )
    q.awaitTermination()
    return read_cdc_table(spark, f"{tmp}/tbl").orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# q106 — streaming KLL sketch feeding the exact quantile path: the
# event feed drains through the per-batch partial-sketch sink
# (streaming/quantiles, exactly-once by batch-id overwrite); the merged
# sketch then BRACKETS the target ranks for kll_exact_quantiles, whose
# counting pass makes the final values exact — so the gate is the same
# quantile_disc oracle as q102 even though the summary came from a
# stream. The sketch only prunes; stream vs batch origin cannot change
# a bit.
# ---------------------------------------------------------------------------

_Q106_ORACLE = """
SELECT quantile_disc(value, 0.50) AS p50,
       quantile_disc(value, 0.90) AS p90,
       CAST(COUNT(value) AS BIGINT) AS n
FROM events
"""


@register("q106_streaming_quantile", _Q106_ORACLE)
def q106_streaming_quantile(spark, sf_dir):
    import tempfile

    from ..operators.kll import kll_exact_quantiles
    from ..streaming.events import read_event_stream
    from ..streaming.quantiles import read_merged_sketch, write_stream_kll
    from .registry import load

    with tempfile.TemporaryDirectory() as tmp:
        stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
        q = write_stream_kll(
            stream.select("value"), "value", f"{tmp}/out", f"{tmp}/ckpt", k=512
        )
        q.awaitTermination()
        sk = read_merged_sketch(spark, f"{tmp}/out", k=512)
        batch = load(spark, sf_dir, "events")
        got = kll_exact_quantiles(batch, "value", [0.5, 0.9], k=512, sketch=sk)
    return spark.createDataFrame(
        [(got[0.5], got[0.9], sk.n)], "p50 double, p90 double, n bigint"
    )


# ---------------------------------------------------------------------------
# q119 — streaming session windows: the native session_window state
# machine (dynamic [min_ts, max_ts + gap) windows merged incrementally
# across micro-batches) drained in complete mode, vs the batch islands
# replay (lag > gap starts a session — the boundary-inclusive merge
# semantics the units pin) in DuckDB, with exact-decimal value sums.
# ---------------------------------------------------------------------------

_Q119_GAP = "2 hours"


def _q119_oracle() -> str:
    from ..functions.stats import sql_dsum

    return f"""
WITH d AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '{_Q119_GAP}'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '{_Q119_GAP}' AS session_end,
       COUNT(*) AS n,
       {sql_dsum('value')} AS sum_value
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@register("q119_streaming_sessions", _q119_oracle())
def q119_streaming_sessions(spark, sf_dir):
    from ..streaming.events import read_event_stream, run_available_now
    from ..streaming.sessions import session_rollup

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    sess = session_rollup(stream, gap=_Q119_GAP)
    name = run_available_now(
        sess, f"q119_sessions_{uuid.uuid4().hex[:8]}", output_mode="complete"
    )
    return spark.table(name).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# q124 — hopping (sliding) windows: the built-in window(ts, 6h, 2h)
# assigns each event to size/slide = 3 overlapping windows. The oracle
# replays the assignment arithmetically (window starts = floor(ts/slide)
# - k*slide for k in 0..2, epoch-aligned like Spark's windowing) with
# exact-decimal value sums. Batch here; the same expression is the
# streaming rollup shape of streaming/events.windowed_counts.
# ---------------------------------------------------------------------------

_Q124_SIZE_NS = 6 * 3600 * 10**9
_Q124_SLIDE_NS = 2 * 3600 * 10**9


def _q124_oracle() -> str:
    from ..functions.stats import sql_dsum

    return f"""
WITH assigned AS (
  SELECT make_timestamp(((epoch_ns(ts) // {_Q124_SLIDE_NS}) - k)
                        * {_Q124_SLIDE_NS} // 1000) AS window_start,
         event_type, value
  FROM events
  CROSS JOIN (SELECT unnest(range(0, {_Q124_SIZE_NS // _Q124_SLIDE_NS})) AS k)
)
SELECT window_start,
       window_start + INTERVAL '6 hours' AS window_end,
       event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS sum_value
FROM assigned
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


@register("q124_hopping_windows", _q124_oracle())
def q124_hopping_windows(spark, sf_dir):
    from ..functions.stats import dsum
    from ..streaming.events import with_event_time

    from .registry import load

    ev = with_event_time(load(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            F.window("event_time", "6 hours", "2 hours").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q139 — the full maintained-view story, end-to-end and EXACT: a signed
# CDC delta feed (inserts + corrections) drains through Structured
# Streaming into the bucketed IVM partial-state table (streaming/
# ivm_view: zero-exchange join-form refresh per micro-batch), and the
# finalized view must equal one signed GROUP BY over the whole feed —
# the oracle — bit-for-bit. Batch boundaries are whatever the file
# source produces; the decimal partial states make them unobservable.
# ---------------------------------------------------------------------------

_Q139_ORACLE = """
WITH d AS (
  SELECT l_returnflag, l_extendedprice AS price, 1 AS sign FROM lineitem
  UNION ALL
  SELECT l_returnflag, l_extendedprice, -1 FROM lineitem WHERE l_extendedprice < 2000.0
)
SELECT l_returnflag,
       CAST(SUM(sign) AS BIGINT) AS n,
       CAST(SUM(CAST(sign AS DECIMAL(38,0))
                * CAST(FLOOR(price * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
         / 1000000.0 AS sum_price,
       (CAST(SUM(CAST(sign AS DECIMAL(38,0))
                 * CAST(FLOOR(price * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
         / 1000000.0) / CAST(SUM(sign) AS BIGINT) AS avg_price
FROM d
GROUP BY 1
HAVING SUM(sign) <> 0
ORDER BY 1
"""


@register("q139_maintained_view", _Q139_ORACLE)
def q139_maintained_view(spark, sf_dir):
    import tempfile
    import uuid

    from ..streaming.ivm_view import (
        read_view,
        view_versions,
        write_stream_ivm_view,
    )

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    )
    delta = li.withColumn("sign", F.lit(1)).unionByName(
        li.filter(F.col("price") < 2000.0).withColumn("sign", F.lit(-1))
    )
    tmp = tempfile.mkdtemp(prefix="q139_mv_")
    delta.repartition(3).write.parquet(f"{tmp}/in")
    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    table = f"q139_view_{uuid.uuid4().hex[:8]}"
    q = write_stream_ivm_view(
        stream, table, f"{tmp}/ckpt",
        keys=["l_returnflag"], cols=["price"], n_buckets=8, sign_col="sign",
    )
    q.awaitTermination()
    view = read_view(spark, table, ["price"])
    if view is None:  # no batch committed (empty feed / replayed checkpoint)
        return spark.createDataFrame(
            [], "l_returnflag string, n bigint, sum_price double, avg_price double"
        )
    out = (
        view.select("l_returnflag", "n", "sum_price", "avg_price")
        .orderBy("l_returnflag")
        .localCheckpoint(eager=True)  # cut lineage so the tables can drop
    )
    for v in view_versions(spark, table):
        spark.sql(f"DROP TABLE IF EXISTS {table}_v{v}")
    return out


# ---------------------------------------------------------------------------
# q232 — exactly-once sink gate (VERDICT r2 item 5): the event feed
# drains through the idempotent batch-id-overwrite parquet sink, then
# every drained micro-batch is FORCIBLY REPLAYED through the same
# foreachBatch writer (same batch_id, different partitioning) — the
# at-least-once crash/retry case Structured Streaming's checkpoint
# contract allows. A plain append sink would double the table; the
# dynamic-partition overwrite must converge to the same rows, so the
# post-replay aggregate hash-matches the batch oracle over the raw
# events table bit-for-bit.
# ---------------------------------------------------------------------------

_Q232_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
         / 1000000.0 AS sum_value
FROM events GROUP BY 1 ORDER BY 1
"""


@register("q232_exactly_once_sink", _Q232_ORACLE)
def q232_exactly_once_sink(spark, sf_dir):
    import tempfile

    from ..functions.stats import dsum
    from ..streaming.events import read_event_stream
    from ..streaming.sinks import (
        idempotent_parquet_writer,
        write_stream_idempotent,
    )

    tmp = tempfile.mkdtemp(prefix="q232_sink_")
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    q = write_stream_idempotent(stream, f"{tmp}/out", f"{tmp}/ckpt")
    q.awaitTermination()

    # forced duplicate replay of every drained batch (same batch_id,
    # repartitioned -> different task layout); localCheckpoint pins the
    # replay rows before their source files are overwritten
    batches = [
        r["_batch_id"]
        for r in spark.read.parquet(f"{tmp}/out")
        .select("_batch_id")
        .distinct()
        .collect()
    ]
    for bid in batches:
        replay = (
            spark.read.parquet(f"{tmp}/out")
            .filter(F.col("_batch_id") == bid)
            .drop("_batch_id")
            .repartition(7)
            .localCheckpoint(eager=True)
        )
        idempotent_parquet_writer(f"{tmp}/out")(replay, bid)

    final = spark.read.parquet(f"{tmp}/out")
    return (
        final.groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q269/q270 — LEFT OUTER event-time interval join (streaming/joins.
# event_interval_join_outer): every click appears, with its qualifying
# purchase(s) or nulls. q269 runs the definition as a batch frame
# (plain LEFT JOIN oracle); q270 drains the STREAMING run — watermarks
# evict state AND license the null emissions, and a far-future sentinel
# file (processed last via maxFilesPerTrigger=1 + later mtime) advances
# the watermark past the data so the drained output is complete. Both
# hash against the same oracle.
# ---------------------------------------------------------------------------

_OJ_ORACLE = """
WITH c AS (
  SELECT event_id AS left_id, user_id, epoch_us(ts) AS cus
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS right_id, user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
)
SELECT c.left_id, c.user_id,
       p.right_id, p.pus - c.cus AS delay_us
FROM c LEFT JOIN p ON p.user_id = c.user_id
 AND c.cus <= p.pus AND c.cus > p.pus - 1800000000
ORDER BY left_id, right_id
"""


@register("q269_outer_interval_join", _OJ_ORACLE)
def q269_outer_interval_join(spark, sf_dir):
    from ..streaming.joins import event_interval_join_outer

    ev = load(spark, sf_dir, "events")
    out = event_interval_join_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id",
        interval="30 minutes",
    )
    return out.orderBy("left_id", "right_id")


@register("q270_streaming_outer_interval_join", _OJ_ORACLE)
def q270_streaming_outer_interval_join(spark, sf_dir):
    import hashlib
    import os
    import shutil

    from ..streaming.events import read_event_stream, run_available_now
    from ..streaming.joins import event_interval_join_outer

    # staging dir: the real feed + a far-future sentinel file whose later
    # mtime makes it the LAST micro-batch — it advances both watermarks
    # past every real row so all null emissions flush before the drain
    # ends; sentinel rows (negative ids) are filtered from the output
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    stage = f"/tmp/spark_graft_outerj_{tag}"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/a-events.parquet")

    ev = load(spark, sf_dir, "events")
    max_ns = ev.agg(F.max("ts")).collect()[0][0]
    sent_ns = max_ns + 24 * 3600 * 1_000_000_000  # 1 day past the data
    sent = spark.createDataFrame(
        [
            (-1, sent_ns, -1, "click", 0.0, ""),
            (-2, sent_ns, -1, "purchase", 0.0, ""),
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    # the sentinel file must carry ts in the SAME physical type as the
    # real feed (µs timestamp in current testdata, legacy long-ns
    # otherwise) — a mixed-type directory makes the stream reader drop
    # the sentinel rows and the watermark never passes the data
    raw_ts_type = spark.read.parquet(f"{sf_dir}/events.parquet").schema[
        "ts"
    ].dataType.simpleString()
    if raw_ts_type != "bigint":
        sent = sent.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast(raw_ts_type)
        )
    # SECOND sentinel, one batch later still: watermark updates commit at
    # the END of a batch, so null emissions licensed by sentinel #1's
    # update need one more batch to flush (the one-batch-behind rule)
    day = (
        F.lit(24 * 3600 * 1_000_000_000)
        if raw_ts_type == "bigint"
        else F.expr("INTERVAL 24 HOURS")
    )
    sent2 = sent.withColumn("ts", F.col("ts") + day) \
        .withColumn("event_id", F.col("event_id") - 10)

    def _write_flat(df, name, mtime):
        # the streaming file source lists only top-level files (no
        # recursion into .parquet output DIRECTORIES) — flatten the
        # single part file up and pin its mtime to fix batch order
        import glob as _glob

        tmp = f"{stage}/_tmp_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{stage}/{name}.parquet"
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (mtime, mtime))

    base_mtime = os.path.getmtime(f"{stage}/a-events.parquet")
    _write_flat(sent, "b-sentinel", base_mtime + 10)
    _write_flat(sent2, "c-sentinel", base_mtime + 20)

    def src():
        return read_event_stream(spark, stage)

    joined = event_interval_join_outer(
        src().filter(F.col("event_type") == "click"),
        src().filter(F.col("event_type") == "purchase"),
        key="user_id",
        interval="30 minutes",
    )
    name = run_available_now(
        joined, f"q270_oj_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    return (
        spark.table(name)
        .filter(F.col("left_id") >= 0)
        .orderBy("left_id", "right_id")
    )


# ---------------------------------------------------------------------------
# q318 — streaming trending top-k: the q53 watermarked windowed rollup
# drained through the memory sink, then ranked top-3 event types per
# hour window by (count DESC, type) — the live "trending" dashboard
# shape (windowed state stays bounded by the watermark; ranking is a
# post-drain batch step over the emitted windows, exactly how a serving
# layer consumes the sink). The oracle computes the same windows +
# rank from the raw table, so streaming emission order cannot matter.
# ---------------------------------------------------------------------------

_Q318_K = 3

_Q318_ORACLE = f"""
WITH w AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT window_start_us, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY window_start_us
                            ORDER BY n DESC, event_type) AS rnk
  FROM w
)
SELECT window_start_us, CAST(rnk AS INT) AS rnk, event_type, n
FROM rk WHERE rnk <= {_Q318_K}
ORDER BY window_start_us, rnk
"""


@register("q318_streaming_trending", _Q318_ORACLE)
def q318_streaming_trending(spark, sf_dir):
    from pyspark.sql import Window

    from ..streaming.events import (
        read_event_stream,
        run_available_now,
        windowed_counts,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    name = run_available_now(
        windowed_counts(stream), f"q318_trend_{uuid.uuid4().hex[:8]}"
    )
    drained = spark.table(name)
    win = Window.partitionBy("window_start").orderBy(
        F.desc("n"), "event_type"
    )
    return (
        drained.select(
            F.unix_micros("window_start").alias("window_start_us"),
            "event_type",
            "n",
            F.row_number().over(win).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= _Q318_K)
        .select("window_start_us", "rnk", "event_type", "n")
        .orderBy("window_start_us", "rnk")
    )


# ---------------------------------------------------------------------------
# q320 — streaming CUSUM drift alarms (streaming/stateful.
# streaming_cusum): the q158 Page recurrence as a CUSTOM STATEFUL
# operator — applyInPandasWithState carries (s, n, alarms) per
# event_type across micro-batches, folding rows in (ts, event_id)
# order. The drained per-key final state must equal the batch
# recursive-CTE replay of the identical IEEE fold — micro-batching is
# proven not to change a bit. Gated on the 'purchase' series alone:
# the recursive oracle folds one row per step, so its cost scales with
# the series length, not the operator's (the operator itself is keyed
# and runs all series at once).
# ---------------------------------------------------------------------------

_Q320_K = 5.0
_Q320_H = 50.0

_Q320_ORACLE = f"""
WITH RECURSIVE r AS (
  SELECT event_type AS k, epoch_ns(ts) AS t, event_id AS rid,
         CAST(value AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY epoch_ns(ts), event_id) AS rn
  FROM events WHERE event_type = 'purchase'
),
p AS (
  SELECT k, rn, GREATEST(0.0, x - {_Q320_K!r}) AS s
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.k, r.rn, GREATEST(0.0, p.s + (r.x - {_Q320_K!r}))
  FROM r JOIN p ON r.k = p.k AND r.rn = p.rn + 1
)
SELECT k AS event_type, CAST(COUNT(*) AS BIGINT) AS n_seen,
       MAX_BY(s, rn) AS cusum,
       CAST(SUM(CASE WHEN s > {_Q320_H!r} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms
FROM p GROUP BY 1 ORDER BY event_type
"""


@register("q320_streaming_cusum", _Q320_ORACLE)
def q320_streaming_cusum(spark, sf_dir):
    from pyspark.sql import Window

    from ..streaming.events import read_event_stream, run_available_now
    from ..streaming.stateful import streaming_cusum

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    out = streaming_cusum(
        stream, "event_type", "ts", "event_id", "value", _Q320_K, _Q320_H
    )
    name = run_available_now(
        out, f"q320_cusum_{uuid.uuid4().hex[:8]}", output_mode="update"
    )
    drained = spark.table(name)
    win = Window.partitionBy("key").orderBy(F.desc("n_seen"))
    return (
        drained.select(
            "key", "n_seen", "cusum", "n_alarms",
            F.row_number().over(win).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("key").alias("event_type"),
            "n_seen",
            "cusum",
            "n_alarms",
        )
        .orderBy("event_type")
    )
