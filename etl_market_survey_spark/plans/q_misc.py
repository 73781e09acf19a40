"""Coverage upgrades: operators previously unit-only, expressed as
oracle-checked queries.

q45_null_pair_drop — F6 null-pair dropper: synthesize nulls with nullif,
    keep only triggers where every device row is complete.
q46_ts_offset — X8 timestamp + per-row seconds offset (probe-station
    time reconstruction), in integer-microsecond arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.stats import dsum, sql_dsum
from ..operators.cuts import drop_incomplete_groups
from .registry import load, register

_Q45_ORACLE = """
WITH d AS (
  SELECT l_orderkey, l_linenumber,
         nullif(l_quantity, 1.0) AS q, l_extendedprice AS p
  FROM lineitem WHERE l_linenumber IN (1, 2)
),
flags AS (
  SELECT l_orderkey,
         COUNT(*) AS n_rows,
         COUNT(q) AS n_complete
  FROM d GROUP BY 1
)
SELECT d.l_orderkey, d.l_linenumber, d.q, d.p
FROM d JOIN flags USING (l_orderkey)
WHERE flags.n_complete = flags.n_rows
ORDER BY d.l_orderkey, d.l_linenumber, d.q, d.p
"""


@register("q45_null_pair_drop", _Q45_ORACLE)
def q45_null_pair_drop(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber").isin(1, 2))
    d = li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_quantity"), F.lit(1.0)).alias("q"),
        F.col("l_extendedprice").alias("p"),
    )
    out = drop_incomplete_groups(
        d, trigger_col="l_orderkey", device_col="l_linenumber", value_cols=["q"]
    )
    return out.orderBy("l_orderkey", "l_linenumber", "q", "p")


_Q46_ORACLE = """
SELECT event_id,
       epoch_us(ts) AS t0_us,
       epoch_us(ts + to_seconds(CAST(FLOOR(value) AS BIGINT))) AS t1_us
FROM events ORDER BY event_id
"""


@register("q46_ts_offset", _Q46_ORACLE)
def q46_ts_offset(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    t0 = F.expr("ts div 1000")
    return ev.select(
        "event_id",
        t0.alias("t0_us"),
        (t0 + F.floor(F.col("value")).cast("long") * F.lit(1_000_000)).alias("t1_us"),
    ).orderBy("event_id")


_Q54_ORACLE = """
WITH z AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings
)
SELECT e.vec_id,
       z.pos,
       ROUND(CAST(e.embedding[z.pos] AS DOUBLE), 6) AS component
FROM embeddings e JOIN z USING (vec_id)
WHERE e.vec_id < 3 AND z.pos <= 8
ORDER BY e.vec_id, z.pos
"""


@register("q54_zip_join", _Q54_ORACLE)
def q54_zip_join(spark, sf_dir):
    """J5 — zip join: pair each embedding component with its 1-based
    position via arrays_zip(sequence, vec) + explode (the distributed
    analogue of the reference's python zip())."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 3)
    zipped = emb.select(
        "vec_id",
        F.explode(
            F.arrays_zip(
                F.sequence(F.lit(1), F.size("embedding")).alias("pos"),
                F.transform("embedding", lambda x: x.cast("double")).alias("component"),
            )
        ).alias("z"),
    )
    return (
        zipped.select(
            "vec_id",
            F.col("z.pos").alias("pos"),
            F.round(F.col("z.component"), 6).alias("component"),
        )
        .filter(F.col("pos") <= 8)
        .orderBy("vec_id", "pos")
    )


@register("q47_waveform_features")
def q47_waveform_features(spark, sf_dir):
    """Waveform feature extraction (reconstructing FIXTURES §1 columns
    from §2-shaped samples). Waveform synthesized per returnflag: the
    price ECDF is a monotone rising curve, so t_k = the price at which it
    crosses k% — CFD crossing on a real dataset. Rows-only check: the
    oracle SQL would inline the entire operator (~100 lines of window +
    pivot SQL); correctness is pinned by analytic unit tests
    (tests/test_waveform.py: exact closed-form crossings on a ramp)."""
    from ..functions.stats import ecdf
    from ..operators.waveform import waveform_features

    li = load(spark, sf_dir, "lineitem")
    curve = ecdf(
        li.select("l_returnflag", "l_extendedprice"), ["l_returnflag"], "l_extendedprice",
        out="y",
    ).select(
        F.lit(0).alias("n_trigger"),
        F.col("l_returnflag").alias("device_name"),
        F.col("l_extendedprice").alias("Time (s)"),
        F.col("y").alias("Amplitude (V)"),
    ).distinct()
    return waveform_features(curve, baseline_end=1.0).orderBy("device_name")


_Q62_ORACLE = f"""
SELECT l.l_returnflag,
       COUNT(*) AS n_rows,
       {sql_dsum('l.l_quantity')} AS sum_qty,
       {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS sum_disc_price
FROM lineitem l
WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register("q62_bloom_semi_join", _Q62_ORACLE)
def q62_bloom_semi_join(spark, sf_dir):
    """Bloom-pruned semi-join: filter the fact by the urgent-order key
    set, then aggregate. The bloom (distributed xxhash64/bit_or build,
    Arrow-vectorized probe) drops ~(1-fpp) of non-matching fact rows at
    the SCAN, so only ~sel+fpp of the fact reaches the semi-join
    shuffle; the trailing left-semi join kills bloom false positives,
    making the result bit-equal to a plain IN-subquery."""
    from ..operators.bloom import bloom_semi_join

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    matched = bloom_semi_join(li, urgent, "l_orderkey", fpp=0.01, seed=42)
    return (
        matched.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            dsum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
        )
        .orderBy("l_returnflag")
    )
