"""Stream-stream event-time interval join (beyond reference — the
reference is batch-only; this is the standard funnel/attribution shape a
streaming deployment of its event pipeline would need).

``event_interval_join`` matches each RIGHT event (e.g. purchase) to the
same-key LEFT events (e.g. click) in the preceding ``interval``. The one
definition serves batch and streaming frames identically — on streams
both sides get watermarks, and the event-time bound in the join condition
is what lets Spark's symmetric hash join EVICT state: a left row older
than (right watermark - interval) can never match again, so per-key state
is bounded by rate x interval, not by stream length. Without the time
bound the state grows forever — that is the failure mode this operator
exists to avoid at 100 TB/day.

Correctness gate: the batch run is SQL-expressible (q58, exact DuckDB
oracle); the streaming run drains via availableNow into a memory sink and
is compared to the SAME oracle (q59) — bit-for-bit, since all arithmetic
is integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .events import with_event_time


def event_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join right events to same-``key`` left events with
    ``left_time in (right_time - interval, right_time]``.

    Output: ``(right_id, left_id, <key>, delay_us)`` where ``delay_us`` =
    right µs - left µs (exact integers). Accepts static or streaming
    inputs; streaming inputs must carry the epoch-nano ``ts`` long that
    ``with_event_time`` expects.
    """
    l = with_event_time(left).select(
        F.col("event_id").alias("left_id"),
        F.col(key).alias("_lk"),
        F.col("event_time").alias("left_time"),
    )
    r = with_event_time(right).select(
        F.col("event_id").alias("right_id"),
        F.col(key).alias("_rk"),
        F.col("event_time").alias("right_time"),
    )
    if l.isStreaming:
        l = l.withWatermark("left_time", watermark)
    if r.isStreaming:
        r = r.withWatermark("right_time", watermark)
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("left_time") <= F.col("right_time"))
        & (F.col("left_time") > F.col("right_time") - F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond).select(
        "right_id",
        "left_id",
        F.col("_lk").alias(key),
        (F.unix_micros("right_time") - F.unix_micros("left_time")).alias("delay_us"),
    )


def event_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER variant of :func:`event_interval_join`: every left
    event appears — matched rows carry ``(right_id, delay_us)``,
    unmatched ones nulls. On streams this is the semantics that needs
    the watermark twice over: the time bound EVICTS state, and the
    watermark passing ``left_time + interval`` is what licenses the
    engine to EMIT the null row (the match can provably never arrive).
    A drained run therefore needs the watermark to advance past the
    data — q270 appends a far-future sentinel file for exactly that,
    the streaming analogue of closing the books.

    Output: ``(left_id, <key>, right_id, delay_us)`` — right side
    nullable."""
    l = with_event_time(left).select(
        F.col("event_id").alias("left_id"),
        F.col(key).alias("_lk"),
        F.col("event_time").alias("left_time"),
    )
    r = with_event_time(right).select(
        F.col("event_id").alias("right_id"),
        F.col(key).alias("_rk"),
        F.col("event_time").alias("right_time"),
    )
    if l.isStreaming:
        l = l.withWatermark("left_time", watermark)
    if r.isStreaming:
        r = r.withWatermark("right_time", watermark)
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (F.col("left_time") <= F.col("right_time"))
        & (F.col("left_time") > F.col("right_time") - F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, "leftOuter").select(
        "left_id",
        F.col("_lk").alias(key),
        "right_id",
        (F.unix_micros("right_time") - F.unix_micros("left_time")).alias("delay_us"),
    )
