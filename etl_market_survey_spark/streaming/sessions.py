"""Streaming session-window aggregation (built-in ``session_window``).

The batch gap-sessionization in operators/asof.sessionize has a native
Structured Streaming counterpart: ``F.session_window(event_time, gap)``
merges events into dynamic windows ``[min_ts, max_ts + gap)``, growing a
session while events keep arriving within ``gap`` of its end — per-key
state the engine maintains incrementally across micro-batches and (in
append mode) finalizes when the watermark passes a session's end.

Semantics pinned by the q119 gate + units: an event at exactly
``prev + gap`` still MERGES into the session (boundary-inclusive
extension, verified empirically on Spark 4.1) — a new session starts
only when ``ts - prev > gap``, so the oracle's island condition must
use strict ``>``.

Batch/stream parity: the same builder runs on a static frame (Spark
supports session_window in batch) and on the file-replay stream; the
drained complete-mode run, the batch run, and the DuckDB islands oracle
all agree bit-for-bit (value sums ride the exact-decimal kernel).

Scale shape: state per key is one (start, end, partial-agg) tuple per
OPEN session — closed sessions leave state at the watermark. The
shuffle is the groupBy(user) exchange only; session merging is local to
the key's state store. Skewed users cost state proportional to their
open sessions, not their event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import dsum
from .events import with_event_time


def session_rollup(
    df: DataFrame,
    key: str = "user_id",
    gap: str = "2 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Per (key, session): bounds, event count, exact value sum.

    ``watermark`` enables append-mode finalization on true streams;
    leave None for complete-mode drains and batch runs.
    """
    ev = with_event_time(df)
    if ev.isStreaming and watermark is not None:
        ev = ev.withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.session_window("event_time", gap).alias("sw"), F.col(key))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col(key),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )
