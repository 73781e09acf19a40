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

from .registry import register

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
