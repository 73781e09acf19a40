"""Stateful streaming: running per-key stats accumulate across
micro-batches and match the batch aggregate after the drain."""

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.streaming.events import EVENT_SCHEMA
from etl_market_survey_spark.streaming.stateful import running_stats


def test_running_stats_matches_batch(spark, sf_dir, tmp_path):
    # split events into two files -> two micro-batches (maxFilesPerTrigger=1)
    from etl_market_survey_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(str(tmp_path / "in" / "a.parquet"))
    ev.filter(F.col("event_id") % 2 == 1).write.parquet(str(tmp_path / "in" / "b.parquet"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    q = (
        running_stats(stream)
        .writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    # last update per key == the batch aggregate over everything
    final = {
        r["key"]: (r["n"], r["total"], r["mx"])
        for r in spark.sql(
            """SELECT key, n, total, mx FROM (
                 SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) rn
                 FROM t_running) WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r["event_type"]: (r["n"], r["total"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][0] == batch[k][0]
        assert final[k][1] == pytest.approx(batch[k][1], rel=1e-9)
        assert final[k][2] == batch[k][2]


def test_stream_stream_interval_join_matches_batch(spark):
    """The watermarked symmetric-hash stream-stream join must emit exactly
    the batch join's rows, and its plan must carry the state-eviction
    machinery (watermarks on both sides, streaming join node)."""
    import uuid

    from etl_market_survey_spark.sources.readers import read_parquet
    from etl_market_survey_spark.streaming.events import (
        read_event_stream,
        run_available_now,
    )
    from etl_market_survey_spark.streaming.joins import event_interval_join

    path = "/root/testdata/sf0.001/events.parquet"
    ev = read_parquet(spark, path)
    batch = event_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        interval="30 minutes",
    )

    clicks = read_event_stream(spark, path).filter(F.col("event_type") == "click")
    purchases = read_event_stream(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    joined = event_interval_join(clicks, purchases, interval="30 minutes")
    assert joined.isStreaming
    name = run_available_now(
        joined, f"t_ij_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    streamed = spark.table(name)

    assert {tuple(r) for r in streamed.collect()} == {
        tuple(r) for r in batch.collect()
    }
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_dedup_within_watermark_eviction(spark, tmp_path):
    """Within-delay duplicates are suppressed; once the watermark passes
    key_time + delay the key's state is evicted and a later duplicate is
    re-emitted — the documented tradeoff of bounded state."""
    import pandas as pd

    from etl_market_survey_spark.streaming.dedup import dedup_within_watermark

    base = 1_000_000_000_000_000  # clear of the epoch-0 initial watermark
    minute = 60_000_000

    def write(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["k", "ts_us"])
        out = tmp_path / "in" / name
        # one part file per logical batch: under maxFilesPerTrigger=1 each
        # part FILE is a micro-batch, and same-mtime files order
        # arbitrarily — a multi-part write could process the
        # watermark-dragging row first and make key 1's rows late
        spark.createDataFrame(pdf).coalesce(1).write.parquet(str(out))
        # the file source orders batches by modification time; pin it so
        # same-millisecond writes cannot flip the intended batch order
        import os

        for p in out.rglob("*"):
            os.utime(p, (mtime, mtime))
        os.utime(out, (mtime, mtime))

    # batch 1: key 1 twice within a minute (dup suppressed)
    write("a.parquet", [(1, base), (1, base + minute)], 1_600_000_000)
    # batch 2: a far-ahead row drags the watermark past 1's eviction
    # time once this batch completes (the eviction watermark for batch N
    # is computed from batches < N)
    write("b.parquet", [(99, base + 500 * minute)], 1_600_000_600)
    # batch 3: runs with the advanced watermark -> key 1's state is
    # evicted at the END of this batch (rows are deduped against state
    # before eviction, so the re-arrival needs yet another batch); the
    # key-99 duplicate within delay is suppressed
    write("c.parquet", [(99, base + 501 * minute)], 1_600_001_200)
    # batch 4: key 1 again, after eviction -> state miss, re-emitted
    write("d.parquet", [(1, base + 495 * minute)], 1_600_001_800)

    stream = (
        spark.readStream.schema("k long, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
        .select("k", F.timestamp_micros("ts_us").alias("event_time"))
    )
    q = (
        dedup_within_watermark(stream, ["k"], "event_time", delay="10 minutes")
        .writeStream.format("memory")
        .queryName("t_dedup_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["k"], r["event_time"]) for r in spark.table("t_dedup_evict").collect()
    )
    ks = [k for k, _ in got]
    assert ks.count(1) == 2  # first arrival + post-eviction re-emission
    assert ks.count(99) == 1  # duplicate within delay suppressed


def test_idempotent_sink_replay_converges(spark, tmp_path):
    """A re-run of the same micro-batch (same batch_id) must overwrite its
    own output, not append a duplicate — and the drained sink equals the
    batch read of the source."""
    import pandas as pd

    from etl_market_survey_spark.streaming.sinks import (
        idempotent_parquet_writer,
        write_stream_idempotent,
    )

    rows_a = [(i, float(i)) for i in range(50)]
    rows_b = [(i, float(i)) for i in range(50, 80)]
    # coalesce(1): one file per logical batch (each part-FILE is its own
    # micro-batch under maxFilesPerTrigger=1)
    spark.createDataFrame(pd.DataFrame(rows_a, columns=["k", "v"])).coalesce(
        1
    ).write.parquet(str(tmp_path / "in" / "a.parquet"))
    spark.createDataFrame(pd.DataFrame(rows_b, columns=["k", "v"])).coalesce(
        1
    ).write.parquet(str(tmp_path / "in" / "b.parquet"))

    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = str(tmp_path / "out")
    q = write_stream_idempotent(stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == 80

    # simulate the crash-replay: re-deliver batch 0's own rows under the
    # same batch_id (ordering-agnostic: read them back from the sink)
    batch0 = got.filter(F.col("_batch_id") == 0).select("k", "v")
    writer = idempotent_parquet_writer(out)
    writer(batch0, 0)
    again = spark.read.parquet(out)
    assert again.count() == 80  # overwritten, not appended
    assert sorted(r["k"] for r in again.select("k").collect()) == list(range(80))
