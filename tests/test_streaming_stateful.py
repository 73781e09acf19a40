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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
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
