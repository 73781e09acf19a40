"""Stream-static enrichment: batch/stream parity, left-join gap
surfacing, broadcast plan."""

import uuid

from pyspark.sql import functions as F

from etl_market_survey_spark.streaming.enrich import enrich_stream
from etl_market_survey_spark.streaming.events import (
    read_event_stream,
    run_available_now,
)

NS = 1_000_000_000


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts * NS, u, "e", 1.0, "") for i, (ts, u) in enumerate(rows)],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    path = str(tmp_path / "events_in")
    df.write.parquet(path)
    return path


def test_stream_static_parity_and_gaps(spark, tmp_path):
    path = _write_events(spark, tmp_path, [(0, 1), (5, 2), (9, 7)])
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    stream = read_event_stream(spark, path)
    enriched = enrich_stream(stream, dim, "user_id")
    name = f"enriched_{uuid.uuid4().hex[:8]}"
    run_available_now(enriched, query_name=name, output_mode="append")
    got = {
        r.event_id: r.tier for r in spark.table(name).collect()
    }
    # batch parity
    batch = enrich_stream(spark.read.parquet(path), dim, "user_id")
    want = {r.event_id: r.tier for r in batch.collect()}
    assert got == want
    # unmatched stream rows survive with NULL tier (user 7 not in dim)
    assert got[2] is None and got[0] == "gold"


def test_enrichment_broadcasts_dim(spark, tmp_path):
    path = _write_events(spark, tmp_path, [(0, 1)])
    dim = spark.createDataFrame([(1, "x")], "user_id long, k string")
    batch = enrich_stream(spark.read.parquet(path), dim, "user_id")
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
