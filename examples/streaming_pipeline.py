"""Worked example — the streaming serving path end-to-end on replayed
event files, composing the engine's streaming modules the way a live
deployment runs them:

  1. file-source replay (one file per micro-batch)   (streaming/events)
  2. stream-static dimension enrichment              (streaming/enrich)
  3. watermarked tumbling rollup, drained availableNow — and the SAME
     rollup run in batch mode must agree bit-for-bit (the engine's
     batch/stream parity contract)
  4. CDC-shaped maintained view: the event feed drained through the
     bucketed IVM state with exactly-once versioning
                                                    (streaming/ivm_view)

Run: python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import uuid

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.streaming.enrich import enrich_stream
from etl_market_survey_spark.streaming.events import (
    read_event_stream,
    run_available_now,
    windowed_counts,
)


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    src = f"{sf_dir}/events.parquet"

    # 1+2: replay the feed, enrich each micro-batch against a user-tier dim
    dim = spark.createDataFrame(
        [(i, "gold" if i % 3 == 0 else "basic") for i in range(200)],
        "user_id long, tier string",
    )
    stream = read_event_stream(spark, src)
    enriched = enrich_stream(stream, dim, "user_id")

    # 3: watermarked rollup, streamed vs batch — must agree exactly
    name = f"rollup_{uuid.uuid4().hex[:8]}"
    run_available_now(windowed_counts(enriched), query_name=name)
    streamed = {
        (r.event_type, r.window_start): (r.n, r.sum_value)
        for r in spark.table(name).collect()
    }
    batch_df = enrich_stream(spark.read.parquet(src), dim, "user_id")
    from etl_market_survey_spark.sources.readers import ts_to_ns

    batched = {
        (r.event_type, r.window_start): (r.n, r.sum_value)
        for r in windowed_counts(ts_to_ns(batch_df)).collect()
    }
    assert streamed == batched, "batch/stream parity violated"

    # 4: maintained view — drain the feed into the bucketed IVM state
    from etl_market_survey_spark.streaming.ivm_view import (
        read_view,
        write_stream_ivm_view,
    )

    table = f"ex_view_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ex_ivm_ckpt_")
    deltas = read_event_stream(spark, src).select(
        "event_type", F.col("value").alias("x"), F.lit(1).alias("_sign")
    )
    q = write_stream_ivm_view(
        deltas, table, ckpt, keys=["event_type"], cols=["x"], sign_col="_sign",
    )
    q.awaitTermination()
    view = {r.event_type: r.n for r in read_view(spark, table, ["x"]).collect()}
    truth = {
        r.event_type: r.n
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert view == truth, (view, truth)

    print(f"windows={len(streamed)} view_groups={len(view)} parity=ok")
    return {"windows": len(streamed), "view_groups": len(view)}


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    out = main(get_spark(), *(sys.argv[1:] or []))
    print(out)
