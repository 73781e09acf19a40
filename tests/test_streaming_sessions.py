"""Session windows: half-open boundary semantics, batch/stream parity,
merge-across-micro-batch behavior."""

import os
import uuid

from etl_market_survey_spark.streaming.events import (
    read_event_stream,
    run_available_now,
)
from etl_market_survey_spark.streaming.sessions import session_rollup

NS = 1_000_000_000


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        [(i, ts * NS, u, "e", v, "") for i, (ts, u, v) in enumerate(rows)],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )


def test_exact_gap_boundary_merges(spark):
    # gap=10s; events at t=0 and t=10 — the second sits exactly at the
    # first session's end and MERGES (boundary-inclusive extension);
    # t=11 would start a new session
    df = _mk_batch(spark, [(0, 1, 1.0), (10, 1, 1.0)])
    out = session_rollup(df, gap="10 seconds").collect()
    assert len(out) == 1 and out[0].n == 2
    df_out = _mk_batch(spark, [(0, 1, 1.0), (11, 1, 1.0)])
    assert len(session_rollup(df_out, gap="10 seconds").collect()) == 2
    # one tick inside -> single merged session [0, 19.999.. + 10)
    df2 = _mk_batch(spark, [(0, 1, 1.0), (9, 1, 1.0), (18, 1, 1.0)])
    out2 = session_rollup(df2, gap="10 seconds").collect()
    assert len(out2) == 1 and out2[0].n == 3


def test_batch_stream_parity(spark, tmp_path):
    rows = []
    for u in (1, 2):
        t = 0
        for i in range(40):
            t += 3 if i % 7 else 20  # mixed gaps -> several sessions
            rows.append((t, u, float(i)))
    df = _mk_batch(spark, rows)
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n, r.sum_value)
        for r in session_rollup(df, gap="10 seconds").collect()
    }
    # write as several files -> several micro-batches (maxFilesPerTrigger=1)
    path = os.path.join(str(tmp_path), "events")
    df.repartition(5).write.parquet(path)
    stream = read_event_stream(spark, path)
    name = run_available_now(
        session_rollup(stream, gap="10 seconds"),
        f"sess_{uuid.uuid4().hex[:8]}",
        output_mode="complete",
    )
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n, r.sum_value)
        for r in spark.table(name).collect()
    }
    assert streamed == batch
