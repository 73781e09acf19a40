"""CDC table tests: merge semantics are batch-split-invariant, the
drained table equals the global per-key argmax, and a batch replay
converges (exactly-once)."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.merge import upsert_latest
from etl_market_survey_spark.streaming.cdc import (
    cdc_upsert_writer,
    read_cdc_table,
    table_versions,
    write_stream_cdc,
)
from etl_market_survey_spark.streaming.events import EVENT_SCHEMA

_SCHEMA = "k long, ts long, v string"


def test_upsert_latest_newer_wins_regardless_of_side(spark):
    base = spark.createDataFrame([(1, 10, "old"), (2, 50, "keep")], _SCHEMA)
    upd = spark.createDataFrame([(1, 20, "new"), (2, 40, "stale"), (3, 5, "ins")], _SCHEMA)
    got = {r.k: (r.ts, r.v) for r in upsert_latest(base, upd, ["k"], ["ts"]).collect()}
    assert got == {1: (20, "new"), 2: (50, "keep"), 3: (5, "ins")}


def test_upsert_latest_batch_split_invariant(spark):
    rows = [(1, t, f"v{t}") for t in (3, 1, 4, 1, 5, 9, 2, 6)]
    df = spark.createDataFrame(rows, _SCHEMA)
    all_at_once = upsert_latest(None, df, ["k"], ["ts", "v"]).collect()
    split = None
    for lo, hi in ((0, 3), (3, 5), (5, 8)):
        part = spark.createDataFrame(rows[lo:hi], _SCHEMA)
        split = upsert_latest(split, part, ["k"], ["ts", "v"])
    assert all_at_once == split.collect()


def test_drained_cdc_table_equals_global_argmax(spark, sf_dir, tmp_path):
    from etl_market_survey_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    for i, cond in enumerate(
        [F.col("event_id") % 3 == 0, F.col("event_id") % 3 == 1, F.col("event_id") % 3 == 2]
    ):
        ev.filter(cond).write.parquet(str(tmp_path / "in" / f"{i}.parquet"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
        .select("user_id", "event_type", "ts", "event_id", "value")
    )
    q = write_stream_cdc(
        stream,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        keys=["user_id", "event_type"],
        order_cols=["ts", "event_id"],
    )
    q.awaitTermination()
    assert len(table_versions(str(tmp_path / "tbl"))) == 3

    got = {
        (r.user_id, r.event_type): (r.ts, r.event_id)
        for r in read_cdc_table(spark, str(tmp_path / "tbl")).collect()
    }
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = {
        (r.user_id, r.event_type): (r.ts, r.event_id)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want


def test_replayed_batch_converges(spark, tmp_path):
    path = str(tmp_path / "tbl")
    writer = cdc_upsert_writer(spark, path, ["k"], ["ts"])
    b0 = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], _SCHEMA)
    b1 = spark.createDataFrame([(1, 20, "a2"), (3, 5, "c")], _SCHEMA)
    writer(b0, 0)
    writer(b1, 1)
    after_once = sorted(read_cdc_table(spark, path).collect())
    # crash/replay of batch 1: same batch id, same rows -> same table
    writer(b1, 1)
    assert sorted(read_cdc_table(spark, path).collect()) == after_once
    # replay must NOT have stacked an extra version
    assert table_versions(path) == [0, 1]


# --- partition-pruned COW ---------------------------------------------------

import os

from etl_market_survey_spark.streaming.cdc import (
    bucket_latest_dirs,
    cdc_upsert_writer_partitioned,
    read_cdc_table_partitioned,
)


def test_partitioned_cow_parity_and_pruning(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    flat = str(tmp_path / "ftbl")
    n_buckets = 8
    pw = cdc_upsert_writer_partitioned(spark, path, ["k"], ["ts"], n_buckets)
    fw = cdc_upsert_writer(spark, flat, ["k"], ["ts"])

    b0 = spark.createDataFrame(
        [(k, 10, f"v{k}") for k in range(20)], _SCHEMA
    )
    # batch 1 touches exactly one key -> at most one bucket rewritten
    b1 = spark.createDataFrame([(7, 20, "new7")], _SCHEMA)
    for w in (pw, fw):
        w(b0, 0)
        w(b1, 1)

    got = sorted(
        (r.k, r.ts, r.v) for r in read_cdc_table_partitioned(spark, path).collect()
    )
    want = sorted((r.k, r.ts, r.v) for r in read_cdc_table(spark, flat).collect())
    assert got == want

    # write economy: version 1 holds only key 7's bucket
    v1 = os.path.join(path, "_v=1")
    v1_buckets = [n for n in os.listdir(v1) if n.startswith("b=")]
    assert len(v1_buckets) == 1
    # overlay: latest map mixes versions (untouched buckets stay at v0)
    latest = bucket_latest_dirs(path)
    assert set(latest.values()) == {0, 1}


def test_partitioned_cow_replay_converges(spark, tmp_path):
    path = str(tmp_path / "ptbl2")
    pw = cdc_upsert_writer_partitioned(spark, path, ["k"], ["ts"], 4)
    b0 = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], _SCHEMA)
    b1 = spark.createDataFrame([(1, 20, "a2")], _SCHEMA)
    pw(b0, 0)
    pw(b1, 1)
    once = sorted(read_cdc_table_partitioned(spark, path).collect())
    pw(b1, 1)  # crash/replay
    assert sorted(read_cdc_table_partitioned(spark, path).collect()) == once


def test_compact_and_vacuum(spark, tmp_path):
    from etl_market_survey_spark.streaming.cdc import (
        compact_partitioned,
        vacuum_partitioned,
    )

    path = str(tmp_path / "ptbl3")
    pw = cdc_upsert_writer_partitioned(spark, path, ["k"], ["ts"], 4)
    pw(spark.createDataFrame([(k, 10, f"v{k}") for k in range(12)], _SCHEMA), 0)
    pw(spark.createDataFrame([(3, 20, "n3")], _SCHEMA), 1)
    pw(spark.createDataFrame([(5, 20, "n5")], _SCHEMA), 2)

    before = sorted(read_cdc_table_partitioned(spark, path).collect())
    new_v = compact_partitioned(spark, path, ["k"], 4)
    assert new_v == 3
    after = sorted(read_cdc_table_partitioned(spark, path).collect())
    assert after == before
    # every bucket now serves from the compacted snapshot
    assert set(bucket_latest_dirs(path).values()) == {new_v}

    removed = vacuum_partitioned(path)
    assert removed == [0, 1, 2]
    assert sorted(read_cdc_table_partitioned(spark, path).collect()) == before
