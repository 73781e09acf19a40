"""Streaming KLL: drained merged sketch == batch sketch contract,
replay idempotence, and the stream->exact refinement handoff."""

import math

import numpy as np
import pytest

from etl_market_survey_spark.operators.kll import kll_exact_quantiles
from etl_market_survey_spark.streaming.quantiles import (
    kll_partial_writer,
    read_merged_sketch,
    write_stream_kll,
)


@pytest.fixture()
def stream_setup(spark, tmp_path):
    rng = np.random.default_rng(31)
    data = rng.lognormal(0, 1.5, 30_000)
    # three single-file micro-batches with pinned distinct mtimes
    import os

    for i, chunk in enumerate(np.array_split(data, 3)):
        out = tmp_path / "in" / f"{chr(97 + i)}.parquet"
        spark.createDataFrame([(float(v),) for v in chunk], "x double").coalesce(
            1
        ).write.parquet(str(out))
        mt = 1_600_000_000 + i * 600
        for p in out.rglob("*"):
            os.utime(p, (mt, mt))
        os.utime(out, (mt, mt))
    return data, str(tmp_path / "in" / "*"), str(tmp_path)


def test_drained_sketch_matches_batch(spark, stream_setup):
    data, in_glob, base = stream_setup
    stream = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_glob)
    )
    q = write_stream_kll(stream, "x", f"{base}/out", f"{base}/ckpt", k=256)
    q.awaitTermination()

    sk = read_merged_sketch(spark, f"{base}/out", k=256)
    assert sk.n == len(data)
    s = np.sort(data)
    slack = sk.rank_slack()
    for quant in (0.25, 0.5, 0.95):
        r = math.ceil(quant * sk.n)
        got = sk.quantile(quant)
        lo = int(np.searchsorted(s, got, side="left")) + 1
        hi = int(np.searchsorted(s, got, side="right"))
        assert lo - slack <= r <= max(lo, hi) + slack, quant


def test_replay_is_idempotent(spark, stream_setup):
    data, in_glob, base = stream_setup
    stream = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_glob)
    )
    q = write_stream_kll(stream, "x", f"{base}/out2", f"{base}/ckpt2", k=256)
    q.awaitTermination()
    before = read_merged_sketch(spark, f"{base}/out2", k=256)

    # crash-replay batch 0: re-deliver its own rows under the same id
    batch0 = spark.read.parquet(f"{base}/out2").filter("batch_id = 0")
    n0 = batch0.collect()[0]["n"]
    writer = kll_partial_writer(f"{base}/out2", "x", k=256)
    chunk = np.array_split(np.sort(data), 3)[0]  # any same-size payload
    replay_df = spark.createDataFrame([(float(v),) for v in chunk[:n0]], "x double")
    writer(replay_df, 0)

    after = read_merged_sketch(spark, f"{base}/out2", k=256)
    assert after.n == before.n  # overwritten, not double-counted


def test_stream_sketch_feeds_exact_path(spark, stream_setup):
    data, in_glob, base = stream_setup
    stream = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_glob)
    )
    q = write_stream_kll(stream, "x", f"{base}/out3", f"{base}/ckpt3", k=256)
    q.awaitTermination()
    sk = read_merged_sketch(spark, f"{base}/out3", k=256)

    batch = spark.read.schema("x double").parquet(in_glob)
    got = kll_exact_quantiles(batch, "x", [0.5, 0.9], k=256, sketch=sk)
    s = np.sort(data)
    for quant in (0.5, 0.9):
        r = max(1, math.ceil(quant * len(s)))
        assert got[quant] == float(s[r - 1]), quant
