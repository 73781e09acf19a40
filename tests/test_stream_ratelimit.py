"""Admission control for the lakehouse stream sources
(maxVersionsPerTrigger / maxSnapshotsPerTrigger): each micro-batch
advances at most N commits, completeness and exactly-once preserved
across the batched drain."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.sources.deltalog import write_delta
from etl_market_survey_spark.sources.iceberg import write_iceberg
from etl_market_survey_spark.sources.pyds import DeltaLiteDataSource
from etl_market_survey_spark.sources.pyds_iceberg import (
    IcebergLiteDataSource,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaLiteDataSource)
    spark.dataSource.register(IcebergLiteDataSource)
    return spark


def _drain_batched(spark, fmt, path, ckpt, opts):
    """processAllAvailable drains in SUCCESSIVE rate-limited
    micro-batches; collect per-batch row counts via foreachBatch."""
    sizes = []

    def sink(df, _bid):
        sizes.append(df.count())

    reader = spark.readStream.format(fmt)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sizes


def _commits_delta(spark, path, n_commits, rows_per=5):
    for i in range(n_commits):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k")
        )
        write_delta(spark, path, df.coalesce(1), mode="append",
                    commit_ts=100 * (i + 1))


def _commits_iceberg(spark, path, n_commits, rows_per=5):
    for i in range(n_commits):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k")
        )
        write_iceberg(spark, path, df.coalesce(1), mode="append",
                      commit_ts=100 * (i + 1))


def test_delta_rate_limited_cold_start(registered, tmp_path):
    spark = registered
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    _commits_delta(spark, path, 6)
    sizes = _drain_batched(
        spark, "delta_lite", path, ckpt, {"maxVersionsPerTrigger": "2"}
    )
    # 6 pending versions, 2 per trigger -> 3 batches of 10 rows
    assert [s for s in sizes if s > 0] == [10, 10, 10]


def test_delta_unbounded_without_option(registered, tmp_path):
    spark = registered
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    _commits_delta(spark, path, 4)
    sizes = _drain_batched(spark, "delta_lite", path, ckpt, {})
    assert [s for s in sizes if s > 0] == [20]


def test_delta_steady_state_and_restart_exactly_once(registered, tmp_path):
    spark = registered
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    _commits_delta(spark, path, 3)
    opts = {"maxVersionsPerTrigger": "1"}
    sizes = _drain_batched(spark, "delta_lite", path, ckpt, opts)
    assert [s for s in sizes if s > 0] == [5, 5, 5]
    # new commits + RESTART from checkpoint: no dupes, no gaps (the
    # first post-restart trigger is allowed to be unbounded)
    _commits_delta(spark, path, 2)
    # two more version dirs appended after the first 3
    more = spark.range(100, 110).select(F.col("id").alias("k"))
    write_delta(spark, path, more.coalesce(1), mode="append",
                commit_ts=900)
    sizes2 = _drain_batched(spark, "delta_lite", path, ckpt, opts)
    assert sum(sizes2) == 10 + 10  # wait: 2 commits x5 + 10-row commit
    total = sum(sizes) + sum(sizes2)
    assert total == 3 * 5 + 2 * 5 + 10


def test_iceberg_rate_limited_cold_start(registered, tmp_path):
    spark = registered
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    _commits_iceberg(spark, path, 5)
    sizes = _drain_batched(
        spark, "iceberg_lite", path, ckpt,
        {"maxSnapshotsPerTrigger": "2"},
    )
    assert [s for s in sizes if s > 0] == [10, 10, 5]


def test_iceberg_unbounded_without_option(registered, tmp_path):
    spark = registered
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "c")
    _commits_iceberg(spark, path, 3)
    sizes = _drain_batched(spark, "iceberg_lite", path, ckpt, {})
    assert [s for s in sizes if s > 0] == [15]
