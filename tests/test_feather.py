"""Distributed Feather / Arrow-IPC scan (VERDICT r9 item 5).

The reference's PRIMARY storage format is Feather (measurements.py:66-87)
and its datasets outgrow memory (clean_beta_scan.py:17,127 resorts to
out-of-core SQLite) — so the engine's Feather branch must scale past a
driver-side read: footer-read the IPC block list driver-side
(metadata-sized), fan record batches out as Spark tasks.
"""

import os

import pyarrow as pa
import pyarrow.feather as feather
import pytest

from etl_market_survey_spark.sources import readers


@pytest.fixture()
def multi_batch_fd(tmp_path):
    """A Feather v2 (Arrow IPC) file with 8 record batches, mixed types
    including a dictionary-encoded column (Feather's default for
    repeated strings)."""
    n = 800
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "v": pa.array([i * 0.5 for i in range(n)], pa.float64()),
            "s": pa.array([f"s{i % 7}" for i in range(n)]),
            "d": pa.array([f"g{i % 3}" for i in range(n)]).dictionary_encode(),
        }
    )
    p = str(tmp_path / "events.fd")
    feather.write_feather(t, p, chunksize=100)
    with pa.memory_map(p, "r") as mm:
        assert pa.ipc.open_file(mm).num_record_batches == 8
    return p


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestDistributedFeatherScan:
    def test_parity_with_driver_path_and_multi_task(
        self, spark, multi_batch_fd
    ):
        # force each path regardless of file size
        dist = readers.read_feather(spark, multi_batch_fd,
                                    distributed_bytes=0)
        drv = readers.read_feather(spark, multi_batch_fd,
                                   distributed_bytes=10**18)
        assert dist.rdd.getNumPartitions() > 1  # genuinely fanned out
        assert dist.schema == drv.schema
        assert _rows(dist) == _rows(drv)
        # dictionary column surfaced as its value type
        assert dict(dist.dtypes)["d"] == "string"

    def test_resolver_dispatches_above_threshold(
        self, spark, multi_batch_fd, tmp_path, monkeypatch
    ):
        monkeypatch.setattr(readers, "_FEATHER_DISTRIBUTED_BYTES", 0)
        df = readers.read_table(
            spark, os.path.dirname(multi_batch_fd), "events"
        )
        assert df.rdd.getNumPartitions() > 1
        assert df.count() == 800
        # tiny-file fast path still used below the (restored) threshold
        monkeypatch.setattr(
            readers, "_FEATHER_DISTRIBUTED_BYTES", 10**18
        )
        df2 = readers.read_table(
            spark, os.path.dirname(multi_batch_fd), "events"
        )
        assert _rows(df2) == _rows(df)

    def test_ns_timestamp_normalizes_to_epoch_nanos(self, spark, tmp_path):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        ts = [base + datetime.timedelta(microseconds=i) for i in range(300)]
        t = pa.table(
            {
                "k": pa.array(range(300), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("ns")),
            }
        )
        p = str(tmp_path / "ns.fd")
        feather.write_feather(t, p, chunksize=64)
        df = readers.read_feather(spark, p, distributed_bytes=0)
        assert dict(df.dtypes)["ts"] == "bigint"  # epoch-nano long
        got = {r["k"]: r["ts"] for r in df.collect()}
        epoch = datetime.datetime(1970, 1, 1)
        want = {
            i: int((ts[i] - epoch).total_seconds() * 1_000_000) * 1_000
            for i in range(300)
        }
        assert got == want

    def test_directory_lake_multi_file_parity(self, spark, tmp_path):
        lake = tmp_path / "lake"
        lake.mkdir()
        want = []
        for f in range(3):
            t = pa.table(
                {
                    "k": pa.array(range(f * 100, f * 100 + 100), pa.int64()),
                    "s": pa.array([f"f{f}_{i % 5}" for i in range(100)]),
                }
            )
            feather.write_feather(t, str(lake / f"part{f}.fd"), chunksize=40)
            want += list(zip(t.column("k").to_pylist(),
                             t.column("s").to_pylist()))
        dist = readers.read_feather(spark, str(lake), distributed_bytes=0)
        assert dist.rdd.getNumPartitions() > 1
        assert _rows(dist) == sorted(want)
        # glob form resolves identically
        g = readers.read_feather(spark, str(lake / "*.fd"),
                                 distributed_bytes=0)
        assert _rows(g) == sorted(want)
        # driver fast path agrees
        drv = readers.read_feather(spark, str(lake),
                                   distributed_bytes=10**18)
        assert _rows(drv) == sorted(want)

    def test_many_files_use_distributed_footer_pass(
        self, spark, tmp_path, monkeypatch
    ):
        """Past _FEATHER_FOOTER_DRIVER_FILES the batch-count discovery
        itself must run as Spark tasks — poison the driver-side counter
        to prove no footer is read on the driver."""
        lake = tmp_path / "biglake"
        lake.mkdir()
        n_files, per = 9, 30
        for f in range(n_files):
            t = pa.table(
                {"k": pa.array(range(f * per, f * per + per), pa.int64())}
            )
            feather.write_feather(t, str(lake / f"p{f:03d}.fd"),
                                  chunksize=10)
        monkeypatch.setattr(readers, "_FEATHER_FOOTER_DRIVER_FILES", 4)
        calls = []
        real = readers._ipc_batch_count
        monkeypatch.setattr(
            readers, "_ipc_batch_count",
            lambda p: calls.append(p) or real(p),
        )
        df = readers.read_feather(spark, str(lake), distributed_bytes=0)
        assert sorted(r["k"] for r in df.collect()) == list(
            range(n_files * per)
        )
        # driver read schema from file 0 only; counts came from tasks
        assert calls == []

    def test_mixed_v1_file_falls_back_whole_read(self, spark, tmp_path):
        lake = tmp_path / "mixed"
        lake.mkdir()
        feather.write_feather(
            pa.table({"k": pa.array([1, 2], pa.int64())}),
            str(lake / "a.fd"),
        )
        feather.write_feather(
            pa.table({"k": pa.array([3, 4], pa.int64())}),
            str(lake / "b.fd"), version=1,
        )
        df = readers.read_feather(spark, str(lake), distributed_bytes=0)
        assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 4]

    def test_feather_v1_falls_back_to_driver_path(self, spark, tmp_path):
        t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        p = str(tmp_path / "v1.fd")
        feather.write_feather(t, p, version=1)
        df = readers.read_feather(spark, p, distributed_bytes=0)
        assert sorted(r["k"] for r in df.collect()) == [1, 2, 3]

    def test_sink_roundtrip_task_parallel(self, spark, tmp_path):
        """write_feather: one IPC file per Spark partition, written
        inside the task (no driver funnel); the distributed reader
        scans the lake back bit-identically."""
        from etl_market_survey_spark.sources.writers import write_feather

        p = str(tmp_path / "sink_lake")
        df = (
            spark.range(1000)
            .selectExpr("id AS k", "id * 0.5 AS v",
                        "concat('s', id % 7) AS s")
            .repartition(4)
        )
        n_files = write_feather(df, p, max_chunksize=100)
        assert n_files == 4
        assert len([f for f in os.listdir(p) if f.endswith(".fd")]) == 4
        back = readers.read_feather(spark, p, distributed_bytes=0)
        assert back.rdd.getNumPartitions() > 1
        assert _rows(back) == _rows(df)
        # mode semantics
        with pytest.raises(FileExistsError):
            write_feather(df.limit(1), p, mode="error")
        write_feather(df.limit(10), p, mode="append")
        assert readers.read_feather(spark, p).count() == 1010
        write_feather(df.limit(10), p, mode="overwrite")
        assert readers.read_feather(spark, p).count() == 10

    def test_compressed_batches_decode_in_tasks(self, spark, tmp_path):
        t = pa.table(
            {
                "k": pa.array(range(500), pa.int64()),
                "s": pa.array(["x" * 50] * 500),
            }
        )
        p = str(tmp_path / "z.fd")
        feather.write_feather(t, p, chunksize=100, compression="zstd")
        df = readers.read_feather(spark, p, distributed_bytes=0)
        assert df.rdd.getNumPartitions() > 1
        assert df.count() == 500
        assert df.agg({"k": "sum"}).collect()[0][0] == sum(range(500))
