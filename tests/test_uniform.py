"""Delta -> Iceberg metadata mirror (sources/uniform): one data copy,
both formats read it; DV conversion; time travel across mirror points."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.sources.deltalog import (
    delete_rows_where,
    read_delta,
    write_delta,
)
from etl_market_survey_spark.sources.iceberg import (
    count_rows_iceberg,
    read_iceberg,
    snapshot_delete_files,
)
from etl_market_survey_spark.sources.uniform import mirror_to_iceberg


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("c"),
        (F.col("id") * 1.5).alias("v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "c", "v").collect())


class TestMirror:
    def test_mirror_appends_and_dv_deletes(self, spark, tmp_path):
        path = str(tmp_path / "t")
        write_delta(spark, path, _mk(spark, 0, 30).coalesce(2),
                    commit_ts=100)
        write_delta(spark, path, _mk(spark, 30, 50).coalesce(1),
                    mode="append", commit_ts=200)
        s1 = mirror_to_iceberg(spark, path, commit_ts=250)
        assert _rows(read_iceberg(spark, path)) \
            == _rows(read_delta(spark, path))
        assert count_rows_iceberg(spark, path) == 50

        # DV-route delete, then re-mirror: position deletes in the SAME
        # iceberg snapshot, merge-on-read state identical across formats
        delete_rows_where(spark, path, "k % 5 = 2", commit_ts=300)
        s2 = mirror_to_iceberg(spark, path, commit_ts=350)
        assert s2 != s1
        d = read_delta(spark, path)
        i = read_iceberg(spark, path)
        assert _rows(i) == _rows(d)
        assert d.count() == 40
        assert count_rows_iceberg(spark, path) == 40
        dels = snapshot_delete_files(path)
        assert dels and all(x.get("content") == 1 for x in dels)

        # iceberg time travel follows the mirror points
        assert read_iceberg(spark, path, snapshot_id=s1).count() == 50
        from etl_market_survey_spark.sources.iceberg import _load_metadata

        summaries = [
            s.get("summary", {})
            for s in _load_metadata(path).get("snapshots") or []
        ]
        assert {"1", "2"} <= {
            s.get("delta-mirror-version") for s in summaries
        }

    def test_mirror_guards(self, spark, tmp_path):
        p1 = str(tmp_path / "part")
        write_delta(spark, p1, _mk(spark, 0, 10), partition_col="c",
                    commit_ts=100)
        with pytest.raises(NotImplementedError, match="partitioned"):
            mirror_to_iceberg(spark, p1)

    def test_mirror_is_pure_metadata(self, spark, tmp_path):
        # Delta's per-file stats feed the Iceberg bounds directly —
        # poison every data file after commit: a mirror that still
        # succeeds cannot have scanned them
        import os as _os

        from etl_market_survey_spark.sources.iceberg import (
            snapshot_files,
        )

        path = str(tmp_path / "t3")
        write_delta(spark, path, _mk(spark, 0, 12), commit_ts=100)
        write_delta(spark, path, _mk(spark, 12, 20), mode="append",
                    commit_ts=150)
        for n in _os.listdir(path):
            if n.endswith(".parquet"):
                with open(_os.path.join(path, n), "w") as f:
                    f.write("")
        mirror_to_iceberg(spark, path, commit_ts=200)
        files = snapshot_files(path)
        assert len(files) == 2
        assert sum(f["record_count"] for f in files) == 20
        assert all(f.get("bounds_json") for f in files)
        assert count_rows_iceberg(spark, path) == 20

    def test_mirror_after_rewrite_delete(self, spark, tmp_path):
        # large-fraction delete takes the rewrite route (no DVs):
        # mirror is pure metadata, zero delete files
        path = str(tmp_path / "t2")
        write_delta(spark, path, _mk(spark, 0, 40).coalesce(2),
                    commit_ts=100)
        delete_rows_where(spark, path, "k < 30", commit_ts=200,
                          rewrite_fraction=0.01)
        mirror_to_iceberg(spark, path, commit_ts=300)
        assert _rows(read_iceberg(spark, path)) \
            == _rows(read_delta(spark, path))
        assert read_iceberg(spark, path).count() == 10
        assert snapshot_delete_files(path) == []


class TestReverseMirror:
    def test_iceberg_to_delta(self, spark, tmp_path):
        from etl_market_survey_spark.sources.deltalog import (
            count_rows_delta,
        )
        from etl_market_survey_spark.sources.iceberg import (
            delete_rows_where_iceberg,
            write_iceberg,
        )
        from etl_market_survey_spark.sources.uniform import (
            mirror_to_delta,
        )

        path = str(tmp_path / "it")
        write_iceberg(spark, path, _mk(spark, 0, 30), commit_ts=100)
        write_iceberg(spark, path, _mk(spark, 30, 50), mode="append",
                      commit_ts=200)
        mirror_to_delta(spark, path, commit_ts=250)
        assert _rows(read_delta(spark, path)) \
            == _rows(read_iceberg(spark, path))
        assert count_rows_delta(spark, path) == 50

        # position deletes -> deletion vectors
        delete_rows_where_iceberg(spark, path, "k % 5 = 2",
                                  commit_ts=300)
        mirror_to_delta(spark, path, commit_ts=350)
        assert _rows(read_delta(spark, path)) \
            == _rows(read_iceberg(spark, path))
        assert read_delta(spark, path).count() == 40
        # DV cardinality is in the descriptor: metadata-only count
        assert count_rows_delta(spark, path) == 40

    def test_equality_deletes_refused(self, spark, tmp_path):
        from etl_market_survey_spark.sources.iceberg import (
            delete_rows_equality,
            write_iceberg,
        )
        from etl_market_survey_spark.sources.uniform import (
            mirror_to_delta,
        )

        path = str(tmp_path / "eq")
        write_iceberg(spark, path, _mk(spark, 0, 10), commit_ts=100)
        delete_rows_equality(spark, path, [{"k": 3}], ["k"],
                             commit_ts=200)
        with pytest.raises(NotImplementedError, match="equality"):
            mirror_to_delta(spark, path)

    def test_full_round_trip(self, spark, tmp_path):
        # Delta -> (DV delete) -> Iceberg mirror -> Delta mirror:
        # the final Delta view reads DVs reconstructed from the
        # position deletes that were themselves converted from DVs
        from etl_market_survey_spark.sources.uniform import (
            mirror_to_delta,
        )

        path = str(tmp_path / "rt")
        write_delta(spark, path, _mk(spark, 0, 40).repartition(3, "k"),
                    commit_ts=100)
        delete_rows_where(spark, path, "k % 4 = 1", commit_ts=200)
        expected = _rows(read_delta(spark, path))
        mirror_to_iceberg(spark, path, commit_ts=300)
        v = mirror_to_delta(spark, path, commit_ts=400)
        assert _rows(read_delta(spark, path, version=v)) == expected
        assert _rows(read_iceberg(spark, path)) == expected


class TestIncrementalMirror:
    def test_append_only_mirrors_are_append_snapshots(self, spark, tmp_path):
        from etl_market_survey_spark.sources.iceberg import (
            _load_metadata,
            table_history,
        )

        path = str(tmp_path / "inc")
        write_delta(spark, path, _mk(spark, 0, 20), commit_ts=100)
        s1 = mirror_to_iceberg(spark, path, commit_ts=150)
        write_delta(spark, path, _mk(spark, 20, 30), mode="append",
                    commit_ts=200)
        s2 = mirror_to_iceberg(spark, path, commit_ts=250)
        assert s2 != s1
        ops = [h["operation"] for h in table_history(path)]
        assert ops[-1] == "append"  # incremental, not overwrite
        assert _rows(read_iceberg(spark, path)) \
            == _rows(read_delta(spark, path))
        # no-op mirror: nothing new -> same snapshot id, no new commit
        v_before = _load_metadata(path)["current-snapshot-id"]
        s3 = mirror_to_iceberg(spark, path, commit_ts=300)
        assert s3 == v_before
        assert _load_metadata(path)["current-snapshot-id"] == v_before

    def test_dv_change_falls_back_to_overwrite(self, spark, tmp_path):
        from etl_market_survey_spark.sources.iceberg import table_history

        path = str(tmp_path / "incdv")
        write_delta(spark, path, _mk(spark, 0, 30), commit_ts=100)
        mirror_to_iceberg(spark, path, commit_ts=150)
        delete_rows_where(spark, path, "k % 6 = 1", commit_ts=200)
        mirror_to_iceberg(spark, path, commit_ts=250)
        ops = [h["operation"] for h in table_history(path)]
        assert ops[-1] == "overwrite"
        assert _rows(read_iceberg(spark, path)) \
            == _rows(read_delta(spark, path))

    def test_stream_tails_mirror_points(self, spark, tmp_path):
        # the composition the incremental path exists for: Delta writes
        # -> append-mode mirrors -> the iceberg_lite STREAM source
        # tails the mirror snapshots exactly-once
        from etl_market_survey_spark.sources.pyds_iceberg import (
            IcebergLiteDataSource,
        )

        spark.dataSource.register(IcebergLiteDataSource)
        path, ckpt, sink = (
            str(tmp_path / n) for n in ("t", "c", "s")
        )
        write_delta(spark, path, _mk(spark, 0, 10), commit_ts=100)
        mirror_to_iceberg(spark, path, commit_ts=150)

        def drain():
            q = (
                spark.readStream.format("iceberg_lite").load(path)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        drain()
        assert sorted(
            r["k"] for r in spark.read.parquet(sink).collect()
        ) == list(range(10))
        write_delta(spark, path, _mk(spark, 10, 15), mode="append",
                    commit_ts=200)
        mirror_to_iceberg(spark, path, commit_ts=250)  # append snapshot
        drain()
        assert sorted(
            r["k"] for r in spark.read.parquet(sink).collect()
        ) == list(range(15))
