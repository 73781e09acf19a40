"""Metadata-only COUNT for both lakehouse formats: exact vs the scan
count across the verb matrix, and PROVEN metadata-only by poisoning the
data files after commit (a count that still answers cannot have read
them)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.sources.deltalog import (
    count_rows_delta,
    delete_rows_where,
    read_delta,
    write_delta,
)
from etl_market_survey_spark.sources.iceberg import (
    count_rows_iceberg,
    delete_rows_equality,
    delete_rows_where_iceberg,
    read_iceberg,
    set_ref,
    write_iceberg,
)


def _mk(spark, n=40):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("cat"),
        (F.col("id") * 3).alias("v"),
    )


def _poison_data_files(root):
    """Truncate every data parquet so any scan would explode."""
    for dirpath, _, names in os.walk(root):
        if "_delta_log" in dirpath or "metadata" in dirpath:
            continue
        for n in names:
            if n.endswith(".parquet") and "delete" not in n:
                with open(os.path.join(dirpath, n), "w") as f:
                    f.write("")


class TestDeltaCount:
    def test_appends_and_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = _mk(spark)
        write_delta(spark, root, df.filter("id < 25"), commit_ts=100)
        write_delta(spark, root, df.filter("id >= 25"), mode="append",
                    commit_ts=200)
        assert count_rows_delta(spark, root) == 40
        assert count_rows_delta(spark, root, version=0) == 25
        assert count_rows_delta(spark, root, timestamp=150) == 25

    def test_dv_delete_counts_without_scan(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_delta(spark, root, _mk(spark), commit_ts=100)
        # small fraction -> DV route (no rewrite)
        delete_rows_where(spark, root, "id % 10 = 0", commit_ts=200)
        expected = read_delta(spark, root).count()
        assert expected == 36
        _poison_data_files(root)
        # metadata-only: data files are now garbage, count still exact
        assert count_rows_delta(spark, root) == 36
        assert count_rows_delta(spark, root, version=0) == 40

    def test_rewrite_delete_counts(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_delta(spark, root, _mk(spark), commit_ts=100)
        # large fraction -> rewrite route (fresh stats, no DV)
        delete_rows_where(spark, root, "id < 30", commit_ts=200,
                          rewrite_fraction=0.01)
        assert count_rows_delta(spark, root) == 10


class TestIcebergCount:
    def test_appends_overwrite_and_ref(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = _mk(spark)
        write_iceberg(spark, root, df.filter("id < 25"), commit_ts=100)
        s2 = write_iceberg(spark, root, df.filter("id >= 25"),
                           mode="append", commit_ts=200)
        set_ref(root, "after_append", s2)
        write_iceberg(spark, root, df.filter("id < 10"), mode="overwrite",
                      commit_ts=300)
        _poison_data_files(root)
        assert count_rows_iceberg(spark, root) == 10
        assert count_rows_iceberg(spark, root, ref="after_append") == 40
        assert count_rows_iceberg(spark, root, as_of_ms=150) == 25
        with pytest.raises(ValueError, match="not both"):
            count_rows_iceberg(spark, root, ref="after_append", as_of_ms=1)

    def test_position_deletes_read_only_delete_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_iceberg(spark, root, _mk(spark), commit_ts=100)
        delete_rows_where_iceberg(spark, root, "id % 4 = 1", commit_ts=200)
        expected = read_iceberg(spark, root).count()
        assert expected == 30
        _poison_data_files(root)  # delete files untouched by the poison
        assert count_rows_iceberg(spark, root) == 30

    def test_equality_deletes_fall_back_to_scan(self, spark, tmp_path):
        root = str(tmp_path / "t")
        write_iceberg(spark, root, _mk(spark), commit_ts=100)
        delete_rows_equality(
            spark, root, [{"id": 3}, {"id": 7}, {"id": 999}], ["id"],
            commit_ts=200,
        )
        assert count_rows_iceberg(spark, root) == 38
        # append after the delete: reborn keys counted (seq scoping)
        write_iceberg(
            spark, root,
            _mk(spark).filter("id = 3"), mode="append", commit_ts=300,
        )
        assert count_rows_iceberg(spark, root) == 39
