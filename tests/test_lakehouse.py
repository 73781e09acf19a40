"""Lakehouse snapshot protocol (sources/lakehouse): immutability, time
travel, manifest pruning, history. The content-correctness of every
read path is gated end-to-end by q257; these units pin the file-level
mechanics the hash gate can't see."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.sources.lakehouse import (
    commit_snapshot,
    read_snapshot,
    table_history,
)

PATH = "/tmp/spark_graft_lakehouse_unit"
PATH_RO = "/tmp/spark_graft_lakehouse_unit_ro"


def _build(spark, path):
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 10.0) for i in range(20)], "k long, p string, x double"
    )
    commit_snapshot(
        spark, path, df.filter(F.col("k") < 10),
        operation="append", partition_col="p", commit_ts=100, stat_cols=["k"],
    )
    commit_snapshot(
        spark, path, df.filter(F.col("k") >= 10),
        operation="append", partition_col="p", commit_ts=200, stat_cols=["k"],
    )
    commit_snapshot(
        spark, path, None,
        operation="delete", delete_partition_values=["a"], commit_ts=300,
    )
    return path


@pytest.fixture()
def table(spark):
    """Fresh per-test table — for tests that ADD commits."""
    yield _build(spark, PATH)
    shutil.rmtree(PATH, ignore_errors=True)


@pytest.fixture(scope="module")
def table_ro(spark):
    """Shared 3-commit table for read-only tests (the 3-commit build
    costs ~4s per test otherwise); separate path so mutating tests
    can't clobber it."""
    yield _build(spark, PATH_RO)
    shutil.rmtree(PATH_RO, ignore_errors=True)


def test_time_travel_versions(spark, table_ro):
    assert read_snapshot(spark, table_ro, version=1).count() == 10
    assert read_snapshot(spark, table_ro, version=2).count() == 20
    assert read_snapshot(spark, table_ro).count() == 10  # only p='b' left
    # as-of timestamp picks the newest commit <= ts
    assert read_snapshot(spark, table_ro, as_of_ts=150).count() == 10
    assert read_snapshot(spark, table_ro, as_of_ts=250).count() == 20
    with pytest.raises(ValueError):
        read_snapshot(spark, table_ro, as_of_ts=50)


def test_delete_never_touches_files(spark, table_ro):
    # v3 dropped partition 'a' from the MANIFEST; v2 must still read the
    # full content because data files are immutable
    v2 = read_snapshot(spark, table_ro, version=2)
    assert v2.filter(F.col("p") == "a").count() == 10
    # and the files referenced by v1 still exist on disk
    v1_files = read_snapshot(spark, table_ro, version=1).inputFiles()
    assert v1_files and all(os.path.exists(f.replace("file:", "")) for f in v1_files)


def test_manifest_pruning_reduces_file_list(spark, table_ro):
    full = read_snapshot(spark, table_ro, version=2)
    pruned = read_snapshot(spark, table_ro, version=2, partition_filter={"p": "a"})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert pruned.count() == 10
    assert pruned.select("p").distinct().collect()[0][0] == "a"
    # pruning to nothing yields an empty frame with the table schema
    empty = read_snapshot(spark, table_ro, partition_filter={"p": "zzz"})
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "p", "x"}


def test_history_and_stats(spark, table_ro):
    hist = table_history(table_ro)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["operation"] for h in hist] == ["append", "append", "delete"]
    assert [h["row_count"] for h in hist] == [10, 20, 10]
    assert hist[1]["parent"] == 1
    # manifest column bounds recorded for stat_cols
    import json

    snap = json.load(open(os.path.join(table_ro, "metadata", "v00001.json")))
    bounds = [e["bounds"]["k"] for e in snap["manifest"]]
    assert all(lo is not None and hi is not None for lo, hi in bounds)


def test_conflicting_travel_args(spark, table_ro):
    with pytest.raises(ValueError):
        read_snapshot(spark, table_ro, version=1, as_of_ts=100)


def test_compaction_preserves_content_and_prunes(spark, table):
    from etl_market_survey_spark.sources.lakehouse import compact_snapshot

    before = read_snapshot(spark, table)  # v3: only p='b', two files
    before_rows = sorted((r["k"], r["p"], r["x"]) for r in before.collect())
    n_files_before = len(before.inputFiles())
    v = compact_snapshot(spark, table, target_rows=100, commit_ts=400, stat_cols=["k"])
    after = read_snapshot(spark, table)
    assert v == 4
    assert sorted((r["k"], r["p"], r["x"]) for r in after.collect()) == before_rows
    assert len(after.inputFiles()) < n_files_before
    # pre-compaction version still reads the ORIGINAL files (time travel)
    assert read_snapshot(spark, table, version=3).count() == 10
    hist = table_history(table)
    assert hist[-1]["operation"] == "compact"
    assert hist[-1]["row_count"] == 10
    # pruning still keyed on partition values
    assert read_snapshot(spark, table, partition_filter={"p": "b"}).count() == 10
    assert read_snapshot(spark, table, partition_filter={"p": "zzz"}).count() == 0


def test_bounds_filter_zone_map_pruning(spark, table_ro):
    # v2: files per (partition, commit) with k-bounds [0..9] and [10..19]
    full = read_snapshot(spark, table_ro, version=2)
    # equality probe k=15 can only live in the second commit's files
    pruned = read_snapshot(spark, table_ro, version=2, bounds_filter={"k": 15})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # pruning is SOUND: applying the real predicate gives the same rows
    assert (
        pruned.filter(F.col("k") == 15).count()
        == full.filter(F.col("k") == 15).count()
        == 1
    )
    # range probe
    rng = read_snapshot(spark, table_ro, version=2, bounds_filter={"k": (0, 4)})
    assert rng.filter(F.col("k") <= 4).count() == 5
    assert len(rng.inputFiles()) < len(full.inputFiles())
    # probing outside every bound prunes to the empty frame
    none = read_snapshot(spark, table_ro, version=2, bounds_filter={"k": 999})
    assert none.count() == 0
    # columns without recorded stats never prune
    keep = read_snapshot(spark, table_ro, version=2, bounds_filter={"x": 123.0})
    assert keep.count() == 20


def test_incremental_read_appends_only(spark, table_ro):
    from etl_market_survey_spark.sources.lakehouse import read_incremental

    inc = read_incremental(spark, table_ro, from_version=1, to_version=2)
    ks = sorted(r["k"] for r in inc.collect())
    assert ks == list(range(10, 20))  # exactly the v2 append
    assert read_incremental(spark, table_ro, from_version=0, to_version=1).count() == 10
    # crossing the v3 delete must refuse
    with pytest.raises(ValueError, match="delete"):
        read_incremental(spark, table_ro, from_version=2, to_version=3)


def test_snapshot_changes_logical_diff(spark, table_ro):
    from etl_market_survey_spark.sources.lakehouse import snapshot_changes

    ch = snapshot_changes(spark, table_ro, from_version=2, to_version=3, keys=["k"])
    counts = {r["change_type"]: r["n"] for r in ch.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"delete": 10, "unchanged": 10}


def test_schema_evolution_across_appends(spark, table):
    # append a NEW column in a later commit: the unified read must
    # surface it (nulls for old files) instead of silently dropping it
    from etl_market_survey_spark.sources.lakehouse import commit_snapshot

    extra = spark.createDataFrame(
        [(100, "b", 1.0, "fresh")], "k long, p string, x double, note string"
    )
    commit_snapshot(
        spark, table, extra, operation="append", partition_col="p",
        commit_ts=500, stat_cols=["k"],
    )
    cur = read_snapshot(spark, table)
    assert "note" in cur.columns
    assert cur.filter(F.col("note") == "fresh").count() == 1
    assert cur.filter(F.col("note").isNull()).count() == cur.count() - 1
    # old versions unaffected
    assert "note" not in read_snapshot(spark, table, version=2).columns
