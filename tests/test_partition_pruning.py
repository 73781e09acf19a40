"""Disk-layout partition pruning: a date-partitioned write must let a
day filter prune directories at the scan (the 100 TB layout contract —
SCALE.md 'Scans & layout')."""

from pyspark.sql import functions as F

from etl_market_survey_spark.sources.writers import write_parquet


def test_day_filter_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)], "event_id long, day int, value double"
    )
    write_parquet(df, path, partition_by=["day"])

    rd = spark.read.parquet(path).filter(F.col("day") == 3)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "PartitionFilters" in scan and "day" in scan.split("PartitionFilters")[1][:80]
    # the filter landed in PartitionFilters (directory pruning), NOT as
    # a data filter the scan evaluates row-by-row
    part_section = scan.split("PartitionFilters")[1]
    assert "= 3" in part_section[:120], scan
    # correctness: only the one partition's rows
    assert rd.count() == 20


def test_unfiltered_read_sees_all_partitions(spark, tmp_path):
    path = str(tmp_path / "events_all")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "event_id long, day int, value double"
    )
    write_parquet(df, path, partition_by=["day"])
    rd = spark.read.parquet(path)
    assert rd.count() == 30
    assert len({f.split("day=")[1][0] for f in rd.inputFiles()}) == 3
