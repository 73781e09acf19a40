"""Worked example — the lakehouse table lifecycle end-to-end, the way a
daily ingestion pipeline runs it (sources/lakehouse):

  1. day-1 append of orders partitioned by priority       (commit v1)
  2. day-2 incremental append                             (commit v2)
  3. GDPR-style partition delete                          (commit v3)
  4. small-file compaction — content identical, fewer
     files, old versions still readable                   (commit v4)
  5. reads: current, version pin, as-of-timestamp travel,
     manifest partition pruning, zone-map bounds skipping
  6. audit: table history + row counts per version

Run: python examples/lakehouse_pipeline.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.sources.lakehouse import (
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
    table_history,
)

PATH = "/tmp/spark_graft_lakehouse_example"


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    shutil.rmtree(PATH, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pr"),
        F.col("o_totalprice").alias("tp"),
    )

    # 1-2: two daily appends (deterministic halves of the feed)
    commit_snapshot(
        spark, PATH, orders.filter(F.col("k") % 2 == 0),
        operation="append", partition_col="pr", commit_ts=100, stat_cols=["k"],
    )
    commit_snapshot(
        spark, PATH, orders.filter(F.col("k") % 2 == 1),
        operation="append", partition_col="pr", commit_ts=200, stat_cols=["k"],
    )
    # 3: drop a partition (manifest-only — data files untouched)
    commit_snapshot(
        spark, PATH, None,
        operation="delete", delete_partition_values=["1-URGENT"], commit_ts=300,
    )
    # 4: compaction — same rows, fewer files
    pre = read_snapshot(spark, PATH)
    pre_files, pre_rows = len(pre.inputFiles()), pre.count()
    compact_snapshot(spark, PATH, target_rows=10**6, commit_ts=400, stat_cols=["k"])
    post = read_snapshot(spark, PATH)
    assert post.count() == pre_rows
    print(f"compaction: {pre_files} files -> {len(post.inputFiles())}, "
          f"{pre_rows} rows unchanged")

    # 5: the read surface
    v1 = read_snapshot(spark, PATH, version=1)
    asof = read_snapshot(spark, PATH, as_of_ts=250)  # sees v2
    pruned = read_snapshot(spark, PATH, partition_filter={"pr": "5-LOW"})
    probe = read_snapshot(spark, PATH, bounds_filter={"k": 42})
    print(f"v1 rows={v1.count()} asof(250) rows={asof.count()} "
          f"5-LOW rows={pruned.count()} "
          f"zone-map probe files={len(probe.inputFiles())}")
    # time travel still shows the deleted partition
    assert asof.filter(F.col("pr") == "1-URGENT").count() > 0
    assert post.filter(F.col("pr") == "1-URGENT").count() == 0

    # 6: audit trail
    for h in table_history(PATH):
        print(f"v{h['version']} {h['operation']:<9} files={h['n_files']:<3} "
              f"rows={h['row_count']}")
    return post


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("lakehouse-example")
    spark.sparkContext.setLogLevel("ERROR")
    main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
