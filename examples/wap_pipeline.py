"""Worked example — governed publication on Iceberg: the write-audit-
publish (WAP) lifecycle plus the layout/maintenance surface around it,
the way a production ingestion pipeline gates a daily batch:

  1. bootstrap: orders land on main and get OPTIMIZE ZORDER'd
     (rewrite_data_files(zorder_by=...)) so box reads prune
  2. the daily batch — which contains bad rows — is staged on a
     BRANCH (write_iceberg(branch="staging")); main readers are
     untouched
  3. audit: the staged state is read via ref= and a constraint scan
     finds the bad rows
  4. audit-fix: the bad rows are DELETED ON THE BRANCH
     (delete_rows_where_iceberg(branch=...)) — merge-on-read position
     deletes whose base is the branch head
  5. publish: fast_forward moves the main pointer to the corrected
     branch head — one atomic metadata operation
  6. inspect: metadata tables ($history separates main lineage from
     what was staged; $refs, $files); the stats-pruned box read in
     step 1 proves the clustering pays off before the batch lands

Run: python examples/wap_pipeline.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.operators.zorder import files_touched
from etl_market_survey_spark.sources.iceberg import (
    delete_rows_where_iceberg,
    fast_forward,
    metadata_table,
    read_iceberg,
    rewrite_data_files,
    write_iceberg,
)

PATH = "/tmp/spark_graft_wap_example"


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    shutil.rmtree(PATH, ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.col("o_totalprice").alias("tp"),
    )

    # 1. bootstrap + clustering; prove the box read prunes
    write_iceberg(spark, PATH, orders, commit_ts=100)
    rewrite_data_files(spark, PATH, zorder_by=["k", "c"], n_files=16,
                       commit_ts=200)
    b = orders.agg(F.min("k"), F.max("k"), F.min("c"), F.max("c")).first()
    klo = b[0] + int(0.25 * (b[1] - b[0]))
    khi = b[0] + int(0.50 * (b[1] - b[0]))
    clo = b[2] + int(0.25 * (b[3] - b[2]))
    chi = b[2] + int(0.50 * (b[3] - b[2]))
    box = read_iceberg(
        spark, PATH, stats_filter={"k": (klo, khi), "c": (clo, chi)}
    )
    scanned = files_touched(box)

    # 2. stage the daily batch on a branch; some prices are corrupt
    batch = orders.filter(F.col("k") % 2 == 0).select(
        (F.col("k") + 50_000_000).alias("k"),
        F.col("c"),
        F.when(F.col("k") % 11 == 0, -F.col("tp"))
        .otherwise(F.col("tp"))
        .alias("tp"),
    )
    write_iceberg(spark, PATH, batch, mode="append", commit_ts=300,
                  branch="staging")
    n_main_during_audit = read_iceberg(spark, PATH).count()

    # 3. audit the STAGED state through the ref
    staged = read_iceberg(spark, PATH, ref="staging")
    n_bad = staged.filter(F.col("tp") < 0).count()

    # 4. fix on the branch — main still reads the old state
    delete_rows_where_iceberg(spark, PATH, "tp < 0", commit_ts=400,
                              branch="staging")

    # 5. publish atomically
    fast_forward(PATH, "staging", drop=True, commit_ts=500)
    published = read_iceberg(spark, PATH)
    n_published = published.count()
    n_bad_published = published.filter(F.col("tp") < 0).count()

    # 6. inspection surface
    hist = metadata_table(spark, PATH, "history")
    n_main_lineage = hist.filter("is_current_ancestor").count()

    return {
        "main_during_audit": n_main_during_audit,
        "bad_staged": n_bad,
        "published": n_published,
        "bad_published": n_bad_published,
        "main_lineage": n_main_lineage,
        "box_files_scanned": scanned,
    }


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    out = main(get_spark(), *(sys.argv[1:] or []))
    for k, v in out.items():
        print(f"{k}: {v}")
