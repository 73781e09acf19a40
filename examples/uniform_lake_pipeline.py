"""Worked example — ONE data copy, every access path (round-10 surface).

A single physical parquet lake is written once through Delta, then:

  1. row-DELETEd through Delta's merge-on-read route (deletion vectors)
  2. mirrored into Iceberg metadata over the SAME files
     (sources/uniform.mirror_to_iceberg — DVs become position-delete
     files), so BOTH formats read one copy
  3. counted on both sides WITHOUT touching data
     (count_rows_delta / count_rows_iceberg — log/manifest arithmetic)
  4. point-looked-up through a file-level data-skipping index
     (sources/skipindex — bloom bitmaps prune files zone maps can't)
  5. appended to and re-mirrored INCREMENTALLY (append snapshot), so
     the iceberg_lite stream source could tail the mirror points
  6. mirrored BACK into a fresh Delta commit
     (mirror_to_delta — position deletes become DVs again) and checked
     bit-identical

Run: python examples/uniform_lake_pipeline.py [output_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from etl_market_survey_spark.sources.deltalog import (  # noqa: E402
    count_rows_delta,
    delete_rows_where,
    read_delta,
    write_delta,
)
from etl_market_survey_spark.sources.iceberg import (  # noqa: E402
    count_rows_iceberg,
    read_iceberg,
    table_history,
)
from etl_market_survey_spark.sources.skipindex import (  # noqa: E402
    build_skipping_index,
    read_with_index,
)
from etl_market_survey_spark.sources.uniform import (  # noqa: E402
    mirror_to_delta,
    mirror_to_iceberg,
)

N = 50_000


def main(out_dir: str):
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("uniform-lake-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    table = os.path.join(out_dir, "events_table")
    idx = os.path.join(out_dir, "events_index")

    # 1. one Delta table, ids hash-scattered over 16 files
    df = spark.range(N).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 321).alias("device"),
        (F.col("id") * 0.25).alias("charge"),
    )
    write_delta(spark, table, df.repartition(16, "event_id"),
                commit_ts=1_000)
    delete_rows_where(spark, table, "event_id % 100 = 7",
                      commit_ts=2_000)  # DV route

    # 2. mirror: Iceberg reads the SAME files, deletes included
    mirror_to_iceberg(spark, table, commit_ts=3_000)
    n_delta = read_delta(spark, table).count()
    n_ice = read_iceberg(spark, table).count()
    assert n_delta == n_ice

    # 3. metadata-only counts agree with the scans
    assert count_rows_delta(spark, table) == n_delta
    assert count_rows_iceberg(spark, table) == n_ice

    # 4. skipping index over the shared files: point lookup prunes
    build_skipping_index(spark, table, ["event_id"], idx, n_bits=1 << 14)
    hit = read_with_index(spark, table, idx, [("event_id", "=", 4321)])
    n_scanned = len(hit.inputFiles())
    looked_up = [tuple(r) for r in hit.select("event_id", "device").collect()]
    assert n_scanned < 16 and looked_up == [(4321, 4321 % 321)]

    # 5. append + INCREMENTAL mirror -> an Iceberg append snapshot
    write_delta(
        spark, table,
        spark.range(N, N + 500).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 321).alias("device"),
            (F.col("id") * 0.25).alias("charge"),
        ),
        mode="append", commit_ts=4_000,
    )
    mirror_to_iceberg(spark, table, commit_ts=5_000)
    assert table_history(table)[-1]["operation"] == "append"
    n_both = read_iceberg(spark, table).count()
    assert n_both == read_delta(spark, table).count() == n_delta + 500

    # 6. round trip back into Delta: position deletes -> DVs again
    v = mirror_to_delta(spark, table, commit_ts=6_000)
    assert read_delta(spark, table, version=v).count() == n_both
    return n_both, n_scanned


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/uniform_lake_example"
    n, scanned = main(out)
    print(f"rows both formats: {n}; point lookup scanned {scanned}/16 files")
