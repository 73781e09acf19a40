"""Worked example — the COMPLETE public-Spark-API round-trip through
the registered data sources, batch and streaming, both wire formats:

  1. CREATE tables through ``df.write.format(...)`` alone:
       delta_lite   -> partitioned by priority, a CHECK constraint and
                       the change-data-feed property set via writer
                       options
       iceberg_lite -> hidden-partitioned bucket[8] on the order key
                       (the spec's murmur3, computed in the write tasks)
  2. APPEND with PERMUTED column order through both writers (mapping is
     by name), then assert BOTH tables hold the identical logical rows
     — and that the LIBRARY readers (read_delta / read_iceberg) agree
     with the registered readers, i.e. the public write path produced
     fully protocol-correct tables.
  3. MERGE INTO with the full clause form on both formats — a matched
     UPDATE gated by a condition over t./s. columns, a NOT MATCHED BY
     SOURCE DELETE gated by its own condition, a conditional INSERT —
     copy-on-write on Delta, position-delete + append on Iceberg, and
     assert the two change strategies land on the same logical table.
  4. STREAM an append-only Delta source (two public-API appends; the
     merged table would rightly REFUSE to stream its dataChange
     removes) into BOTH formats through ``writeStream.format(...)``
     (exactly-once: Delta txn actions / Iceberg snapshot-summary epoch
     markers), re-drain from the same checkpoints to prove replay
     commits nothing, and assert both sinks equal the source.

Run: python examples/datasource_roundtrip_pipeline.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.session import get_spark
from etl_market_survey_spark.sources.deltalog import merge_delta, read_delta
from etl_market_survey_spark.sources.iceberg import merge_iceberg, read_iceberg
from etl_market_survey_spark.sources.pyds import DeltaLiteDataSource
from etl_market_survey_spark.sources.pyds_iceberg import IcebergLiteDataSource


def main(sf_dir: str | None = None) -> None:
    sf_dir = sf_dir or "/root/testdata/sf0.01"
    spark = get_spark("datasource-roundtrip")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaLiteDataSource)
    spark.dataSource.register(IcebergLiteDataSource)
    root = tempfile.mkdtemp(prefix="ds_roundtrip_")
    dp, ip = f"{root}/delta", f"{root}/ice"

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("pr"),
            F.col("o_totalprice").alias("tp"),
        )
    )

    # 1. creation through the public write API
    seed = o.filter(F.col("k") % 3 == 0)
    (
        seed.write.format("delta_lite").mode("append")
        .option("partitionCol", "pr")
        .option("commitTs", "100")
        .option("property.delta.constraints.tp_pos", "tp >= 0")
        .option("property.delta.enableChangeDataFeed", "true")
        .save(dp)
    )
    (
        seed.write.format("iceberg_lite").mode("append")
        .option("partitionCol", "k")
        .option("partitionTransform", "bucket[8]")
        .option("commitTs", "100")
        .save(ip)
    )

    # 2. permuted-column appends; four readers must agree
    extra = o.filter(F.col("k") % 3 == 1).select("tp", "k", "pr")
    extra.write.format("delta_lite").mode("append").save(dp)
    extra.write.format("iceberg_lite").mode("append").save(ip)

    def rows(df):
        return sorted((r["k"], r["pr"], r["tp"]) for r in df.collect())

    want = rows(o.filter((F.col("k") % 3).isin(0, 1)))
    got_d = rows(spark.read.format("delta_lite").load(dp))
    got_i = rows(spark.read.format("iceberg_lite").load(ip))
    assert got_d == want and got_i == want, "append round-trip mismatch"
    assert rows(read_delta(spark, dp)) == want, "library Delta read"
    assert rows(read_iceberg(spark, ip)) == want, "library Iceberg read"
    print(f"public-API writers: {len(want)} rows round-trip on both "
          "formats, library readers agree")

    # 3. clause-form MERGE, both change strategies, one logical result
    src = o.filter(F.col("k") % 5 == 0).select(
        "k", F.lit("MERGED").alias("pr"), (F.col("tp") * 2.0).alias("tp")
    )
    clauses = dict(
        matched_condition="t.pr <> '1-URGENT'",
        when_not_matched_by_source="delete",
        by_source_condition="pr = '5-LOW'",
        not_matched_condition="k % 2 = 0",
        commit_ts=200,
    )
    merge_delta(spark, dp, src, on=["k"], **clauses)
    merge_iceberg(spark, ip, src, on=["k"], **clauses)
    md, mi = rows(read_delta(spark, dp)), rows(read_iceberg(spark, ip))
    assert md == mi, "clause MERGE: copy-on-write != merge-on-read"
    print(f"clause MERGE: both formats converge on {len(md)} rows "
          "(conditional update + by-source delete + conditional insert)")

    # 4. exactly-once streaming sinks, replay-safe. The merged table
    # correctly REFUSES to stream (its MERGE commit carries dataChange
    # removes — the append-stream contract), so the stream source is a
    # fresh append-only table built through the same public writer.
    sp = f"{root}/stream_src"
    seed.write.format("delta_lite").mode("append") \
        .option("commitTs", "100").save(sp)
    extra.write.format("delta_lite").mode("append") \
        .option("commitTs", "200").save(sp)
    sinks = {}
    for fmt in ("delta_lite", "iceberg_lite"):
        sink, ckpt = f"{root}/sink_{fmt}", f"{root}/ckpt_{fmt}"
        for _ in range(2):  # second drain = recovery replay, no dupes
            q = (
                spark.readStream.format("delta_lite").load(sp)
                .writeStream.format(fmt)
                .option("checkpointLocation", ckpt)
                .option("txnAppId", f"roundtrip_{fmt}")
                .trigger(availableNow=True)
                .start(sink)
            )
            q.awaitTermination(180)
        sinks[fmt] = rows(spark.read.format(fmt).load(sink))
    src_rows = rows(spark.read.format("delta_lite").load(sp))
    assert src_rows == want, "stream source mismatch"
    assert sinks["delta_lite"] == src_rows, "delta_lite sink mismatch"
    assert sinks["iceberg_lite"] == src_rows, "iceberg_lite sink mismatch"
    print(f"streaming sinks: {len(src_rows)} rows drained exactly-once "
          "into both formats (replayed drains committed nothing)")

    shutil.rmtree(root, ignore_errors=True)
    print("datasource round-trip pipeline: ALL CHECKS PASSED")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
