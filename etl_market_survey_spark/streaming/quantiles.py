"""Streaming quantiles — the KLL sketch's streaming face.

The mergeability that makes ``operators/kll`` a grouped aggregate is
exactly what a stream needs: each micro-batch folds into a bounded
partial, partials merge associatively, and the merged sketch answers
quantiles at any point without re-reading history. State is
O(k·log(n/k)) no matter how long the stream runs — the property that
makes percentile monitoring viable on an unbounded 100 TB/day feed.

Exactly-once: each batch's partial is written under its own
``batch_id=N`` directory with dynamic partition overwrite (same
contract as ``streaming/sinks.idempotent_parquet_writer``) — a crash
replay of batch N rewrites N's partial instead of double-counting it.
The merged sketch is therefore a pure function of the delivered data,
independent of replays and of micro-batch boundaries (asserted in
tests).

The merged sketch can also seed ``kll_exact_quantiles(sketch=...)``:
stream maintains the cheap summary continuously; when an EXACT
percentile is needed, one batch verification pass over the stored data
refines it — the sketch only prunes, as everywhere else here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kll import KllSketch, kll_build

_PARTIAL_SCHEMA = "batch_id long, n long, items array<double>, weights array<long>"


def kll_partial_writer(out_path: str, col: str, k: int = 256):
    """foreachBatch function: build this batch's partial sketch and
    overwrite its ``batch_id=N`` partition."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sk = kll_build(batch_df, col, k)
        n, items, weights = sk.to_row()
        row = spark.createDataFrame(
            [(int(batch_id), n, items, weights)], _PARTIAL_SCHEMA
        )
        (
            row.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return write


def write_stream_kll(
    stream_df: DataFrame,
    col: str,
    out_path: str,
    checkpoint: str,
    k: int = 256,
):
    """Attach the partial-sketch sink to a streaming frame."""
    return (
        stream_df.writeStream.foreachBatch(kll_partial_writer(out_path, col, k))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_merged_sketch(spark: SparkSession, out_path: str, k: int = 256) -> KllSketch:
    """Merge all persisted batch partials into one sketch (associative,
    so batch order is irrelevant)."""
    rows = (
        spark.read.schema(_PARTIAL_SCHEMA)
        .parquet(out_path)
        .orderBy("batch_id")  # stable merge order -> reproducible sketch
        .collect()
    )
    out = KllSketch(k)
    for r in rows:
        out = out.merge(KllSketch.from_row(k, r["n"], r["items"], r["weights"]))
    return out
