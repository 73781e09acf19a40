"""Idempotent streaming file sink (exactly-once output on replay).

Structured Streaming's checkpoint gives at-least-once delivery to
``foreachBatch``: after a crash the last micro-batch can re-run with the
SAME batch_id and different task ordering. A plain ``append`` sink then
duplicates that batch. The standard fix — used here — is to key the
output layout by batch_id and make the write an overwrite of exactly
that batch's partition directory (dynamic partition overwrite): a replay
rewrites the same directory instead of appending a second copy, so the
on-disk result converges to exactly-once no matter how many times a
batch retries.

Readers see ``path`` as ordinary parquet (the `_batch_id` partition
column is metadata); downstream exact dedup stays available for the
cross-restart case where the SOURCE re-serves data under a new batch_id
(that is a source contract, not a sink property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(path: str):
    """A ``foreachBatch`` function writing each micro-batch to
    ``path/_batch_id=N/`` via dynamic partition overwrite."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return write


def write_stream_idempotent(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start (and with ``available_now`` drain) a stream into the
    idempotent parquet layout. Returns the StreamingQuery."""
    writer = (
        df.writeStream.foreachBatch(idempotent_parquet_writer(path))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
