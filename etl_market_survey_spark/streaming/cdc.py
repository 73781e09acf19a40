"""Streaming CDC apply: a batch-id-versioned, copy-on-write keyed table
maintained by ``foreachBatch`` — the lakehouse MERGE loop (Delta/Iceberg
style) on plain parquet, with exactly-once semantics and snapshot
isolation built from two ingredients this repo already proves out:

1. **Event-time conditional merge** (`operators.merge.upsert_latest`):
   per key the greatest ``order_cols`` tuple wins, so the maintained
   table is a pure function of the SET of rows seen — independent of
   micro-batch boundaries, apply order, and replays. That is what makes
   the drained table SQL-replayable (q95's oracle is one argmax window
   over the whole feed).
2. **Batch-id-keyed snapshot versions**: each micro-batch writes a FULL
   new snapshot to ``path/_v=<batch_id>/`` (never overwriting the
   snapshot it read), then readers pick the highest version with a
   ``_SUCCESS`` marker. A crashed/replayed batch N re-reads the same
   base (greatest version < N) and rewrites the same directory —
   convergent, exactly-once. Readers never see a partial write
   (directory + _SUCCESS is the commit point).

Copy-on-write rewrites the whole table per batch — correct and simple;
the scale path is the same as every COW lakehouse: partition the
snapshot by a key prefix and rewrite only touched partitions (dynamic
partition overwrite, as in streaming/sinks.py).
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^_v=(\d+)$")


def table_versions(path: str) -> list[int]:
    """Committed (``_SUCCESS``-marked) snapshot versions, ascending."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _V_RE.match(name)
        if m and os.path.exists(os.path.join(path, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_cdc_table(
    spark: SparkSession, path: str, before: int | None = None
) -> DataFrame | None:
    """Latest committed snapshot (optionally restricted to versions
    ``< before``, which is how a replaying batch finds its base)."""
    versions = table_versions(path)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(path, f"_v={versions[-1]}"))


def cdc_upsert_writer(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
):
    """``foreachBatch`` function maintaining the keyed table at ``path``."""
    from ..operators.merge import upsert_latest

    keys, order_cols = list(keys), list(order_cols)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        base = read_cdc_table(spark, path, before=int(batch_id))
        merged = upsert_latest(base, batch_df, keys, order_cols)
        merged.write.mode("overwrite").parquet(
            os.path.join(path, f"_v={int(batch_id)}")
        )

    return apply


def write_stream_cdc(
    df: DataFrame,
    path: str,
    checkpoint: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    available_now: bool = True,
):
    """Start (and with ``available_now`` drain) a CDC-apply stream.
    Returns the StreamingQuery."""
    writer = (
        df.writeStream.foreachBatch(
            cdc_upsert_writer(df.sparkSession, path, keys, order_cols)
        )
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Partition-pruned COW: the scale path promised in the module docstring.
# The table is hash-bucketed on the key; each micro-batch merges and
# rewrites ONLY the buckets its keys touch (one read of those buckets'
# latest snapshots, one merge, one partitioned write), so write
# amplification is touched-fraction x table instead of 1 x table. A
# version directory holds just its touched buckets; readers OVERLAY
# versions — per bucket, the newest committed version wins. Replay of
# batch N still re-reads bases < N and rewrites _v=N: exactly-once is
# unchanged.
# ---------------------------------------------------------------------------


def _bucket_col(keys: Sequence[str], n_buckets: int):
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))


def bucket_latest_dirs(
    path: str, before: int | None = None
) -> dict[int, int]:
    """Per bucket, the newest committed version (< ``before``) holding it."""
    out: dict[int, int] = {}
    for v in table_versions(path):
        if before is not None and v >= before:
            continue
        vdir = os.path.join(path, f"_v={v}")
        for name in os.listdir(vdir):
            if name.startswith("b="):
                out[int(name[2:])] = v  # ascending scan: later wins
    return out


def read_cdc_table_partitioned(
    spark: SparkSession, path: str, before: int | None = None
) -> DataFrame | None:
    latest = bucket_latest_dirs(path, before)
    if not latest:
        return None
    dirs = [os.path.join(path, f"_v={v}", f"b={b}") for b, v in latest.items()]
    return spark.read.parquet(*dirs)


def cdc_upsert_writer_partitioned(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    n_buckets: int = 16,
):
    """``foreachBatch`` function: bucket-pruned COW merge (see above)."""
    from pyspark.sql import functions as F

    from ..operators.merge import upsert_latest

    keys, order_cols = list(keys), list(order_cols)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        touched = sorted(
            r["b"]
            for r in batch_df.select(
                _bucket_col(keys, n_buckets).alias("b")
            ).distinct().collect()
        )
        if not touched:
            return
        latest = bucket_latest_dirs(path, before=bid)
        base_dirs = [
            os.path.join(path, f"_v={v}", f"b={b}")
            for b, v in latest.items()
            if b in set(touched)
        ]
        base = spark.read.parquet(*base_dirs) if base_dirs else None
        merged = upsert_latest(base, batch_df, keys, order_cols)
        (
            merged.withColumn("b", _bucket_col(keys, n_buckets))
            .write.mode("overwrite")
            .partitionBy("b")
            .parquet(os.path.join(path, f"_v={bid}"))
        )

    return apply


# ---------------------------------------------------------------------------
# Table maintenance: compaction folds the version overlay back to one
# snapshot (bounds read amplification after many partial versions);
# vacuum deletes version directories fully shadowed by newer ones
# (retention). `read_*_table(..., before=v)` is time travel over
# whatever vacuum has retained.
# ---------------------------------------------------------------------------


def compact_partitioned(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 16,
) -> int | None:
    """Rewrite the current overlay as one full snapshot at version
    ``max+1``. Returns the new version (None on empty table). Readers
    see the same rows before and after; afterwards every bucket's
    latest points at the new version, so overlay reads touch one
    directory again."""
    current = read_cdc_table_partitioned(spark, path)
    if current is None:
        return None
    new_v = table_versions(path)[-1] + 1
    (
        current.withColumn("b", _bucket_col(list(keys), n_buckets))
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(os.path.join(path, f"_v={new_v}"))
    )
    return new_v


def vacuum_partitioned(path: str) -> list[int]:
    """Delete version directories whose every bucket is shadowed by a
    newer committed version. Returns the versions removed. Keeps any
    version still serving at least one bucket, so concurrent overlay
    reads of the CURRENT table stay valid; time travel older than the
    removed versions is gone (the retention contract)."""
    import shutil

    latest = bucket_latest_dirs(path)
    serving = set(latest.values())
    removed = []
    for v in table_versions(path):
        if v not in serving:
            shutil.rmtree(os.path.join(path, f"_v={v}"))
            removed.append(v)
    return removed
