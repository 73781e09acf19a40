"""Global sort index without the single-partition window — beyond
reference.

``ROW_NUMBER() OVER (ORDER BY ...)`` is the classic scale trap: an
un-partitioned window forces ``Exchange SinglePartition`` — every row
through ONE task, the whole cluster idle behind it. The scalable
formulation splits the total order into a range partitioning plus
bounded metadata:

1. ``repartitionByRange`` on the sort keys (Spark's sampled range
   partitioner — the same machinery behind ``orderBy``) so partition
   ``p`` holds a contiguous key range;
2. a LOCAL row_number per partition (window partitioned by
   ``spark_partition_id()`` — parallelism preserved);
3. per-partition row counts -> cumulative offsets, a driver-side fold
   over at most ``num_partitions`` rows (bounded by contract), joined
   back as a broadcast.

``idx = offset(partition) + local_rank - 1`` is then exactly the global
rank. Deterministic whenever the sort keys are a total order (include a
unique tiebreaker, same rule as SQL ROW_NUMBER); everything stays
JVM-side — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_sort_index(
    df: DataFrame,
    group_by: list[str],
    order_by: list[str],
    index_col: str = "idx",
    cum_cols: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ROW_NUMBER (1-based, in ``index_col``) — and optional
    per-group inclusive running sums (``cum_cols``: out-name -> source
    column) — WITHOUT ``Window.partitionBy(<group>)`` over the full
    table.

    The scale trap this replaces: a rank window partitioned by a
    BOUNDED-cardinality key (e.g. 3 distinct return flags) creates one
    window partition per key value — each a single-task sort of n/k
    rows, which dies at 100 TB. Here the sort parallelism is
    ``num_partitions`` regardless of group cardinality:

    1. ``repartitionByRange`` on (group ++ order) keys — partition p
       holds a contiguous (group, value) range, so a group spans a RUN
       of partitions and each partition holds few distinct groups;
    2. per-(partition, group) counts/sums — the collect is bounded by
       ``num_partitions + n_groups - 1`` rows (contiguity), folded to
       cumulative offsets on the driver and broadcast back;
    3. a LOCAL window per (partition, group) slice for the within-slice
       row_number / running sums; global value = offset + local.

    Contract: intended for low-cardinality groups over huge tables
    (bounded driver fold). For high-cardinality groups a plain
    ``Window.partitionBy`` is already parallel — use that instead.
    ``order_by`` should be a total order (include a unique tiebreaker)
    for deterministic ranks, same rule as SQL ROW_NUMBER."""
    if not group_by or not order_by:
        raise ValueError("group_by and order_by must both be non-empty")
    cum_cols = cum_cols or {}
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    keys = [F.col(c) for c in group_by + order_by]

    ranged = df.repartitionByRange(n, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()  # one pass for stats, one for ranks

    aggs = [F.count("*").alias("_n")] + [
        F.sum(src).alias(f"_s_{out}") for out, src in cum_cols.items()
    ]
    stats = ranged.groupBy("_pid", *group_by).agg(*aggs)
    rows = stats.collect()  # bounded: <= n + n_groups - 1 (contiguity)

    by_group: dict[tuple, list] = {}
    for r in rows:
        by_group.setdefault(tuple(r[g] for g in group_by), []).append(r)
    off_rows = []
    for gvals, grows in by_group.items():
        rank_acc = 0
        sum_acc = {out: 0 for out in cum_cols}
        for r in sorted(grows, key=lambda r: r["_pid"]):
            off_rows.append(
                tuple([r["_pid"], *gvals, rank_acc]
                      + [sum_acc[out] for out in cum_cols])
            )
            rank_acc += r["_n"]
            for out in cum_cols:
                sum_acc[out] += r[f"_s_{out}"] or 0

    from pyspark.sql.types import LongType, StructField, StructType

    stats_schema = {f.name: f.dataType for f in stats.schema.fields}
    off_schema = StructType(
        [StructField("_pid", stats_schema["_pid"], False)]
        + [StructField(f"_g_{g}", stats_schema[g], True) for g in group_by]
        + [StructField("_off", LongType(), False)]
        + [StructField(f"_soff_{out}", stats_schema[f"_s_{out}"], True)
           for out in cum_cols]
    )
    off_df = spark.createDataFrame(off_rows, off_schema)

    # null-safe on the group keys — a plain equi-join would silently
    # DROP rows whose group value is null
    cond = ranged["_pid"] == off_df["_pid"]
    for g in group_by:
        cond = cond & ranged[g].eqNullSafe(off_df[f"_g_{g}"])
    local = Window.partitionBy("_pid", *group_by).orderBy(
        *[F.col(c) for c in order_by]
    )
    out = (
        ranged.join(F.broadcast(off_df), cond)
        .drop(off_df["_pid"])
        .drop(*[f"_g_{g}" for g in group_by])
    ).withColumn(
        index_col, (F.col("_off") + F.row_number().over(local)).cast("long")
    )
    running = local.rowsBetween(Window.unboundedPreceding, 0)
    for out_name, src in cum_cols.items():
        out = out.withColumn(
            out_name, F.col(f"_soff_{out_name}") + F.sum(src).over(running)
        )
    drop = ["_pid", "_off"] + [f"_soff_{o}" for o in cum_cols]
    return out.drop(*drop)


def global_sort_index(
    df: DataFrame,
    order_by: list[str],
    index_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus a dense 0-based ``index_col`` numbering rows in
    ``order_by`` order, computed without ever collapsing the data to
    one partition."""
    if not order_by:
        raise ValueError("order_by must name at least one column")
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    keys = [F.col(c) for c in order_by]

    ranged = df.repartitionByRange(n, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()  # counted once, ranked once

    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    acc = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["_n"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")

    local = Window.partitionBy("_pid").orderBy(*keys)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            index_col,
            (F.col("_off") + F.row_number().over(local) - 1).cast("long"),
        )
        .drop("_pid", "_off")
    )
