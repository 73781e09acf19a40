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
