"""Window-shaped operators (SURVEY §2.5).

W2 half-curve (compare_measurements.py:33-35 — keep the first half of the
rows per measurement after sorting by `When`: the "going-up" branch of an
up-down voltage ramp) and W3 first-difference over sorted distinct values
(clean_beta_scan.py:337,342 — uniform-grid bin size).

All single-window-pass built-ins; the only shuffle is the partition key.
Order columns should include a unique tiebreaker for determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def half_curve(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[str],
) -> DataFrame:
    """W2 — keep the first floor(n/2) rows per partition, ordered."""
    w = Window.partitionBy(*partition).orderBy(*[F.col(c) for c in order])
    wc = Window.partitionBy(*partition)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wc))
        .filter(F.col("_rn") <= F.floor(F.col("_n") / 2))
        .drop("_rn", "_n")
    )


def first_diff(
    df: DataFrame,
    partition: Sequence[str],
    col: str,
    out: str = "diff",
    agg_min: bool = True,
) -> DataFrame:
    """W3 — differences of sorted *distinct* values per partition.

    ``agg_min=True`` reduces to the minimum spacing (one row per
    partition), the uniform-grid bin-size idiom of the reference.
    """
    distinct = df.select(*partition, col).distinct()
    w = Window.partitionBy(*partition).orderBy(F.col(col))
    diffs = distinct.withColumn(out, F.col(col) - F.lag(col).over(w)).filter(
        F.col(out).isNotNull()
    )
    if agg_min:
        return diffs.groupBy(*partition).agg(F.min(out).alias(out))
    return diffs


def top_k_per_group(
    df: DataFrame,
    partition: Sequence[str],
    order: Sequence[str | Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group, deterministic (order must be a total order).

    Scale shape: row_number + filter compiles to Spark's WindowGroupLimit
    physical rewrite — each map task keeps only its local top-k per group
    BEFORE the shuffle, so the exchange carries at most k rows per
    (group x input-partition), never the full per-group row set. A skewed
    group therefore costs k x n_partitions rows, not its raw count. For
    global top-k over ungrouped data prefer orderBy().limit(k)
    (TakeOrderedAndProject — no full sort, no single-reducer window).
    """
    w = Window.partitionBy(*partition).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order]
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
