"""Batch range (band) join via bucketized equi-join.

Spark has no native band-join physical operator: a raw theta join
``l.v < r.v AND r.v <= l.v + W`` with no equality conjunct plans as
BroadcastNestedLoopJoin (O(|L|*|R|) comparisons, broadcast of a whole
side) — unusable at 100 TB. The standard distributed rewrite (used by
every interval-join engine, cf. Flink's interval join and the
DataFusion/Trino range-partitioned joins) is *bucketization*:

- assign every right row to bucket ``floor(v / W)``;
- replicate every left row to each bucket its admissible band
  ``(v + lower, v + upper]`` overlaps — at most 2 buckets when
  ``W >= upper - lower`` (the default), ``k+1`` buckets for width
  ``W = (upper-lower)/k``;
- equi-join on ``(keys..., bucket)`` and re-check the exact band
  predicate.

The join is then a plain shuffled hash join: hash-partitionable,
AQE-skew-splittable, map-side-prunable — the replication factor (<= 2)
is the only overhead, and no executor ever sees more than one bucket's
worth of rows per key. Works on any integer axis (we use epoch-µs).

Beyond-reference operator (the reference has no joins besides
equi-alignment — SURVEY §2.3); first-class for event-correlation
workloads at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floordiv(v: Column, w: int) -> Column:
    """Mathematical floor division for LongType (``div`` truncates toward
    zero, which is wrong for negative values; pmod fixes the remainder)."""
    return ((v - F.pmod(v, F.lit(w))) / F.lit(w)).cast("long")


def band_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_on: str,
    right_on: str,
    lower: int,
    upper: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Pairs where ``right.right_on - left.left_on`` is in ``(lower, upper]``
    and all ``keys`` match. Band columns must be integral (e.g. epoch-µs
    longs). Column names (besides ``keys``) must be disjoint across sides.

    ``bucket_width`` defaults to ``upper - lower`` (2-way replication);
    pass a smaller width to trade replication for finer buckets when the
    band is much wider than the typical gap.
    """
    if upper <= lower:
        raise ValueError(f"empty band: ({lower}, {upper}]")
    w = bucket_width if bucket_width is not None else upper - lower
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")

    lv = F.col(left_on)
    # admissible right values are the integers [lv+lower+1, lv+upper]
    lo_b = _floordiv(lv + F.lit(lower + 1), w)
    hi_b = _floordiv(lv + F.lit(upper), w)
    l_rep = left.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    r_b = right.withColumn("_bucket", _floordiv(F.col(right_on), w))

    gap = F.col(right_on) - F.col(left_on)
    joined = l_rep.join(r_b, on=[*keys, "_bucket"], how="inner").filter(
        (gap > F.lit(lower)) & (gap <= F.lit(upper))
    )
    return joined.drop("_bucket")
