"""Incremental view maintenance for additive aggregates (beyond reference).

At 100 TB you cannot recompute a rollup by rescanning the base table on
every ingest; you maintain it. This module implements the classic
partial-aggregate IVM contract (Gupta & Mumick's delta rules restricted
to distributive aggregates): a materialized view keyed by ``keys`` holds
*mergeable partial states* — exact decimal sums on the 1e-6 grid (the
``functions/stats.dsum`` representation) and signed row counts — and a
refresh is

    view' = combine(view, partials(delta))

one shuffle over the (small) delta plus a key-partitioned merge. With
retractions (CDC deletes/updates) rows carry a sign of -1, which the
signed counts and sums absorb exactly; COUNT/SUM/AVG are therefore fully
incremental under inserts *and* deletes. MIN/MAX are only maintained
under inserts (they are not invertible — a delete of the current min
needs a per-key rescan; callers get that via ``min_max=False`` plus a
targeted recompute of the touched keys).

Exactness: partials are ``decimal(38,0)`` sums of ``floor(x * 1e6)``, so
merge order, partitioning, and batch split never change a bit —
``merge(partials(A), partials(B)) == partials(A ∪ B)`` exactly, which is
what the q115 gate proves against a full-recompute DuckDB oracle.

Scale shape: ``partials(delta)`` shuffles only the delta; the merge is a
union + groupBy on the view key. Store the view bucketed by ``keys``
(sources/writers.write_bucketed) and the merge needs no exchange on the
base side; only delta-touched partitions rewrite under the
copy-on-write discipline of operators/merge.
"""

from __future__ import annotations

from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Session confs the bucketed refresh path depends on. Three planner
#: heuristics can silently reintroduce an exchange on the base branch:
#: ``DisableUnnecessaryBucketedScan`` drops the bucketed scan whenever the
#: bucket count disagrees with the join's target partitioning (it then
#: plans a fresh shuffle); a small delta can flip the join to broadcast,
#: which also abandons the on-disk hash layout; and AQE re-plans at
#: runtime (stage coalescing / join-strategy switches), so the executed
#: plan can differ from the compiled one per-environment. The refresh is
#: a fixed two-table merge where AQE has nothing to optimize — the base
#: side never shuffles and the delta is small by contract — so pin all
#: three while planning/executing a refresh: the zero-exchange contract
#: must be a plan property, not a heuristic accident.
REFRESH_CONFS = {
    "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "false",
}


@contextmanager
def bucketed_refresh(spark: SparkSession):
    """Pin :data:`REFRESH_CONFS` for the duration of a bucketed view
    refresh (plan + action), restoring prior values on exit. Use around
    :func:`merge_partials_join` against a ``write_bucketed`` view."""
    saved = {k: spark.conf.get(k, None) for k in REFRESH_CONFS}
    try:
        for k, v in REFRESH_CONFS.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

_SCALE = 1_000_000.0  # keep in lockstep with functions/stats.dsum


def _scaled(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * F.lit(_SCALE)).cast("decimal(38,0)")


def sum_partials(
    df: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    sign: str | Column | None = None,
    min_max: bool = False,
) -> DataFrame:
    """Mergeable partial-aggregate state: per key, signed row count ``_n``
    and exact scaled sums ``_s_<col>``; optionally ``_min_/_max_<col>``
    (insert-only views)."""
    s = (F.col(sign) if isinstance(sign, str) else sign) if sign is not None else F.lit(1)
    aggs = [F.sum(s.cast("long")).alias("_n")]
    for c in cols:
        aggs.append(F.sum(_scaled(c) * s.cast("decimal(38,0)")).alias(f"_s_{c}"))
        if min_max:
            aggs.append(F.min(c).alias(f"_min_{c}"))
            aggs.append(F.max(c).alias(f"_max_{c}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    min_max: bool = False,
    drop_empty: bool = True,
) -> DataFrame:
    """``combine(view, delta)`` — associative, commutative, exact.

    Keys whose signed count reaches zero are dropped (the group no
    longer exists in the base) unless ``drop_empty=False``.
    """
    aggs = [F.sum("_n").alias("_n")]
    for c in cols:
        aggs.append(F.sum(f"_s_{c}").alias(f"_s_{c}"))
        if min_max:
            aggs.append(F.min(f"_min_{c}").alias(f"_min_{c}"))
            aggs.append(F.max(f"_max_{c}").alias(f"_max_{c}"))
    out = view.unionByName(delta).groupBy(*keys).agg(*aggs)
    return out.filter(F.col("_n") != 0) if drop_empty else out


def merge_partials_join(
    view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    drop_empty: bool = True,
) -> DataFrame:
    """Join-based combine — semantically identical to
    :func:`merge_partials` (equivalence unit-tested), but expressed as a
    full-outer join + coalesced addition so a view STORED BUCKETED by
    ``keys`` merges with ZERO exchange on the base side (the union +
    groupBy form re-shuffles the whole view every refresh, because a
    union discards each input's output partitioning). Use this form for
    the materialized refresh path; the union form remains the simplest
    for ad-hoc in-plan merging."""
    d = delta
    for c in ["_n"] + [f"_s_{c}" for c in cols]:
        d = d.withColumnRenamed(c, f"{c}_d")
    out = view.join(d, list(keys), "full_outer")
    zero = F.lit(0).cast("decimal(38,0)")
    merged_cols = [
        (F.coalesce(F.col("_n"), F.lit(0)) + F.coalesce(F.col("_n_d"), F.lit(0))).alias("_n")
    ]
    for c in cols:
        merged_cols.append(
            (
                F.coalesce(F.col(f"_s_{c}"), zero) + F.coalesce(F.col(f"_s_{c}_d"), zero)
            ).alias(f"_s_{c}")
        )
    out = out.select(*keys, *merged_cols)
    return out.filter(F.col("_n") != 0) if drop_empty else out


def finalize(
    partials: DataFrame,
    cols: Sequence[str],
    min_max: bool = False,
) -> DataFrame:
    """User-facing view: ``n``, ``sum_<c>``, ``avg_<c>`` (+ min/max)
    derived from the partial state; bit-identical to a from-scratch
    ``dsum``/``davg`` over the current base rows."""
    out = partials.withColumn("n", F.col("_n")).drop("_n")
    for c in cols:
        s = F.col(f"_s_{c}").cast("double") / F.lit(_SCALE)
        out = (
            out.withColumn(f"sum_{c}", s)
            .withColumn(f"avg_{c}", s / F.col("n"))
            .drop(f"_s_{c}")
        )
        if min_max:
            out = out.withColumnRenamed(f"_min_{c}", f"min_{c}").withColumnRenamed(
                f"_max_{c}", f"max_{c}"
            )
    return out
