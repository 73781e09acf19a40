"""Table-maintenance operators: SCD1 upsert (MERGE) and snapshot diff
(CDC), as pure DataFrame plans.

Spark core has no MERGE INTO (that's a Delta/Iceberg feature); the
relational rewrite is standard and engine-portable:

- ``upsert``       — MERGE WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED
                     THEN INSERT: full-outer join on the key, coalesce
                     update-side columns over base-side.
- ``snapshot_diff`` — CDC between two snapshots of the same table: one
                     full-outer join classifying every key as insert /
                     delete / update / unchanged (update detection via
                     md5 over a canonical column encoding, so wide rows
                     compare with one digest instead of N column
                     equality tests).

Scale shape: both are single full-outer shuffles on the key — exactly
the join any MERGE implementation runs under the hood. With bucketed
base tables (tools/materialize_catalog.py) the base-side exchange
disappears; AQE splits skewed keys. The diff's digest comparison prunes
the update check to one 128-bit compare per key pair, so the shuffle
carries keys + digests, not full rows, when ``value_cols`` are wide
(projection happens below the join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(cols: Sequence[str]):
    # canonical row encoding: null-safe, delimiter-escaped enough for
    # fixed-schema comparisons (engine-portable: md5 of concat_ws)
    return F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """SCD1 merge: rows from ``updates`` win on key collision; unmatched
    base rows survive; unmatched update rows insert. Schemas must match."""
    keys = list(keys)
    value_cols = [c for c in base.columns if c not in keys]
    if set(base.columns) != set(updates.columns):
        raise ValueError("upsert requires identical schemas")
    b = base.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in value_cols])
    u = updates.select(*keys, *[F.col(c).alias(f"_u_{c}") for c in value_cols])
    joined = b.join(u, on=keys, how="full_outer")
    return joined.select(
        *keys,
        *[
            F.coalesce(F.col(f"_u_{c}"), F.col(f"_b_{c}")).alias(c)
            for c in value_cols
        ],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CDC classification per key: ``change_type`` in
    {'insert','delete','update','unchanged'} plus the new-side values
    (old-side for deletes)."""
    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in old.columns if c not in keys]
    value_cols = list(value_cols)
    o = old.select(
        *keys,
        _digest(value_cols).alias("_o_digest"),
        *[F.col(c).alias(f"_o_{c}") for c in value_cols],
    )
    n = new.select(
        *keys,
        _digest(value_cols).alias("_n_digest"),
        *[F.col(c).alias(f"_n_{c}") for c in value_cols],
    )
    joined = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("_o_digest").isNull(), F.lit("insert"))
        .when(F.col("_n_digest").isNull(), F.lit("delete"))
        .when(F.col("_o_digest") == F.col("_n_digest"), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return joined.select(
        *keys,
        change.alias("change_type"),
        *[
            F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
            for c in value_cols
        ],
    )


def upsert_latest(
    base: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Event-time conditional MERGE: per key, the row with the greatest
    ``order_cols`` tuple across base ∪ updates wins — an update only
    replaces the base row if it is NEWER. Unlike last-write-wins
    :func:`upsert`, the result is independent of how rows are split into
    batches (apply order, micro-batch boundaries, replays), which is
    what makes a streaming CDC apply replayable and exactly-once.

    ``order_cols`` must totally order rows within a key (e.g.
    ``[ts, event_id]``) or the winner is undefined. One shuffle: union +
    per-key window, rn = 1.
    """
    from pyspark.sql.window import Window

    keys, order_cols = list(keys), list(order_cols)
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    allrows = updates if base is None else base.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_apply(
    dim: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str,
    *,
    end_of_time: int = 2**62,
) -> DataFrame:
    """SCD Type-2 apply: maintain full attribute HISTORY per key as
    effective-dated rows ``(keys, value_cols, valid_from, valid_to,
    is_current)`` — the warehouse dimension-versioning pattern (Kimball
    SCD2), as one declarative plan.

    ``dim`` is the current history (or None to bootstrap); ``updates``
    carries ``(keys, value_cols, ts_col)`` observations. Per key, each
    CHANGE in the value tuple (in ``ts_col`` order) opens a new version
    effective [ts, next-change ts); unchanged observations are no-ops
    (idempotent replay). Open versions end at ``end_of_time`` with
    ``is_current`` true.

    Scale shape: one union + one per-key window pass — no driver loops,
    no row-at-a-time Python; history length per key is bounded by the
    number of genuine changes, never by observation count (consecutive
    duplicates collapse via the lag digest compare).
    """
    from pyspark.sql.window import Window

    keys, value_cols = list(keys), list(value_cols)
    obs = updates.select(
        *keys, *value_cols, F.col(ts_col).cast("long").alias("_ts")
    )
    if dim is not None:
        # re-open existing history as observations at their valid_from;
        # the rebuild is then a pure function of the observation set
        prior = dim.select(
            *keys, *value_cols, F.col("valid_from").cast("long").alias("_ts")
        )
        obs = prior.unionByName(obs)

    w = Window.partitionBy(*keys).orderBy("_ts")
    dig = _digest(value_cols)
    changed = (
        obs.withColumn("_dig", dig)
        .withColumn("_prev", F.lag("_dig").over(w))
        # first observation per key, or a different value tuple than the
        # immediately-preceding observation, opens a version
        .filter(F.col("_prev").isNull() | (F.col("_dig") != F.col("_prev")))
    )
    w2 = Window.partitionBy(*keys).orderBy("_ts")
    return (
        changed.withColumn("_next", F.lead("_ts").over(w2))
        .select(
            *keys,
            *value_cols,
            F.col("_ts").alias("valid_from"),
            F.coalesce("_next", F.lit(end_of_time)).alias("valid_to"),
            F.col("_next").isNull().alias("is_current"),
        )
    )


def scd2_as_of(history: DataFrame, ts: int) -> DataFrame:
    """The dimension as it was at time ``ts``: the version whose
    [valid_from, valid_to) interval covers it. Pure filter — partition
    pruning applies when history is stored partitioned on is_current."""
    return history.filter(
        (F.col("valid_from") <= F.lit(ts)) & (F.lit(ts) < F.col("valid_to"))
    ).drop("is_current")
