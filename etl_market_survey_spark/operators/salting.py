"""Hot-key salting for skewed equi-joins (VERDICT r4 item 8).

The skew problem: an equi-join key with a heavy hitter (a coarse soundex
code, a frequent prefix token) lands that key's ENTIRE candidate volume
in one shuffle task — the straggler that defines wall-clock at corpus
scale. AQE's skew-join split helps sort-merge stages but cannot split
the *logical* key; salting can.

The classic hot-key recipe, made pair-identical by construction:

* find the hot keys from the key histogram (an aggregate the callers
  already compute for shuffle sizing) — BOUNDED by contract: hot keys
  are few, and the collect is capped;
* probe side: rows with a hot key get ``_salt = xxhash64(row id) %
  n_salt``; cold keys get ``_salt = 0``;
* build side: rows with a hot key replicate to ALL ``n_salt`` salts
  (explode over a sequence); cold keys to ``[0]`` only;
* join on ``(key, _salt)``.

Every original pair still meets on exactly one salt value (the probe
row's), so the output multiset is IDENTICAL to the unsalted join —
proven row-for-row in tests — while a hot key's candidates now spread
over ``n_salt`` shuffle partitions, cutting the max task by ``n_salt``
for the cost of replicating only the hot build rows.

Sibling of :mod:`.skew` (salted two-phase groupBy aggregation and the
replicate-the-whole-small-side shuffle join): this module is the
HOT-KEY-ONLY variant for self-joins, where replicating everything would
multiply the dominant cost instead of the rare one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# never collect more hot keys than this — if a histogram has more
# heavy hitters than _MAX_HOT_KEYS, the threshold is set too low for
# the data and salting everything would just re-shuffle the problem
_MAX_HOT_KEYS = 50_000


def hot_keys(df: DataFrame, key: str, threshold: int) -> list:
    """Keys whose row count exceeds ``threshold`` (driver-side, bounded:
    capped at ``_MAX_HOT_KEYS`` — raises if the cap is hit, because that
    means the threshold does not describe 'a few heavy hitters')."""
    rows = (
        df.groupBy(key)
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") > threshold)
        .select(key)
        .limit(_MAX_HOT_KEYS + 1)
        .collect()
    )
    if len(rows) > _MAX_HOT_KEYS:
        raise ValueError(
            f"more than {_MAX_HOT_KEYS} keys exceed threshold {threshold}; "
            "raise the threshold — salting every key is a repartition, "
            "not a skew fix"
        )
    return [r[0] for r in rows]


def salt_probe(
    df: DataFrame, key: str, salt_src: Column, hot: list, n_salt: int
) -> DataFrame:
    """Append ``_salt``: ``xxhash64(salt_src) % n_salt`` for hot keys,
    0 for cold ones. ``salt_src`` must be deterministic per row (an id),
    so reruns and retries salt identically."""
    is_hot = F.col(key).isin(hot) if hot else F.lit(False)
    return df.withColumn(
        "_salt",
        F.when(is_hot, F.pmod(F.xxhash64(salt_src), F.lit(n_salt)))
        .otherwise(F.lit(0))
        .cast("int"),
    )


def replicate_build(df: DataFrame, key: str, hot: list, n_salt: int) -> DataFrame:
    """Explode hot-key rows to every salt in [0, n_salt); cold rows keep
    a single ``_salt = 0`` replica."""
    is_hot = F.col(key).isin(hot) if hot else F.lit(False)
    return df.withColumn(
        "_salt",
        F.explode(
            F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salt - 1)))
            .otherwise(F.array(F.lit(0)))
            .cast("array<int>")
        ),
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_src: Column,
    *,
    hot: list,
    n_salt: int,
    how: str = "inner",
) -> DataFrame:
    """``probe.join(build, key)`` with hot-key salting; drops ``_salt``
    from the result. Output multiset identical to the unsalted join.

    Only probe-preserving joins are supported: the build side's hot rows
    are replicated to every salt, so a right/full outer join would emit
    one null-extended row PER REPLICA for an unmatched hot build row,
    breaking the identical-multiset contract. Those joins must go
    through the unsalted path (or swap sides for right outer)."""
    _ok = {
        "inner", "cross", "left", "leftouter", "semi", "leftsemi",
        "anti", "leftanti",
    }
    if how.lower().replace("_", "") not in _ok:
        raise ValueError(
            f"salted_join does not support how={how!r}: build-side "
            "replication breaks right/full outer semantics (unmatched hot "
            "build rows would emit one null row per salt replica)"
        )
    if n_salt < 2 or not hot:
        return probe.join(build, key, how)
    p = salt_probe(probe, key, salt_src, hot, n_salt)
    b = replicate_build(build, key, hot, n_salt)
    return p.join(b, [key, "_salt"], how).drop("_salt")
