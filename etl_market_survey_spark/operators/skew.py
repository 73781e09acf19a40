"""Skew-handling utilities for 100 TB-scale shuffles.

AQE's skew-join splitting covers joins; these helpers cover the two other
hot-key patterns:

- ``salted_agg``: two-phase aggregation for skewed groupBy keys — shuffle
  first on (key, salt) so one hot key spreads over ``n_salts`` reducers,
  then combine the partials. Works for any algebraic aggregate
  (sum/count/min/max + the exact decimal sums in functions.stats).
- ``salt_broadcast_join``: replicate the small side per salt so a skewed
  large-side key spreads across tasks in a shuffle join. (Only needed when
  the small side is too big for plain broadcast but small enough x
  n_salts; otherwise just broadcast.)

Salting is deterministic (hash of stable columns, not rand()) so plans
stay reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase skew-tolerant aggregation.

    ``aggs``: out_name -> (in_col, fn) with fn in {'sum','count','min','max'}.
    Phase 1 groups by (keys..., salt) — the hot key's rows split across
    ``n_salts`` reducers; phase 2 combines partials per key (tiny shuffle).
    """
    keys = list(keys)
    salt_src = F.col(salt_from) if salt_from else F.spark_partition_id()
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.col(col)).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(F.col(col)).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif fn in ("min", "max"):
            phase1_aggs.append(getattr(F, fn)(F.col(col)).alias(f"_p_{out}"))
            phase2_aggs.append(getattr(F, fn)(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salt_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Shuffle join with the small side replicated per salt: the big
    side's hot key spreads over ``n_salts`` tasks."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.spark_partition_id()), F.lit(n_salts)).cast("int")
    )
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_rep, on=[key, "_salt"]).drop("_salt")
