"""Rendezvous (highest-random-weight) sharding for stable data export.

Training-data exports need shard assignment that is (a) deterministic
for a given key on any engine/layout, and (b) STABLE under shard-count
changes: growing S to S+1 shards must relocate only ~1/(S+1) of the
keys, never reshuffle everything (the modulo-hash failure mode:
``hash(k) % S`` relocates (S-1)/S of all keys when S changes, blowing
every downstream cache/checkpoint association). Rendezvous hashing
(Thaler & Ravishankar 1998) gives exactly that: each key goes to the
shard with the highest ``h(key, shard)`` — when a shard is added, a key
moves only if the NEW shard wins its rendezvous, which happens with
probability 1/(S+1).

Engine-portable: the weight is the md5 hex of ``key <US> shard`` (the
same portable-hash construction as sampling/mixing), so the DuckDB
oracle replays assignments bit for bit and a re-ingest on any cluster
reproduces the same shards.

Scale shape: map-only — S hash evaluations per row (S = shard count,
small), argmax via struct-ordered array_max, no shuffle. Follow with a
``partitionBy(shard)`` write for the physical layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _weight(id_cols: Sequence[str], shard: int) -> Column:
    return F.md5(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in id_cols], F.lit(str(shard))
        )
    )


def assign_shards(
    df: DataFrame, id_cols: Sequence[str], n_shards: int, out: str = "shard"
) -> DataFrame:
    """Adds ``out`` = the rendezvous winner in [0, n_shards) for each
    row's key. Ties (md5 collisions) break to the lower shard id via the
    struct order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    cands = F.array(
        *[
            F.struct(
                _weight(id_cols, s).alias("w"), F.lit(-s).alias("neg")
            )
            for s in range(n_shards)
        ]
    )
    return df.withColumn(out, -F.array_max(cands)["neg"])


def sql_assign_shards(id_exprs: Sequence[str], n_shards: int) -> str:
    """DuckDB mirror of the assignment expression (same weights, same
    lowest-shard tie rule)."""
    ids = ", ".join(f"CAST({e} AS VARCHAR)" for e in id_exprs)
    entries = ", ".join(
        f"struct_pack(w := md5(concat_ws(chr(31), {ids}, '{s}')), neg := {-s})"
        for s in range(n_shards)
    )
    return f"(-list_max([{entries}]).neg)"
