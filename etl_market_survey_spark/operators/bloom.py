"""Bloom-filter semi-join pruning (beyond reference — 100 TB join path).

The reference's only join fabric is pandas index alignment (SURVEY §2.3,
`clean_beta_scan.py:138-141`); at cluster scale the analogous problem is
"filter a huge fact table by a key set that is too big to broadcast as a
hash relation but whose *bloom filter* is small". Spark's own runtime
row-level bloom (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does
this automatically for eligible shuffle joins; this module is the
explicit, composable version for when the optimizer can't (probe side
built in Python, bloom reused across queries, or creation-side filters
the rule won't look through), and it works on any Spark build since the
classic PySpark API exposes neither ``stat.bloomFilter`` nor SQL
``might_contain``.

Everything hot stays JVM-side or Arrow-vectorized:

- **Build** (one pass over the dim keys): k = ``n_hashes`` bit positions
  per key via ``xxhash64(key, seed_i) pmod n_bits`` — JVM expressions —
  then ``groupBy(pos >> 6).agg(bit_or(1 << (pos & 63)))``: a map-side-
  combined aggregation whose shuffle is at most ``n_bits/64`` words, not
  the key set. Only the set words are collected (sparse), so the driver
  cost is min(set bits, n_bits/64) longs.
- **Probe** (scan-side, zero shuffle): the k positions are again JVM
  ``xxhash64`` columns; the only Python is a vectorized numpy gather of
  the broadcast bitmap (`bits[pos>>6] >> (pos&63)`), batched by Arrow.
- **Exactness**: ``bloom_semi_join`` follows the probe with a real
  left-semi join on the survivors, so false positives are eliminated and
  the result is EXACTLY ``fact SEMI JOIN dim`` — the bloom only shrinks
  the rows that reach the shuffle. With a 1% bloom and a 0.1%-selective
  key set, the semi-join shuffles ~1.1% of the fact instead of 100%.

Sizing: n_bits = -n ln(fpp)/ln2², k = (n_bits/n) ln2 (standard optima).
A 100M-key set at 1% fpp is ~120 MB of bitmap — broadcastable; at 1B
keys prefer fpp=5% (~750 MB) or partition the bloom by key range.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_hashes: int, n_bits: int, seed: int) -> list[Column]:
    # xxhash64 is Spark's partition-invariant 64-bit hash; per-hash seeds
    # give k independent functions. pmod keeps positions in [0, n_bits).
    return [
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(n_bits)).cast("long")
        for i in range(n_hashes)
    ]


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes), n_bits rounded up to a multiple of 64."""
    n_keys = max(n_keys, 1)
    n_bits = max(64, int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))))
    n_bits = ((n_bits + 63) // 64) * 64
    n_hashes = max(1, round(n_bits / n_keys * math.log(2)))
    return n_bits, n_hashes


def build_bloom(
    keys: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    seed: int = 42,
) -> np.ndarray:
    """Distributed bloom build → driver-side uint64 bitmap.

    The shuffle carries (word_index, partial_mask) pairs — bounded by
    n_bits/64 per map task regardless of key count — and the collect is
    only the words with at least one set bit.
    """
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, n_hashes, n_bits, seed))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) AS int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    signed = np.zeros(n_bits // 64, dtype=np.int64)
    for row in words:
        signed[row["word"]] = row["mask"]
    return signed.view(np.uint64)  # reinterpret int64 masks bit-for-bit


def bloom_filter_df(
    fact: DataFrame,
    key_col: str,
    bits: np.ndarray,
    n_hashes: int,
    seed: int = 42,
) -> DataFrame:
    """Keep fact rows whose key MIGHT be in the bloom (has false
    positives, no false negatives). Scan-side only — no shuffle."""
    n_bits = bits.shape[0] * 64
    spark = fact.sparkSession
    bc = spark.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def _probe(*pos_cols: pd.Series) -> pd.Series:
        b = bc.value
        out = None
        for pos in pos_cols:
            p = pos.to_numpy(dtype=np.int64)
            hit = (b[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)
            hit = hit.astype(bool)
            out = hit if out is None else (out & hit)
        return pd.Series(out)

    # asNondeterministic: the probe IS deterministic, but declaring it so
    # lets InferFiltersFromConstraints clone the Python eval stage onto
    # the other side of a downstream equi-join (where it is pure waste —
    # every dim key passes its own bloom). Marking it nondeterministic
    # pins the filter where it's written: directly over the fact scan.
    probe = _probe.asNondeterministic()
    return fact.filter(probe(*_positions(F.col(key_col), n_hashes, n_bits, seed)))


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    dim_key_col: str | None = None,
    fpp: float = 0.01,
    n_keys_hint: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """EXACT ``fact LEFT SEMI JOIN dim_keys`` with bloom pre-pruning.

    The bloom eliminates ~(1-fpp) of the non-matching fact rows before
    the semi-join shuffle; the final left-semi join removes the bloom's
    false positives, so results equal a plain semi-join bit-for-bit.
    ``n_keys_hint`` skips the sizing count when the caller knows the
    distinct-key cardinality (at scale, pass an estimate — fpp only
    degrades gracefully if it's low).
    """
    dk = dim_key_col or key_col
    distinct = dim_keys.select(F.col(dk).alias(key_col)).distinct()
    n = n_keys_hint if n_keys_hint is not None else distinct.count()
    n_bits, n_hashes = bloom_params(n, fpp)
    bits = build_bloom(distinct, key_col, n_bits, n_hashes, seed)
    pruned = bloom_filter_df(fact, key_col, bits, n_hashes, seed)
    return pruned.join(distinct, on=key_col, how="left_semi")
