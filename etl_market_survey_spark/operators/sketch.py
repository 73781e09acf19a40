"""Count-min sketch heavy hitters: bounded-state candidate generation +
exact verification.

The scale rung above exact-count heavy hitters (q61): when the
vocabulary outgrows a shuffle, the exact groupBy(token) carries the full
per-partition vocabulary. The CMS flow (Cormode & Muthukrishnan 2005)
bounds every exchange by the sketch size instead:

1. **Build** — each token occurrence increments ``depth`` buckets
   ``h_i(tok) = xxhash64(i, tok) mod width``. As a DataFrame plan this is
   a map (bucket columns) + explode to (d, bucket) + groupBy(d, bucket):
   map-side combine collapses each task's stream to <= depth*width
   partial rows, so the shuffle is O(tasks * depth * width) regardless of
   vocabulary or corpus size.
2. **Probe** — the finished sketch is depth*width longs (~32 KB at
   4x1024): it collects to the driver and folds into the probe plan as
   literal arrays, so estimation is a map-only expression
   ``least(sketch_d[h_d(tok)] ...)`` — no join, no shuffle.
3. **Verify** — CMS never underestimates, so candidates (estimate >=
   threshold) are a SUPERSET of the true heavy hitters; an exact groupBy
   over only the surviving occurrences (a vanishing fraction when the
   distribution is heavy-tailed) re-counts them. The final result is
   therefore EXACTLY ``GROUP BY token HAVING count >= threshold`` — the
   sketch only prunes, never decides.

Deterministic: xxhash64 seeds are the row indices, no RNG.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(tok: Column, i: int, width: int) -> Column:
    return F.pmod(F.xxhash64(F.lit(i), tok), F.lit(width))


def cms_build(
    tokens: DataFrame, token_col: str, depth: int = 4, width: int = 1024
) -> list[list[int]]:
    """Build the sketch over one pass of ``tokens`` (one row per
    occurrence). Returns ``depth`` rows of ``width`` counters."""
    tok = F.col(token_col)
    long = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"), _bucket(tok, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    counts = long.groupBy("d", "bucket").agg(F.count("*").alias("c")).collect()
    sketch = [[0] * width for _ in range(depth)]
    for r in counts:
        sketch[r["d"]][r["bucket"]] = r["c"]
    return sketch


def cms_estimate(tok: Column, sketch: list[list[int]]) -> Column:
    """Point-query estimate as a map-only expression (sketch rows become
    literal arrays; element_at is 1-based)."""
    width = len(sketch[0])
    ests = [
        F.element_at(
            F.array(*[F.lit(int(c)) for c in row]), (_bucket(tok, i, width) + 1).cast("int")
        )
        for i, row in enumerate(sketch)
    ]
    return F.least(*ests)


def cms_heavy_hitters(
    tokens: DataFrame,
    token_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Exact tokens with global count >= threshold, CMS-pruned.

    Output: ``(token, cnt)``. Identical to the plain
    ``groupBy(token).count().filter(cnt >= threshold)`` — the sketch
    pass only bounds the exchange sizes.
    """
    sketch = cms_build(tokens, token_col, depth, width)
    survivors = tokens.filter(
        cms_estimate(F.col(token_col), sketch) >= F.lit(threshold)
    )
    return (
        survivors.groupBy(F.col(token_col).alias("token"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


# ---------------------------------------------------------------------------
# KMV ("theta") distinct sketch + set operations.
#
# The bounded-state rung above exact DISTINCT and the set-operation
# companion to approx_count_distinct (q56): a K-Minimum-Values sketch
# (Bar-Yossef et al. 2002; Dasgupta et al. 2016 theta-sketch framing)
# keeps the k smallest distinct hash values; theta = frac(kth value)
# estimates n_distinct ~= (k-1)/theta, and two sketches support union /
# intersection / Jaccard estimates the exact operators can't do without
# a full shuffle of both sides.
#
# Build is two scans, both map-side-bounded: (1) approx_count_distinct
# sizes the stream; (2) a literal hash-threshold filter keeps ~safety*k
# candidate rows (the only exchange), which dedupe and TakeOrdered to k
# on the driver. No per-task state beyond the HLL registers and the
# filter; the shuffle is O(k), independent of corpus size. Deterministic:
# xxhash64, no RNG — estimates are reproducible bit-for-bit.
# ---------------------------------------------------------------------------

_TWO63 = float(2**63)
_TWO64 = float(2**64)


def _frac(h: int) -> float:
    """Map a signed xxhash64 long to a uniform fraction in [0, 1)."""
    return (h + _TWO63) / _TWO64


class KmvSketch:
    """k smallest distinct hashes (sorted, signed-long order)."""

    def __init__(self, k: int, hashes: list[int]):
        self.k = k
        self.hashes = sorted(hashes)[:k]

    @property
    def theta(self) -> float:
        if len(self.hashes) < self.k:
            return 1.0  # saw everything: sketch IS the distinct set
        return _frac(self.hashes[-1])

    def estimate(self) -> float:
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta

    def union(self, other: "KmvSketch") -> "KmvSketch":
        k = min(self.k, other.k)
        return KmvSketch(k, sorted(set(self.hashes) | set(other.hashes))[:k])

    def _below_theta(self, theta: float) -> set[int]:
        return {h for h in self.hashes if _frac(h) < theta}

    def intersect_estimate(self, other: "KmvSketch") -> float:
        theta = min(self.theta, other.theta)
        both = self._below_theta(theta) & other._below_theta(theta)
        return len(both) / theta

    def jaccard(self, other: "KmvSketch") -> float:
        theta = min(self.theta, other.theta)
        a, b = self._below_theta(theta), other._below_theta(theta)
        denom = len(a | b)
        return (len(a & b) / denom) if denom else 0.0


def kmv_build(df: DataFrame, col: str, k: int = 1024) -> KmvSketch:
    """Build a KMV sketch of ``df[col]``'s distinct values."""
    hdf = df.select(F.xxhash64(F.col(col)).alias("h"))
    approx = hdf.agg(F.approx_count_distinct("h").alias("c")).collect()[0]["c"]
    if approx <= 8 * k:
        rows = hdf.distinct().orderBy("h").limit(k).collect()
        return KmvSketch(k, [r["h"] for r in rows])
    safety = 4.0
    while True:
        cutoff = int(min(safety * k / approx, 1.0) * _TWO64 - _TWO63)
        rows = (
            hdf.filter(F.col("h") < F.lit(cutoff))
            .distinct()
            .orderBy("h")
            .limit(k)
            .collect()
        )
        if len(rows) >= k or cutoff >= 2**63 - 1:
            return KmvSketch(k, [r["h"] for r in rows])
        safety *= 4.0  # HLL underestimated the tail; widen (rare)


# ---------------------------------------------------------------------------
# KMV as a GROUPED DataFrame aggregate (the distributed face of
# KmvSketch, whose algebra above is driver-side).
#
# Build is two bounded phases: (1) mapInPandas keeps, per task, the k
# smallest distinct hashes per observed group (state = one small sorted
# array per group — never the rows); (2) groupBy(group) merges partials
# with pure JVM array expressions (flatten -> distinct -> sort -> first
# k), so the only exchange carries <= tasks x k hashes per group. All
# estimates and set operations are then column expressions over the
# (group, hashes) frame — union/intersection/Jaccard across two sketch
# frames is a small-array join, no rescan of either input.
#
# Exactness contract: a sketch with fewer than k hashes saw EVERY
# distinct hash of its group, so estimate == exact distinct count and
# the pairwise set algebra is exact set algebra (theta = 1 both sides).
# q103 gates exactly that path; saturated-sketch error bounds are
# asserted in tests.
# ---------------------------------------------------------------------------


def _frac_col(h: Column) -> Column:
    """SQL mirror of ``_frac``: signed long -> uniform [0, 1)."""
    return (h.cast("double") + F.lit(_TWO63)) / F.lit(_TWO64)


def kmv_grouped(
    df: DataFrame, group_cols: Sequence[str], col: str, k: int = 1024
) -> DataFrame:
    """Per-group KMV sketches: ``(group..., hs array<long>)`` with
    ``hs`` = the k smallest distinct xxhash64 values of ``col``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    group_cols = list(group_cols)
    hashed = df.select(*group_cols, F.xxhash64(F.col(col)).alias("_h"))
    schema = StructType(
        [hashed.schema[c] for c in group_cols] + [StructField("hs", ArrayType(LongType()))]
    )

    def partial(batches):
        state: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                arr = np.unique(sub["_h"].to_numpy(dtype=np.int64))
                prev = state.get(key)
                merged = arr if prev is None else np.unique(np.concatenate([prev, arr]))
                state[key] = merged[:k]
        if state:
            yield pd.DataFrame(
                [(*key, hs.tolist()) for key, hs in state.items()],
                columns=group_cols + ["hs"],
            )

    partials = hashed.mapInPandas(partial, schema)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("hs")))), 1, k
    )
    return partials.groupBy(*group_cols).agg(merged.alias("hs"))


def kmv_estimate_col(hs: Column, k: int) -> Column:
    """Distinct-count estimate from a sketch column; exact when the
    sketch is unsaturated (saw < k distinct hashes)."""
    saturated = F.size(hs) >= k
    theta = _frac_col(F.element_at(hs, k))
    return F.when(saturated, F.lit(float(k - 1)) / theta).otherwise(
        F.size(hs).cast("double")
    )


def kmv_set_ops_col(a: Column, b: Column, k: int):
    """(union_est, intersect_est, jaccard) column triple for two sketch
    columns built with the same hash and k."""
    both_unsat = (F.size(a) < k) & (F.size(b) < k)
    theta = F.when(
        both_unsat, F.lit(1.0)
    ).otherwise(
        F.least(
            F.when(F.size(a) >= k, _frac_col(F.element_at(a, k))).otherwise(F.lit(1.0)),
            F.when(F.size(b) >= k, _frac_col(F.element_at(b, k))).otherwise(F.lit(1.0)),
        )
    )
    below = lambda c: F.filter(c, lambda h: _frac_col(h) < theta)  # noqa: E731
    a_t, b_t = below(a), below(b)
    inter = F.size(F.array_intersect(a_t, b_t))
    uni = F.size(F.array_union(a_t, b_t))
    union_sketch = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    union_est = kmv_estimate_col(union_sketch, k)
    intersect_est = inter.cast("double") / theta
    jaccard = F.when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(
        F.lit(0.0)
    )
    return union_est, intersect_est, jaccard


# ---------------------------------------------------------------------------
# Portable theta sketch with error bounds (the "theta-sketch
# intersection error bounds surfaced as columns" roadmap item, done one
# better: the ESTIMATE ITSELF is cross-engine replayable, so the
# saturated path — not just the exact unsaturated path — can be
# exact-gated against DuckDB).
#
# Hash: first 13 hex digits of md5(seed, id) as a bigint in [0, 16^13).
# 16^13 = 2^52, so frac = (h + 0.5) / 2^52 is EXACT in a double (the
# numerator (2h+1) has <= 53 bits and the division is a power-of-two
# scaling), 1 - frac is exact too, and every remaining step of the
# estimator ((k-1)/theta) and its normal-approximation binomial bounds
# (sqrt((k-1)(1-theta))/theta, est -+ z*sd, floor at k) is ONE correctly
# rounded IEEE-754 operation — bit-identical in any engine. DuckDB
# replays the whole thing from the raw keys.
#
# Scale: the bottom-k ranking rides the WindowGroupLimit rewrite (each
# map task trims to its local k smallest before the shuffle), so a
# 10 B-distinct group moves k x n_map_partitions hashes, and the final
# per-group state is exactly k longs. num_std=2 gives ~95% coverage;
# the estimator RSE is ~1/sqrt(k-2) (Beyer et al. 2007).
# ---------------------------------------------------------------------------

_M52 = float(16**13)  # 2^52


def _md5_hash52(id_cols: Sequence[str], seed: int) -> Column:
    h = F.md5(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols]
        )
    )
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long")


def sql_md5_hash52(id_exprs: Sequence[str], seed: int) -> str:
    """DuckDB mirror of ``_md5_hash52`` — keep in lockstep."""
    parts = ", ".join(f"CAST({e} AS VARCHAR)" for e in id_exprs)
    h = f"md5(concat_ws(chr(31), '{seed}', {parts}))"
    return f"CAST(concat('0x', substr({h}, 1, 13)) AS BIGINT)"


def theta_sketch_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    id_cols: Sequence[str],
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Per-group bottom-k sketch on the portable 52-bit md5 hash:
    ``(group..., hs array<long>)`` with ``hs`` the k smallest DISTINCT
    hash values, ascending. Distinct-on-hash collapses md5-prefix
    collisions identically in every engine."""
    from .windows import top_k_per_group

    group_cols = list(group_cols)
    hashed = (
        df.select(*group_cols, _md5_hash52(id_cols, seed).alias("_h")).distinct()
    )
    trimmed = top_k_per_group(
        hashed, group_cols, [F.col("_h").asc()], k, rank_col="_rk"
    ).drop("_rk")
    return trimmed.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("_h")).alias("hs")
    )


def theta_bounds_col(
    hs: Column, k: int, num_std: float = 2.0
) -> tuple[Column, Column, Column]:
    """(est, lb, ub) distinct-count columns for a ``theta_sketch_grouped``
    sketch. Unsaturated sketch (saw < k distinct hashes) -> all three
    equal the exact count. Saturated -> est = (k-1)/theta with
    theta = frac(k-th smallest hash); r = k-1 retained below theta is
    Binomial(n, theta), so sd = sqrt((k-1)(1-theta))/theta and the
    bounds are est -+ num_std*sd, floored at k (we SAW k distinct)."""
    sat = F.size(hs) >= k
    exact = F.size(hs).cast("double")
    theta = (F.element_at(hs, k).cast("double") + F.lit(0.5)) / F.lit(_M52)
    r = F.lit(float(k - 1))
    est_sat = r / theta
    sd = F.sqrt(r * (F.lit(1.0) - theta)) / theta
    z = F.lit(float(num_std))
    est = F.when(sat, est_sat).otherwise(exact)
    lb = F.when(sat, F.greatest(est_sat - z * sd, F.lit(float(k)))).otherwise(exact)
    ub = F.when(sat, est_sat + z * sd).otherwise(exact)
    return est, lb, ub


def sql_theta_bounds(k: int, num_std: float = 2.0) -> dict[str, str]:
    """DuckDB mirrors of ``theta_bounds_col`` over a column ``theta``
    (the k-th smallest hash frac) for the saturated path — keep in
    lockstep. Keys: est, lb, ub."""
    r = float(k - 1)
    z = float(num_std)
    est = f"({r!r} / theta)"
    sd = f"(SQRT({r!r} * (1.0 - theta)) / theta)"
    return {
        "est": est,
        "lb": f"GREATEST({est} - {z!r} * {sd}, {float(k)!r})",
        "ub": f"({est} + {z!r} * {sd})",
    }


def kmv_merge_agg(hs_col: str | Column, k: int) -> Column:
    """Aggregate expression merging KMV sketch rows UP a grouping
    hierarchy: union all hashes, keep the k smallest distinct — the
    defining mergeability of KMV (merge(sketch(A), sketch(B)) ==
    sketch(A ∪ B), exactly, saturated or not). JVM array expressions
    end to end; the exchange carries <= k hashes per input sketch.

    This is what makes one fine-grain sketch pass serve EVERY rollup
    level: distinct counts for (a, b), (a) and () derive from the same
    base sketches without touching the input again."""
    c = F.col(hs_col) if isinstance(hs_col, str) else hs_col
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(c)))), 1, k
    )
