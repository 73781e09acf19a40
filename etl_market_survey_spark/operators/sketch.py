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
