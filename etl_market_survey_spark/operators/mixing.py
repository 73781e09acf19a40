"""Deterministic corpus mixing (beyond reference — training-data export).

Pretraining runs consume a *mixture*: "x% web, y% code, z% books",
reshuffled globally so a training shard never sees one source in a
block. Both properties must be reproducible — the same corpus and the
same recipe must yield the same token stream on any cluster layout, or
ablations are not comparable. Seeded ``df.sample`` cannot promise that
(Bernoulli per partition, layout-dependent); everything here derives
from content hashes instead (md5 — the portable choice the DuckDB
oracle replays), the same construction as the q50 split and
operators/sampling.

Pipeline:

1. **Quota allocation** — mixture weights + total budget -> exact
   per-source row counts (largest-remainder rounding, deterministic,
   sums to exactly ``total`` when the corpus can supply it).
2. **Exact per-source draw** — bottom-k by ``md5(seed, id)`` within each
   source: a uniform k-subset (bottom-k sketch argument), independent
   of row order and engine. Scale shape: rank-by-hash rides the
   WindowGroupLimit rewrite with the *max* quota as the literal limit
   (map-side trim to k_max per source per task), then the per-source
   quota filter applies via a broadcast join — no stage sees more than
   k_max x n_partitions rows per source.
3. **Global deterministic shuffle** — order by ``md5(shuffle_seed, id)``:
   a content-keyed permutation, so adjacent training examples are
   source-interleaved. Exported with a range-partitioned sort (Spark's
   ``orderBy`` on write), never a single-reducer window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _hash_rank, sql_hash_rank
from .windows import top_k_per_group


def allocate_quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) apportionment of ``total`` rows to
    sources proportionally to ``weights`` — deterministic, exact sum."""
    wsum = float(sum(weights.values()))
    if wsum <= 0 or total < 0:
        raise ValueError("weights must sum > 0 and total >= 0")
    shares = {s: total * w / wsum for s, w in weights.items()}
    base = {s: int(shares[s]) for s in weights}
    leftover = total - sum(base.values())
    # ties broken by source name for determinism
    order = sorted(weights, key=lambda s: (-(shares[s] - base[s]), s))
    for s in order[:leftover]:
        base[s] += 1
    return base


def temperature_weights(weights: dict[str, float], tau: float) -> dict[str, float]:
    """Temperature-scaled mixture weights ``w^(1/tau)`` (the standard
    multilingual/multi-source rebalancing: tau > 1 flattens toward
    uniform, tau < 1 sharpens toward the head, tau = 1 is identity).
    Feed the result to :func:`weighted_mix` / :func:`sql_weighted_mix`;
    quota allocation downstream renormalizes, so no normalization here.
    Driver-side pure function of the recipe — engine-identical by
    construction."""
    if tau <= 0:
        raise ValueError("tau must be > 0")
    return {s: float(w) ** (1.0 / tau) for s, w in weights.items()}


def weighted_mix(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    total: int,
    id_cols: Sequence[str],
    seed: int = 42,
    shuffle_seed: int = 43,
) -> DataFrame:
    """Deterministic weighted mixture of ``total`` rows across sources,
    globally hash-shuffled. Adds ``mix_key`` (the shuffle sort key); the
    result is returned ordered by it. Sources not in ``weights`` are
    excluded; a source smaller than its quota contributes all its rows
    (documented under-delivery, like any real corpus cap).
    """
    quotas = allocate_quotas(weights, total)
    k_max = max(quotas.values()) if quotas else 0
    kdf = df.sparkSession.createDataFrame(
        [(s, k) for s, k in quotas.items()], f"{source_col} string, _quota long"
    )
    in_scope = df.filter(F.col(source_col).isin(list(quotas)))
    ranked = top_k_per_group(
        in_scope,
        [source_col],
        [_hash_rank(id_cols, seed)] + [F.col(c) for c in id_cols],
        k_max,
        rank_col="_rk",
    )
    drawn = (
        ranked.join(F.broadcast(kdf), source_col)
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota")
    )
    return drawn.withColumn("mix_key", _hash_rank(id_cols, shuffle_seed)).orderBy(
        "mix_key", *id_cols
    )


def sql_weighted_mix(
    table: str,
    source_col: str,
    weights: dict[str, float],
    total: int,
    id_exprs: Sequence[str],
    seed: int = 42,
    shuffle_seed: int = 43,
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`weighted_mix` — same quotas, same hashes."""
    quotas = allocate_quotas(weights, total)
    cases = " ".join(f"WHEN '{s}' THEN {k}" for s, k in quotas.items())
    ids = ", ".join(id_exprs)
    srcs = ", ".join(f"'{s}'" for s in quotas)
    # default '*' must not leak the internal _rk from the ranked CTE —
    # the Spark path drops it, so the mirror must too (DuckDB EXCLUDE)
    outer_select = "* EXCLUDE (_rk)" if select.strip() == "*" else select
    return f"""
WITH ranked AS (
  SELECT {select},
         ROW_NUMBER() OVER (
           PARTITION BY {source_col}
           ORDER BY {sql_hash_rank(id_exprs, seed)}, {ids}
         ) AS _rk
  FROM {table}
  WHERE {source_col} IN ({srcs})
)
SELECT {outer_select}, {sql_hash_rank(id_exprs, shuffle_seed)} AS mix_key
FROM ranked
WHERE _rk <= (CASE {source_col} {cases} END)
ORDER BY mix_key, {ids}
"""
