"""Deterministic sampling (beyond reference — training-data pipeline).

Corpus curation needs "exactly k docs per language" (budget caps) and
"exactly this 1% forever" (eval holdouts) — semantics a seeded
`df.sample` cannot give: Bernoulli sampling is per-partition random (k
only in expectation, resample on repartition). Both ops here derive
randomness from a content hash, so the same inputs select the same rows
on any cluster layout, any engine (md5 is the portable choice — the
DuckDB oracle replays it), any rerun.

Scale: `sample_exact_per_group` is rank-by-hash ≤ k — it rides the same
WindowGroupLimit rewrite as top-k (each map task trims to k per group
before the shuffle; a 10 B-row group moves k × n_map_partitions rows,
not 10 B). `sample_fraction` is a stateless filter at the scan — no
shuffle, no state, composes with pushdown.

The hash-rank design is also WHY it's a uniform sample: md5(id) is
uniform on [0, 2^128), so the k smallest hashes are a uniform k-subset
(bottom-k sketch); disjoint fractions of the hash space give disjoint
deterministic splits (same construction as q50's train/val/test split).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import top_k_per_group


def _hash_rank(id_cols: Sequence[str], seed: int) -> Column:
    return F.md5(
        F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols])
    )


def sql_hash_rank(id_exprs: Sequence[str], seed: int) -> str:
    """DuckDB mirror of the rank hash — keep in lockstep."""
    parts = ", ".join(f"CAST({e} AS VARCHAR)" for e in id_exprs)
    return f"md5(concat_ws(chr(31), '{seed}', {parts}))"


def sample_exact_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_cols: Sequence[str],
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly min(k, group size) rows per group, uniform, deterministic.

    Rows are ranked by md5(seed, id) within each group; changing the seed
    redraws the sample, changing nothing else. ``id_cols`` must identify
    a row within its group (ties in the hash are broken by the ids
    themselves, so even hash collisions stay deterministic).
    """
    order = [_hash_rank(id_cols, seed)] + [F.col(c) for c in id_cols]
    return top_k_per_group(df, list(group_cols), order, k, rank_col="_rk").drop("_rk")


def sample_fraction(
    df: DataFrame,
    id_cols: Sequence[str],
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic ~fraction sample: keep rows whose hash falls in the
    first ``fraction`` of the hash space. Stateless filter — no shuffle;
    the same rows are kept on every engine, layout and rerun."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    # md5 hex is fixed-width lowercase, so lexicographic < equals numeric
    # < on the 128-bit value — one string compare, portable to any engine
    bound = format(int(fraction * (1 << 128)), "032x")[:32]
    return df.filter(_hash_rank(id_cols, seed) < F.lit(bound))


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_cols: Sequence[str],
    seed: int = 42,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Weighted sampling without replacement (top-k), Efraimidis-Spirakis
    A-ES: each row draws a deterministic uniform u from the portable
    md5 rank and competes with key u^(1/w) — equivalently ln(u)/w, which
    we use for numeric range. P(row in sample) increases with weight; the
    whole draw is a pure function of (seed, ids, weights): reproducible
    on any engine and any partitioning.

    The key is rounded to 9 decimals so cross-engine libm differences in
    ln() (last-ulp) cannot reorder ranks; ties break on the hash rank.
    One window shuffle (per ``by`` group if given, else global top-k via
    the same WindowGroupLimit trim as top_k_per_group).
    """
    from pyspark.sql.window import Window

    # 13 hex digits -> exact double in [0,1): 16^13 < 2^53
    h = _hash_rank(id_cols, seed)
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**13))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    ranked = df.withColumn("_es_key", key).withColumn("_es_tie", h)
    w = Window.partitionBy(*(by or [])).orderBy(
        F.col("_es_key").desc(), F.col("_es_tie")
    )
    return (
        ranked.withColumn("es_rank", F.row_number().over(w))
        .filter(F.col("es_rank") <= k)
        .drop("_es_key", "_es_tie")
    )


def sql_weighted_key(id_exprs: Sequence[str], weight_expr: str, seed: int) -> str:
    """DuckDB mirror of the A-ES key (rounded ln(u)/w)."""
    h = sql_hash_rank(id_exprs, seed)
    u = f"((CAST(concat('0x', substr({h}, 1, 13)) AS BIGINT) + 0.5) / {float(16**13)!r})"
    return f"ROUND(LN({u}) / CAST({weight_expr} AS DOUBLE), 9)"


# ---------------------------------------------------------------------------
# Temperature-based domain mixing (the data-mixing stage of a training
# pipeline: rebalance a corpus so low-resource domains are upsampled
# relative to their raw share — the alpha-sampling of multilingual
# pretraining, e.g. XLM-R's p_d ∝ n_d^alpha).
#
# Targets are integer-exact and engine-portable: with alpha = 0.5,
# weight_d = floor(sqrt(n_d * 1e6)) uses only the correctly-rounded
# IEEE sqrt (identical in every libm/SQL engine), and target_d =
# total * weight_d // sum(weights) is plain bigint arithmetic — so an
# oracle can recompute the exact same per-domain quotas from the raw
# counts. Selection reuses the deterministic hash-rank draw
# (sample_exact_per_group's ordering) with a per-domain k joined from
# the quota table: one counts pass (map-side combine), one window rank
# per domain, one broadcast join. Other alphas are supported but
# cross-engine parity is only guaranteed for 0.5 (pow is not
# correctly-rounded; documented, not hidden).
# ---------------------------------------------------------------------------


def temperature_targets(
    counts: dict[str, int], total_target: int, alpha: float = 0.5
) -> dict[str, int]:
    """Per-domain quotas: total * n_d^alpha / sum, floored, capped at
    n_d. Integer-exact for alpha=0.5 (see module note)."""
    import math

    if alpha == 0.5:
        w = {d: math.floor(math.sqrt(n * 1_000_000.0)) for d, n in counts.items()}
    else:
        w = {d: math.floor((float(n) ** alpha) * 1_000_000.0) for d, n in counts.items()}
    sw = sum(w.values())
    if sw == 0:
        return {d: 0 for d in counts}
    return {d: min(counts[d], total_target * w[d] // sw) for d in counts}


def temperature_mixing(
    df: DataFrame,
    domain_col: str,
    id_cols: Sequence[str],
    total_target: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Deterministic alpha-mixed sample: exactly ``target_d`` rows per
    domain (hash-rank draw, seed-redrawable), quotas from
    ``temperature_targets`` over one exact counts pass."""
    from pyspark.sql.window import Window

    counts = {
        r[domain_col]: r["n"]
        for r in df.groupBy(domain_col).agg(F.count("*").alias("n")).collect()
    }
    targets = temperature_targets(counts, total_target, alpha)
    spark = df.sparkSession
    quota = spark.createDataFrame(
        sorted(targets.items()), f"{domain_col} string, _quota long"
    )
    w = Window.partitionBy(domain_col).orderBy(
        _hash_rank(id_cols, seed), *[F.col(c) for c in id_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(quota), domain_col)
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota")
    )


def hash_ring_negatives(
    df: DataFrame,
    id_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training:
    each row gets ``k`` partners — its successors on the md5 hash ring
    (rank order of ``md5(seed, id)``, wrapping modulo N). The hash is
    uniform on content, so partners are uniform "random" negatives, yet
    the pairing is a pure function of (corpus, seed): reproducible on
    any engine, layout or rerun, and every row serves as a negative for
    exactly ``k`` anchors (balanced usage — rejection-free).

    Scale: the global rank is the two-phase scan (``prefix.
    distributed_rank`` — no single-reducer window); the partner lookup
    is one self-equi-join on the rank. Output: (id, j, neg_id), j in
    1..k. Requires k < N.

    Long-form output keys: ``id_col``, ``j``, ``neg_id``.
    """
    from .prefix import distributed_rank

    if k < 1:
        raise ValueError("k must be >= 1")
    hkey = F.conv(
        F.substring(_hash_rank([id_col], seed), 1, 15), 16, 10
    ).cast("long")
    base = df.select(F.col(id_col)).withColumn("_hk", hkey)
    ranked = distributed_rank(base, "_hk", [id_col], out="_r").drop("_hk")
    n = ranked.count()
    if k >= n:
        raise ValueError(f"k={k} must be < corpus size {n}")
    anchors = ranked.select(
        id_col,
        "_r",
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
    ).withColumn("_nr", (F.col("_r") - 1 + F.col("j")) % F.lit(n) + 1)
    ring = ranked.select(
        F.col("_r").alias("_nr"), F.col(id_col).alias("neg_id")
    )
    return anchors.join(ring, "_nr").select(
        id_col, F.col("j").cast("int").alias("j"), "neg_id"
    )


def sql_hash_ring_negatives(
    table: str, id_expr: str, k: int, seed: int = 42
) -> str:
    """DuckDB mirror of :func:`hash_ring_negatives` — keep in lockstep."""
    h = sql_hash_rank([id_expr], seed)
    js = ", ".join(str(j) for j in range(1, k + 1))
    return f"""
WITH h AS (
  SELECT {id_expr} AS _id,
         ('0x' || substr({h}, 1, 15))::BIGINT AS _hk
  FROM {table}
),
r AS (
  SELECT _id, ROW_NUMBER() OVER (ORDER BY _hk, _id) AS _r FROM h
),
n AS (SELECT COUNT(*) AS _c FROM r),
a AS (
  SELECT r._id, t.j, ((r._r - 1 + t.j) % n._c) + 1 AS _nr
  FROM r, n, UNNEST([{js}]) AS t(j)
)
SELECT a._id AS {id_expr}, CAST(a.j AS INT) AS j, r2._id AS neg_id
FROM a JOIN r r2 ON a._nr = r2._r
"""
