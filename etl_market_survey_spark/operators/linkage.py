"""Probabilistic record linkage (Fellegi & Sunter 1969) — the scoring
layer of entity resolution, sitting on top of the blocking/similarity
machinery already here (operators/simjoin prefix-filtered join,
operators/dedup MinHash/SimHash, operators/components survivors).

Beyond-reference operator (training-data curation: merging duplicate
metadata records — author/source/license rows — before corpus
assembly). The reference's closest analogue is the device-name
dimension enrichment (J3, /root/reference/scripts/devices_info.py:17-26),
which assumes keys already agree; linkage is what produces those keys
when they don't.

Model: for candidate pair (a, b) and field f with agreement indicator
agr_f, the match evidence is the log-likelihood ratio

    w_f = log2(m_f / u_f)            if agr_f  (agreement weight > 0)
    w_f = log2((1-m_f) / (1-u_f))    otherwise (disagreement weight < 0)

where m_f = P(agree | same entity), u_f = P(agree | different entity).
score = sum_f w_f; classify by the two Fellegi-Sunter thresholds
(match / possible / non-match). m/u come either as caller-supplied
priors or unsupervised from ``estimate_mu_em`` (Winkler's EM on the
agreement-pattern contingency table, below).

Scale shape: candidate generation is an equality-blocked self-join —
the shuffle is on the blocking key, each block's pair blowup is
block_size², never corpus²; skewed blocks split via AQE. Agreement
predicates are pure JVM expressions (levenshtein, abs-diff), and each
pair's score is a fixed-length sum of literal weights — no Python, no
UDF, deterministic bit-for-bit (same expression in any SQL engine with
the same levenshtein definition).
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldSpec:
    """One compared field: agreement predicate + m/u probabilities.

    kind: 'exact' | 'levenshtein' (string distance <= ``tol``) |
    'numeric' (abs difference <= ``tol``).
    """

    col: str
    kind: str = "exact"
    tol: float = 0.0
    m: float = 0.95
    u: float = 0.05

    def agreement(self, a: Column, b: Column) -> Column:
        if self.kind == "exact":
            return a.eqNullSafe(b)
        if self.kind == "levenshtein":
            return F.levenshtein(a, b) <= F.lit(int(self.tol))
        if self.kind == "numeric":
            return F.abs(a - b) <= F.lit(float(self.tol))
        raise ValueError(f"unknown field kind {self.kind!r}")

    @property
    def agree_weight(self) -> float:
        return math.log2(self.m / self.u)

    @property
    def disagree_weight(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


def blocked_pairs(
    df: DataFrame, id_col: str, block_cols: Sequence[str], payload_cols: Sequence[str]
) -> DataFrame:
    """Candidate pairs by equality blocking: self-join on the block key,
    ``id_a < id_b`` to keep each unordered pair once. Output columns:
    block key, ``id_a``/``id_b``, and ``{col}_a``/``{col}_b`` payloads."""
    block_cols = list(block_cols)
    payload_cols = list(payload_cols)
    sel = [F.col(id_col).alias("_id"), *block_cols, *payload_cols]
    base = df.select(*sel)
    a = base.select(
        F.col("_id").alias("id_a"),
        *block_cols,
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        *block_cols,
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
    )
    return a.join(b, on=block_cols).filter(F.col("id_a") < F.col("id_b"))


def score_pairs(pairs: DataFrame, fields: Sequence[FieldSpec]) -> DataFrame:
    """Add per-field agreement flags, the summed log2-likelihood
    ``score``, and nothing else (classification is a separate step so
    thresholds stay visible in the plan)."""
    out = pairs
    score = F.lit(0.0)
    for f in fields:
        agr = f.agreement(F.col(f"{f.col}_a"), F.col(f"{f.col}_b"))
        out = out.withColumn(f"agr_{f.col}", agr)
        score = score + F.when(
            F.col(f"agr_{f.col}"), F.lit(f.agree_weight)
        ).otherwise(F.lit(f.disagree_weight))
    return out.withColumn("score", score)


def classify(
    scored: DataFrame, lower: float, upper: float, col: str = "score"
) -> DataFrame:
    """Fellegi-Sunter three-way decision on the score column."""
    return scored.withColumn(
        "link_class",
        F.when(F.col(col) >= F.lit(upper), F.lit("match"))
        .when(F.col(col) <= F.lit(lower), F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def link_records(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    fields: Sequence[FieldSpec],
    lower: float,
    upper: float,
) -> DataFrame:
    """blocked_pairs -> score_pairs -> classify, in one call."""
    pairs = blocked_pairs(df, id_col, block_cols, [f.col for f in fields])
    return classify(score_pairs(pairs, fields), lower, upper)


# ---------------------------------------------------------------------------
# EM estimation of (m, u, prevalence) — Winkler's standard fixed-point
# on agreement-PATTERN counts (Winkler 1988; the unsupervised way to
# get the FieldSpec priors when no labeled pairs exist).
#
# Scale shape: ONE aggregation pass over the candidate pairs collapses
# them to <= 2^F pattern-count rows (map-side combinable groupBy on F
# booleans); EM then iterates on those counts driver-side — the
# iteration cost is independent of corpus size, so this is not a
# "driver loop over data", it's a loop over a 2^F-row contingency
# table. Deterministic given the init.
# ---------------------------------------------------------------------------


def agreement_patterns(pairs: DataFrame, fields: Sequence[FieldSpec]) -> DataFrame:
    """Collapse scored/unscored candidate pairs to agreement-pattern
    counts: one row per observed (agr_f1, ..., agr_fk) combination."""
    out = pairs
    for f in fields:
        name = f"agr_{f.col}"
        if name not in out.columns:
            out = out.withColumn(
                name, f.agreement(F.col(f"{f.col}_a"), F.col(f"{f.col}_b"))
            )
    keys = [f"agr_{f.col}" for f in fields]
    return out.groupBy(*keys).agg(F.count("*").cast("long").alias("n"))


def estimate_mu_em(
    pairs: DataFrame,
    fields: Sequence[FieldSpec],
    p_init: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
    max_iter: int = 200,
    tol: float = 1e-10,
) -> tuple[float, list[FieldSpec]]:
    """Fit match prevalence ``p`` and per-field (m, u) by EM over the
    agreement-pattern table. Returns ``(p, fields_with_fitted_mu)``.

    Conditional-independence model (the classic FS assumption):
    P(pattern | match) = prod m_f^a (1-m_f)^(1-a), same with u for
    non-match. Estimates are clamped to (1e-6, 1-1e-6) to keep the
    log-weights finite under degenerate fields.
    """
    rows = agreement_patterns(pairs, fields).collect()
    if not rows:
        raise ValueError("no candidate pairs")
    patterns = [
        (tuple(bool(r[f"agr_{f.col}"]) for f in fields), r["n"]) for r in rows
    ]
    # fixed fold order: float accumulation order must not depend on the
    # partition layout behind collect() (engine-determinism discipline)
    patterns.sort()
    total = float(sum(n for _, n in patterns))
    k = len(fields)
    p = p_init
    m = [m_init] * k
    u = [u_init] * k

    def clamp(x: float) -> float:
        return min(max(x, 1e-6), 1.0 - 1e-6)

    for _ in range(max_iter):
        # E-step: responsibility of the match class per pattern
        resp = []
        for pat, n in patterns:
            pm, pu = p, 1.0 - p
            for i, a in enumerate(pat):
                pm *= m[i] if a else (1.0 - m[i])
                pu *= u[i] if a else (1.0 - u[i])
            resp.append((pm / (pm + pu) if pm + pu > 0 else 0.0, pat, n))
        # M-step
        w_match = sum(w * n for w, _, n in resp)
        w_non = total - w_match
        new_p = clamp(w_match / total)
        new_m = [
            clamp(sum(w * n for w, pat, n in resp if pat[i]) / w_match)
            if w_match > 0
            else m[i]
            for i in range(k)
        ]
        new_u = [
            clamp(sum((1.0 - w) * n for w, pat, n in resp if pat[i]) / w_non)
            if w_non > 0
            else u[i]
            for i in range(k)
        ]
        delta = abs(new_p - p) + sum(
            abs(a - b) for a, b in zip(new_m + new_u, m + u)
        )
        p, m, u = new_p, new_m, new_u
        if delta < tol:
            break

    fitted = [
        FieldSpec(f.col, f.kind, f.tol, m=m[i], u=u[i])
        for i, f in enumerate(fields)
    ]
    return p, fitted


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernandez & Stolfo 1995) — the
# complement of equality blocking: order the corpus by a composite key
# and compare each record only to its w nearest neighbors in that
# order, catching near-duplicates whose blocking fields disagree
# (typos in the blocking key kill equality blocks; a sort mostly keeps
# neighbors adjacent).
#
# Scale shape: the global rank comes from operators/prefix
# .distributed_cumsum (two-phase bucketed scan — no single-partition
# window), and neighbor pairing is an equi-join on rank-bucket
# floor(rank/w): a row only ever meets the two buckets that can hold
# its w successors, so each side replicates at most 2x and the shuffle
# key is uniform by construction (ranks are a permutation — no skew,
# ever). Pair count is exactly n*w minus the tail, independent of key
# distribution.
# ---------------------------------------------------------------------------


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    order_col: str,
    window: int,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Candidate pairs (id_a, id_b) where b is one of a's ``window``
    successors in the total order of ``order_col`` (numeric, UNIQUE —
    compose a tiebreaker into the key if needed; ties would make ranks
    nondeterministic). Output mirrors ``blocked_pairs``:
    ``id_a``/``id_b`` + ``{col}_a``/``{col}_b`` payloads, plus both
    ranks."""
    from .prefix import distributed_cumsum

    payload_cols = list(payload_cols)
    base = df.select(F.col(id_col).alias("_id"), order_col, *payload_cols)
    ranked = distributed_cumsum(base, order_col, F.lit(1), out="_rank")
    a = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_rank").alias("rank_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        F.explode(
            F.array(
                F.floor(F.col("_rank") / window),
                F.floor(F.col("_rank") / window) + 1,
            )
        ).alias("_bkt"),
    )
    b = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_rank").alias("rank_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        F.floor(F.col("_rank") / window).alias("_bkt"),
    )
    return (
        a.join(b, "_bkt")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") <= F.col("rank_a") + window)
        )
        .drop("_bkt")
        .dropDuplicates(["id_a", "id_b"])
    )
