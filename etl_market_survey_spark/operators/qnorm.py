"""Cross-source quantile normalization (beyond reference — corpus prep).

Heterogeneous corpus sources measure "the same" quantity on different
scales (document lengths, quality scores from different classifiers);
mixing them raw biases curation thresholds per source. Quantile
normalization maps every row onto the POOLED distribution: a row at the
p-th percentile of its source becomes the pooled distribution's value at
percentile p (the microarray-normalization classic, Bolstad et al.
2003) — after it, every source has the same marginal distribution.

Exact construction, no single-reducer stage:

1. within-source rank ``rk`` (window per source) and size ``n_s``;
2. pooled 1-based rank table over ALL values via
   ``prefix.distributed_rank`` (two-phase scan — the global order
   WITHOUT a global window), self-joined to (i, v_i, v_{i+1}) pairs;
3. the row's pooled position is the exact rational
   ``pos = (rk - 1)(N - 1) / (n_s - 1)``: integer div/mod give the
   bracketing pooled index and the interpolation fraction, so the only
   float op is one fused interpolation expression — engine-portable,
   replayed verbatim by the q130 oracle.

A single-row source (n_s = 1) maps to pooled position 0 by convention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .prefix import distributed_rank


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str],
    out: str = "norm_value",
) -> DataFrame:
    """Adds ``out``: the pooled-distribution value at the row's
    within-``group_col`` percentile. ``tiebreak_cols`` must totalize the
    order (they decide which of several equal values is "ranked higher",
    deterministically)."""
    w = Window.partitionBy(group_col).orderBy(value_col, *tiebreak_cols)
    ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_ns", F.count("*").over(Window.partitionBy(group_col))
    )

    pooled = distributed_rank(
        df.select(F.col(value_col).alias("_pv"), *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols]),
        "_pv",
        [f"_tb_{c}" for c in tiebreak_cols],
        out="_i",
    ).select("_i", "_pv")
    n_total = df.count()
    nxt = pooled.select((F.col("_i") - 1).alias("_i"), F.col("_pv").alias("_pv_next"))
    pairs = pooled.join(nxt, "_i", "left")  # (_i, v_i, v_{i+1}); last row has null next

    # long arithmetic throughout: int32*(N-1) overflows under ANSI once
    # pooled N exceeds ~46k; and the bracketing index must be *integer*
    # division (the oracle's `//`) — double division can land one ulp off
    # the floor for large N. num/den are nonnegative, so `div`/`pmod`
    # coincide with floor/mod semantics (the resample.py discipline).
    n1 = int(n_total) - 1
    num = (F.col("_rk").cast("long") - F.lit(1)) * F.lit(n1).cast("long")
    den = F.col("_ns").cast("long") - F.lit(1)
    idiv = F.expr(f"((cast(_rk as bigint) - 1) * {n1}L) div (cast(_ns as bigint) - 1)")
    lo_idx = F.when(den > 0, idiv).otherwise(F.lit(0)).cast("long")
    rem = F.when(den > 0, F.pmod(num, den)).otherwise(F.lit(0)).cast("long")
    scored = ranked.withColumn("_lo", lo_idx + 1).withColumn("_rem", rem)

    interp = F.when(
        F.col("_rem") == 0, F.col("_pv").cast("double")
    ).otherwise(
        F.col("_pv").cast("double")
        + (F.col("_pv_next") - F.col("_pv")).cast("double")
        * (F.col("_rem").cast("double") / (F.col("_ns") - 1).cast("double"))
    )
    return (
        scored.join(pairs, scored["_lo"] == pairs["_i"])
        .withColumn(out, interp)
        .drop("_rk", "_ns", "_lo", "_rem", "_i", "_pv", "_pv_next")
    )
