"""k-anonymity / l-diversity audit (beyond reference — data governance).

Before a table ships into a training corpus, governance asks: can rows
be re-identified from quasi-identifiers (Sweeney's k-anonymity), and do
small groups leak the sensitive attribute (Machanavajjhala's
l-diversity)? Both reduce to one map-side-combined aggregation over the
quasi-identifier key: group size and distinct sensitive values — state
is two counters per group, shuffle is |groups|, nothing else moves.

This is the audit (report per equivalence class + violation flags),
not the fixer; generalization/suppression policy is a caller decision
driven by this table. Pure built-ins, SQL-replayable (q202 hash-gates
it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive: str | Column,
    k: int,
    l: int,
) -> DataFrame:
    """Per equivalence class (unique quasi-identifier combination):
    ``n_rows``, ``l_distinct`` (distinct sensitive values), and boolean
    ``k_anonymous`` (n >= k) / ``l_diverse`` (distinct >= l) flags."""
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(s).cast("long").alias("l_distinct"),
        )
        .withColumn("k_anonymous", F.col("n_rows") >= F.lit(int(k)))
        .withColumn("l_diverse", F.col("l_distinct") >= F.lit(int(l)))
    )
