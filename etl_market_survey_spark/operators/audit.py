"""Data-quality constraint audit (beyond reference — every ingest gate).

A pipeline that feeds a 100 TB training run needs its invariants
checked on every batch: key uniqueness, referential integrity against
dimensions, null discipline. This operator evaluates all of them in a
bounded number of passes and returns ONE row — the shape a CI gate or
a freshness dashboard consumes — instead of a per-constraint scan.

Scale shape: null/row counts share a single aggregate pass over the
fact (conditional sums, map-side combined); each unique-key constraint
is one groupBy on the key (partial-agg'd); each FK is a left_anti join
whose dimension side broadcasts when small. Nothing collects; the one
final crossJoin stitches one-row frames.

The reference's runtime schema guards (SURVEY §1.2 — required-column
asserts, 2-channel checks) are the single-node ancestor of this
operator; q120 gates the composition against scalar subqueries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_audit(
    df: DataFrame,
    unique_keys: Sequence[Sequence[str]] = (),
    fks: Sequence[tuple[str, DataFrame, str]] = (),
    not_null: Sequence[str] = (),
) -> DataFrame:
    """One-row audit frame:

    - ``n_rows``
    - per ``not_null`` column c: ``nulls_<c>``
    - per ``unique_keys`` entry (k1, k2, ...): ``dupkeys_<k1>_<k2>`` =
      number of key values occurring more than once
    - per ``fks`` entry (col, dim, dim_col): ``orphans_<col>`` = rows
      whose ``col`` has no partner in ``dim.dim_col`` (NULLs are not
      orphans — SQL FK semantics)
    """
    aggs = [F.count("*").alias("n_rows")]
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    out = df.agg(*aggs)

    for keys in unique_keys:
        name = "dupkeys_" + "_".join(keys)
        dups = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.count("*").alias(name))
        )
        out = out.crossJoin(dups)

    for col, dim, dim_col in fks:
        name = f"orphans_{col}"
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(
                dim.select(F.col(dim_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count("*").alias(name))
        )
        out = out.crossJoin(orphans)
    return out


def with_inline_metrics(
    df: DataFrame,
    name: str,
    metrics: dict[str, Column],
):
    """Attach Spark ``Observation`` metrics to a frame: the metrics are
    computed DURING the action that consumes ``df`` — zero extra jobs,
    zero extra scans — and read on the driver afterwards. The
    observability idiom for production pipelines: row counts, null
    rates, late-data counts ride along with the write instead of
    re-running the query.

    Returns ``(observed_df, observation)``; call ``observation.get``
    after an action. Aggregates must be Observation-legal (no
    distinct)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    cols = [v.alias(k) for k, v in metrics.items()]
    return df.observe(obs, *cols), obs
