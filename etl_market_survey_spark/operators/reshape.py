"""Pivot / unpivot reshapes (SURVEY §2.7).

R1 pivot long->wide (reference utils.py:14-18: index n_trigger, columns
device_name, values = all other columns), R2 stack back (utils.py:19-20),
R3 pivot_table-with-mean (time_resolution_beta_scan.py:70-76).

Spark-first: ``groupBy().pivot(values=...).agg(...)`` with *explicit* pivot
values whenever the caller knows them — with explicit values Catalyst skips
the extra distinct-scan job, which at 100 TB is a full pass over the fact
table you don't want. ``melt`` uses the native ``unpivot`` (no UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    columns: str,
    values: Sequence[str],
    column_values: Sequence[str] | None = None,
    agg: str = "first",
    sep: str = "_",
) -> DataFrame:
    """R1 — long->wide. Output columns ``f"{value}{sep}{column_value}"``.

    ``agg='first'`` replicates pandas pivot on unique (index, column) pairs;
    pass 'avg' to replicate pivot_table(aggfunc=mean) (R3).
    """
    gp = df.groupBy(*index)
    piv = gp.pivot(columns, list(column_values) if column_values else None)
    aggs = [getattr(F, agg)(F.col(v)).alias(v) for v in values]
    wide = piv.agg(*aggs)
    if len(values) == 1:
        # Spark names single-agg pivot columns just by the pivot value;
        # normalize to the value{sep}pivotvalue convention.
        pivot_names = [c for c in wide.columns if c not in index]
        renames = {c: f"{values[0]}{sep}{c}" for c in pivot_names}
        for old, new in renames.items():
            wide = wide.withColumnRenamed(old, new)
    return wide


def melt(
    df: DataFrame,
    ids: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """R2 — wide->long via native ``unpivot``; drops nulls like pandas stack."""
    out = df.unpivot(
        ids=list(ids),
        values=list(value_vars),
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
    if drop_null:
        out = out.filter(F.col(value_name).isNotNull())
    return out
