"""Distributed PCA over an embedding column (beyond reference).

The covariance matrix of a d-dim embedding column is a d(d+1)/2-cell
moment aggregation — ONE map-side-combined pass over the corpus with
exact decimal sums (``functions/stats.dsum``), so the matrix is
bit-identical on any partitioning and replayable by a SQL oracle
(q198). The eigendecomposition is a driver-side ``numpy.linalg.eigh``
on the d×d matrix — small by contract (d ≤ a few thousand; the corpus
never leaves the cluster), the same division of labor every distributed
PCA uses (Spark ML's RowMatrix.computePrincipalComponents included).

Projection is JVM-side column algebra on broadcast component literals
(``zip_with``/``aggregate`` dot products — no Python, no shuffle).

State scaling: the aggregate carries d(d+1)/2 decimal cells; beyond
d ≈ 10³ switch to block-wise covariance (outer loop over column blocks)
— noted, not implemented, since the engine's embedding tables are
d = 64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import dsum


def covariance_matrix(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """Long-form exact sample covariance: rows ``(i, j, cov)`` for all
    i <= j < dims, from one aggregation pass."""
    emb = F.col(vec_col).cast("array<double>")
    aggs = [F.count("*").cast("double").alias("_n")]
    for i in range(dims):
        aggs.append(dsum(emb[i]).alias(f"_s_{i}"))
    for i in range(dims):
        for j in range(i, dims):
            aggs.append(dsum(emb[i] * emb[j]).alias(f"_s_{i}_{j}"))
    wide = df.agg(*aggs)
    cells = []
    for i in range(dims):
        for j in range(i, dims):
            # n <= 1 has no sample covariance: NULL (ANSI-safe), same on
            # both engines; identical values for n > 1
            cells.append(
                f"{i}, {j}, CASE WHEN `_n` > 1.0 THEN "
                f"(`_s_{i}_{j}` - `_s_{i}` * `_s_{j}` / `_n`) / (`_n` - 1.0) END"
            )
    n_cells = dims * (dims + 1) // 2
    return wide.select(
        F.expr(f"stack({n_cells}, {', '.join(cells)}) AS (i, j, cov)")
    ).select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "cov",
    )


def sql_covariance_matrix(table: str, vec_expr: str, dims: int) -> str:
    """DuckDB mirror of :func:`covariance_matrix` (1-based list index)."""
    from ..functions.stats import sql_dsum

    def e(i: int) -> str:
        return f"CAST(list_extract({vec_expr}, {i + 1}) AS DOUBLE)"

    sums = [f"CAST(COUNT(*) AS DOUBLE) AS n"]
    for i in range(dims):
        sums.append(f"{sql_dsum(e(i))} AS s_{i}")
    for i in range(dims):
        for j in range(i, dims):
            sums.append(f"{sql_dsum(f'{e(i)} * {e(j)}')} AS s_{i}_{j}")
    branches = [
        f"SELECT CAST({i} AS INT) AS i, CAST({j} AS INT) AS j,"
        f" CASE WHEN n > 1.0 THEN (s_{i}_{j} - s_{i} * s_{j} / n) / (n - 1.0) END"
        f" AS cov FROM m"
        for i in range(dims)
        for j in range(i, dims)
    ]
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM {table})\n"
        + "\nUNION ALL ".join(branches)
    )


def pca_fit(df: DataFrame, vec_col: str, dims: int, n_components: int):
    """Principal axes from the exact covariance matrix: returns
    ``(eigenvalues, components)`` — numpy arrays, descending variance,
    each component sign-normalized so its max-|.| element is positive
    (eigh's sign is otherwise arbitrary)."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, dims).collect()
    C = np.zeros((dims, dims))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T
    for k in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[k]))
        if comps[k, m] < 0:
            comps[k] = -comps[k]
    return vals[order], comps


def pca_project(df: DataFrame, vec_col: str, components, out: str = "pc") -> DataFrame:
    """Adds ``out``: array of dot products with each component —
    broadcast-literal column algebra, whole-stage codegen, no Python."""
    emb = F.col(vec_col).cast("array<double>")
    dots = []
    for comp in components:
        c = F.array(*[F.lit(float(v)) for v in comp])
        terms = F.zip_with(emb, c, lambda x, w: x * w)
        dots.append(
            F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
        )
    return df.withColumn(out, F.array(*dots))
