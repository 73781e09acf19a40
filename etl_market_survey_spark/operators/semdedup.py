"""SemDeDup: semantic deduplication over an embedding column.

The method of Abbas et al. 2023 (arXiv:2303.09540, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"):
cluster the embedding space, call two documents semantic duplicates when
their cosine similarity exceeds a threshold *within a cluster*, and keep
one representative per duplicate group. Clustering turns the O(n^2)
all-pairs problem into sum-of-squares over cells — the same blocking
trick as LSH, but with centroids, which also gives the operator its
approximation contract: cross-cell duplicate pairs are missed by design
(raise ``n_cells``' quality or nprobe-style multi-assignment to trade
cost for recall; the paper uses single assignment).

Composition, all existing primitives:

  assign cell (map-only JVM expression over broadcast centroids)
    -> within-cell self-join, ``id_a < id_b``, ROUND(cos, 6) >= t
    -> connected components (min-label propagation + pointer jumping)
    -> survivors = component minima  (operators/components.dedup_canonical)

Scale shape: one shuffle on cell id for the self-join (cells are the
unit of quadratic work — size them so m_cell^2 fits a task, ~1e4..1e5
rows per cell), then the component rounds touch only the duplicate-edge
graph, which is tiny relative to the corpus. Cosine is rounded to 6
decimals before thresholding so a DuckDB oracle replays the decision
boundary bit-for-bit.

``cell_col`` mode blocks on an existing column (exactly replayable in
SQL — the correctness gate uses the ``label`` column); centroid mode is
the real path (seeded k-means via similarity.train_ivf_centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import dedup_canonical
from .similarity import _to_double, cosine_with_norms, dot, norm, train_ivf_centroids


def assign_cells(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "cell",
) -> DataFrame:
    """Nearest-centroid cell id per row (argmax dot against unit-norm
    centroids — one JVM expression, no shuffle, centroids folded into the
    plan as literals)."""
    scores = F.array(
        *[
            F.struct(
                dot(_to_double(F.col(vec_col)), F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn(out_col, F.reverse(F.array_sort(scores))[0]["cell"])


def assign_cells_multi(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    nprobe: int,
    out_col: str = "cell",
) -> DataFrame:
    """nprobe nearest-centroid cell ids per row, EXPLODED (one output row
    per (row, probed cell)). The IVF multi-assignment recall fix: a
    duplicate pair split by a cell boundary is recovered whenever any of
    the nprobe probes of both rows coincide — at ~nprobe× replication
    into the downstream self-join. Still map-only, no shuffle."""
    if not 1 <= nprobe <= len(centroids):
        raise ValueError("nprobe must be in [1, n_centroids]")
    scores = F.array(
        *[
            F.struct(
                dot(_to_double(F.col(vec_col)), F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scores)), 1, nprobe)
    return df.withColumn(out_col, F.explode(top["cell"]))


def semdedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    cell_col: str | None = None,
    centroids: list[list[float]] | None = None,
    n_cells: int = 16,
    seed: int = 42,
    nprobe: int = 1,
) -> DataFrame:
    """Within-cell duplicate edges ``(id_a, id_b, cos)`` with
    ``id_a < id_b`` and rounded cosine >= threshold. ``nprobe > 1``
    (centroid mode only) multi-assigns rows to their nprobe nearest
    cells to recover boundary pairs; a pair found in several shared
    cells counts once (identical cos — dropDuplicates is exact)."""
    multi = nprobe > 1
    if cell_col is None:
        cents = (
            centroids
            if centroids is not None
            else train_ivf_centroids(df, vec_col, n_cells, seed)
        )
        if multi:
            df = assign_cells_multi(df, vec_col, cents, nprobe, "_cell")
        else:
            df = assign_cells(df, vec_col, cents, "_cell")
        cell_col = "_cell"
    elif multi:
        raise ValueError("nprobe > 1 requires centroid mode, not cell_col")
    e = df.select(
        F.col(id_col), F.col(cell_col).alias("_c"), _to_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    a = e.select(
        F.col("_c"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = e.select(
        F.col("_c"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    pairs = (
        a.join(b, on="_c")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                cosine_with_norms(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
    return pairs.dropDuplicates(["id_a", "id_b"]) if multi else pairs


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    cell_col: str | None = None,
    centroids: list[list[float]] | None = None,
    n_cells: int = 16,
    seed: int = 42,
    nprobe: int = 1,
) -> DataFrame:
    """``df`` plus ``canonical_id``: the duplicate-component minimum for
    rows in any semantic-duplicate cluster, the row's own id otherwise.
    ``filter(id == canonical_id)`` keeps one survivor per cluster."""
    pairs = semdedup_pairs(
        df, id_col, vec_col, threshold, cell_col, centroids, n_cells, seed, nprobe
    )
    return dedup_canonical(df, pairs, id_col)
