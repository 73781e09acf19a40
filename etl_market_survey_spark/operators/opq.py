"""Rotated product quantization (the OPQ family's baseline rotation).

PQ quantizes each subspace independently, so correlated dimensions
waste codebook entropy; rotating the space first decorrelates them.
Full OPQ (Ge et al., CVPR 2013) alternates rotation and codebook
updates; the standard data-free baseline — implemented here — applies a
seeded random (near-)orthonormal BLOCK-DIAGONAL rotation: one d_sub ×
d_sub block per subspace, coefficients rounded to 6 decimals so they
are exact literals in BOTH engines.

Exactness contract: the rotation is generated as arithmetic EXPRESSION
TEXT — a left-folded chain ``c1*x1 + c2*x2 + …`` per output dimension —
rendered for Spark (``element_at``) and DuckDB (1-based ``[]``) from
the same term list. +, * on doubles are IEEE-exact and left-assoc in
both parsers, and float→double widening of the stored embeddings is
exact, so rotated values are bit-identical cross-engine (and in
Python's identical left fold, used for query vectors). Everything
downstream is the integer-exact PQ chain (operators/pq).

Scale: the rotation is a per-row projection — map-only, no shuffle; the
cost is m * d_sub^2 mult-adds per vector inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def rotation_blocks(
    m: int, dsub: int, seed: int = 7, decimals: int = 6
) -> list[list[list[float]]]:
    """``m`` seeded near-orthonormal ``dsub x dsub`` blocks (QR of a
    Gaussian, rounded to ``decimals`` so every coefficient is a short
    exact literal)."""
    rng = np.random.RandomState(seed)
    blocks = []
    for _ in range(m):
        q, _ = np.linalg.qr(rng.randn(dsub, dsub))
        blocks.append([[round(float(v), decimals) for v in row] for row in q])
    return blocks


def _row_terms(block_row: Sequence[float], base: int, idx) -> str:
    """One rotated output dim: left-folded ``c*x`` chain in block order."""
    return " + ".join(
        f"{c!r} * {idx(base + i + 1)}" for i, c in enumerate(block_row)
    )


def _rotated_exprs(vec: str, blocks, idx) -> list[str]:
    out = []
    dsub = len(blocks[0])
    for j, block in enumerate(blocks):
        base = j * dsub
        for row in block:
            out.append(f"({_row_terms(row, base, idx)})")
    return out


def rotated_vec(vec_col: str, blocks) -> Column:
    """Spark: ``array<double>`` of the block-rotated vector."""
    exprs = _rotated_exprs(
        vec_col, blocks, lambda k: f"CAST(element_at(`{vec_col}`, {k}) AS DOUBLE)"
    )
    return F.expr("array(" + ", ".join(exprs) + ")")


def sql_rotated_list(vec_expr: str, blocks) -> str:
    """DuckDB: list literal of the identically-ordered expressions."""
    exprs = _rotated_exprs(
        vec_expr, blocks, lambda k: f"CAST({vec_expr}[{k}] AS DOUBLE)"
    )
    return "[" + ", ".join(exprs) + "]"


def rotate_rows(X: "np.ndarray", blocks) -> "np.ndarray":
    """Vectorized replica of the SAME left fold over a row-major batch
    ``X`` (n, d) of float64 — the kernel-side twin of
    :func:`rotated_vec`'s expression text.

    Bit-exactness: numpy elementwise ``*``/``+`` on float64 are single
    IEEE-754 ops (no FMA, no pairwise regrouping), applied here in the
    identical left-association the SQL chain and :func:`rotate_query`
    use, so every output double is bit-identical to the expression
    path. This is the serving-path rotation: the coefficient blocks
    ride along as plain ndarray task data instead of a ~d*dsub-literal
    expression tree, which blows past the JVM's generated-method limit
    and silently drops the whole stage to interpreted eval (the q154
    disease; same cure as the q40 IVF centroids)."""
    dsub = len(blocks[0])
    out = []
    for j, block in enumerate(blocks):
        base = j * dsub
        for row in block:
            acc = row[0] * X[:, base]
            for i in range(1, dsub):
                acc = acc + row[i] * X[:, base + i]
            out.append(acc)
    return np.stack(out, axis=1)


def rotate_query(qvec: Sequence[float], blocks) -> list[float]:
    """Python replica of the same left fold for query-side vectors."""
    dsub = len(blocks[0])
    out = []
    for j, block in enumerate(blocks):
        base = j * dsub
        for row in block:
            acc = row[0] * float(qvec[base])
            for i in range(1, dsub):
                acc = acc + row[i] * float(qvec[base + i])
            out.append(acc)
    return out


def train_opq_blocks(
    df,
    vec_col: str,
    m: int,
    k: int,
    seed: int = 7,
    sample_n: int = 2000,
    iters: int = 8,
    lloyd_iters: int = 6,
    decimals: int = 6,
):
    """Data-driven OPQ rotation (Ge et al., CVPR 2013 — the alternating
    non-parametric trainer), block-diagonal per subspace: alternate a
    Lloyd codebook update in the rotated subspace with the orthogonal
    Procrustes rotation update (SVD of S^T·recon), per block.

    Deterministic end to end: the sample is content-hash-ordered (the
    ``pq.train_pq_codebooks`` discipline — independent of partition
    layout), numpy ops are seeded, and the returned blocks are rounded
    to ``decimals`` so they obey the same exact-literal contract as
    :func:`rotation_blocks` — drop-in for ``rotated_vec`` /
    ``sql_rotated_list`` and the whole integer-exact PQ chain behind
    them. Driver-side cost is O(sample_n · d²) — sample-sized by
    contract, the corpus never leaves the cluster.
    """
    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.lit(seed), F.col(vec_col)))
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    X = X[np.lexsort(X.T[::-1])]
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m {m}")
    dsub = d // m
    blocks = []
    for j in range(m):
        rng = np.random.RandomState(seed * 1000 + j)
        S = X[:, j * dsub : (j + 1) * dsub]
        R = np.eye(dsub)
        cents = None
        for _ in range(iters):
            Z = S @ R
            if cents is None:
                cents = Z[rng.choice(len(Z), size=k, replace=len(Z) < k)]
            for _ in range(lloyd_iters):
                d2 = ((Z[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(k):
                    pts = Z[assign == c]
                    if len(pts):
                        cents[c] = pts.mean(axis=0)
            recon = cents[assign]
            u, _, vt = np.linalg.svd(S.T @ recon)
            R = u @ vt
        # rotated_vec applies out = B @ x (rows = output dims); training
        # used the row-vector convention z = x @ R, so B = R^T
        blocks.append(
            [[round(float(v), decimals) for v in row] for row in R.T]
        )
    return blocks
