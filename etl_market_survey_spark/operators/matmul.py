"""Distributed matrix multiplication over COO triples — beyond reference.

The training-data pipeline's linear-algebra workhorse (embedding
projections, co-occurrence factor products, graph adjacency powers) as
two Spark-first strategies over ``(row, col, val)`` frames:

* :func:`coo_matmul` — the SPARSE path: ``A ⋈ B`` on the inner
  dimension, group by output cell, sum products. Pure JVM expressions,
  one shuffle per side + one aggregate; work is proportional to the
  number of NONZERO partial products (the sparse-matmul lower bound),
  so it is the right plan whenever the matrices are sparse enough that
  flops, not GEMM throughput, dominate.

* :func:`block_matmul` — the DENSE path: tile both matrices into
  ``bs x bs`` blocks, equi-join block rows of A with block columns of B
  on the inner block index, run ONE Arrow-batched numpy GEMM per block
  pair, then sum partial blocks per output tile. This is the classic
  SUMMA-style shape: the shuffle moves each A-block once per B block
  column (and vice versa), and all multiply-add work runs at BLAS
  speed instead of per-cell JVM expression cost. Block size bounds
  executor memory: 3 dense ``bs^2`` float64 tiles per task.

Both produce identical cells (zero partial sums are kept out by
construction in COO; block GEMM drops explicit zeros on emit so the
two paths and the SQL oracle agree exactly on integer inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coo_matmul(a: DataFrame, b: DataFrame) -> DataFrame:
    """C = A @ B over COO frames ``(row, col, val)``; returns the same
    shape. Cells whose partial products all cancel still appear (as 0)
    only if explicitly present — with integer inputs and no cancelling
    values the output support is exactly the nonzero set."""
    lhs = a.select(F.col("row"), F.col("col").alias("k"), F.col("val").alias("av"))
    rhs = b.select(F.col("row").alias("k"), F.col("col"), F.col("val").alias("bv"))
    return (
        lhs.join(rhs, "k")
        .groupBy("row", "col")
        .agg(F.sum(F.col("av") * F.col("bv")).alias("val"))
    )


def block_matmul(a: DataFrame, b: DataFrame, bs: int = 512) -> DataFrame:
    """C = A @ B via ``bs x bs`` tiles and per-pair numpy GEMM.

    Plan: cells -> block tiles (one groupBy each side, cells carried as
    arrays) -> equi-join on the shared inner block index -> Arrow GEMM
    per (A-tile, B-tile) pair -> sum partials per output cell. The only
    Python is the GEMM kernel itself (mapInPandas, BLAS-backed); tiling,
    join and the final combine are JVM-side.
    """
    if bs < 1:
        raise ValueError("block size must be >= 1")

    def tiles(df: DataFrame, bi_of: str, bj_of: str) -> DataFrame:
        # integer arithmetic, not float division: `/` goes through double
        # (loses exactness above 2^53) and `%` is not floor-mod for
        # negative indices. Block index = (i - pmod(i, bs)) div bs —
        # the numerator is exactly divisible, so truncating `div` equals
        # floor division even for negative i, matching pmod.
        return (
            df.select(
                F.expr(f"({bi_of} - pmod({bi_of}, {bs})) div {bs}")
                .cast("long").alias("bi"),
                F.expr(f"({bj_of} - pmod({bj_of}, {bs})) div {bs}")
                .cast("long").alias("bj"),
                F.pmod(F.col(bi_of), F.lit(bs)).cast("int").alias("li"),
                F.pmod(F.col(bj_of), F.lit(bs)).cast("int").alias("lj"),
                F.col("val").cast("double").alias("v"),
            )
            .groupBy("bi", "bj")
            .agg(
                F.collect_list(F.struct("li", "lj", "v")).alias("cells"),
            )
        )

    at = tiles(a, "row", "col").select(
        F.col("bi").alias("abi"), F.col("bj").alias("k"), F.col("cells").alias("ac")
    )
    bt = tiles(b, "row", "col").select(
        F.col("bi").alias("k"), F.col("bj").alias("bbj"), F.col("cells").alias("bc")
    )
    paired = at.join(bt, "k").select("abi", "bbj", "ac", "bc")

    def gemm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows_out, cols_out, vals_out = [], [], []
            for abi, bbj, ac, bc in zip(
                pdf["abi"], pdf["bbj"], pdf["ac"], pdf["bc"]
            ):
                ma = np.zeros((bs, bs))
                for c in ac:
                    ma[c["li"], c["lj"]] = c["v"]
                mb = np.zeros((bs, bs))
                for c in bc:
                    mb[c["li"], c["lj"]] = c["v"]
                mc = ma @ mb
                li, lj = np.nonzero(mc)
                rows_out.append(abi * bs + li)
                cols_out.append(bbj * bs + lj)
                vals_out.append(mc[li, lj])
            if rows_out:
                yield pd.DataFrame(
                    {
                        "row": np.concatenate(rows_out),
                        "col": np.concatenate(cols_out),
                        "val": np.concatenate(vals_out),
                    }
                )

    partials = paired.mapInPandas(gemm, "row long, col long, val double")
    return partials.groupBy("row", "col").agg(F.sum("val").alias("val"))
