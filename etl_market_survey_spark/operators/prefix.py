"""Distributed prefix sum and sequence packing (beyond reference —
training-data pipeline).

A global running total (`sum() OVER (ORDER BY ...)`) makes Spark shuffle
EVERYTHING into one reducer — the classic scale cliff. The textbook fix
is the two-phase scan, built here from DataFrame ops only:

1. order-preserving coarse bucketing of the sort key (width-bucket over
   the key's min/max — a map-side expression, no shuffle);
2. one tiny aggregation for per-bucket totals, exclusive-scanned on the
   driver (B numbers, not rows) and broadcast back as offsets;
3. a window cumsum WITHIN each bucket (partitionBy bucket → all buckets
   scan in parallel) plus the bucket's offset.

Every row gets exactly the value a single-reducer window would produce —
the oracle replays it with a plain OVER (ORDER BY) — but the largest
partition Spark ever sorts is ~n/B rows. Skewed key ranges only unbalance
bucket sizes; raise n_buckets or pre-quantile the key when the key
distribution is pathological.

``pack_sequences`` applies it to the canonical LLM-corpus packing step:
assign documents, in a deterministic order, to contiguous fixed-budget
bins (bin = exclusive-cumsum div budget). A document larger than the
budget gets a bin of its own without stalling the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out: str = "cumsum",
    n_buckets: int = 64,
    inclusive: bool = True,
) -> DataFrame:
    """Running sum of ``value_col`` over the total order ``order_col``
    (must be numeric and unique), without a global single-partition
    window. ``inclusive=False`` gives the exclusive scan (sum of strictly
    preceding rows)."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    mn, mx = df.agg(F.min(order_col), F.max(order_col)).first()
    if mn is None:
        return df.withColumn(out, F.lit(None).cast("double"))
    span = float(mx - mn) + 1.0
    # double arithmetic is monotone in the key, so bucket ids preserve the
    # order even when the key range would overflow (key - mn) * n_buckets
    bucket = (
        (F.col(order_col).cast("double") - F.lit(float(mn))) * n_buckets / F.lit(span)
    ).cast("int")
    # integral values only (token counts, byte sizes): the scan stays in
    # exact int64 arithmetic end to end
    b = df.withColumn("_pb", bucket).withColumn("_pv", value.cast("long"))

    totals = {
        r["_pb"]: r["_t"]
        for r in b.groupBy("_pb").agg(F.sum("_pv").alias("_t")).collect()
    }
    run, offsets = 0, []
    for pb in sorted(totals):
        offsets.append((pb, run))
        run += totals[pb]
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, "_pb int, _off long")

    w = Window.partitionBy("_pb").orderBy(order_col)
    if inclusive:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else:
        w = w.rowsBetween(Window.unboundedPreceding, -1)
    local = F.coalesce(F.sum("_pv").over(w), F.lit(0))
    return (
        b.join(F.broadcast(off), "_pb")
        .withColumn(out, (local + F.col("_off")).cast("long"))
        .drop("_pb", "_pv", "_off")
    )


def pack_bins_cumsum(
    docs: DataFrame,
    order_col: str = "doc_id",
    size_col: str = "n_tok",
    budget: int = 4096,
    bin_col: str = "bin_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Contiguous token-budget packing: walk documents in ``order_col``
    order; bin = exclusive_cumsum div budget. A document is never split —
    one spanning a budget boundary swallows it (the skipped bin id is
    simply never assigned). The assignment is a pure function of (order,
    sizes): engine-replayable and invariant to partitioning.

    One of three packing semantics in the engine — see
    ``operators/packing`` for the GPT-style concat-and-chunk
    (``pack_sequences``, documents split across capacity boundaries) and
    the exact next-fit (``pack_bins_nosplit``, bins filled to the brim
    without splitting). This cumsum form trades bin utilization for a
    fully parallel two-phase scan (no sequential recurrence at all).
    """
    scanned = distributed_cumsum(
        docs, order_col, size_col, out="_excl", n_buckets=n_buckets, inclusive=False
    )
    return scanned.withColumn(
        bin_col, F.expr(f"_excl div {budget}").cast("long")
    ).drop("_excl")


def distributed_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    out: str = "rank",
    n_buckets: int = 64,
) -> DataFrame:
    """Global 1-based rank over the total order ``(value_col,
    tiebreak_cols...)`` — the two-phase scan specialized to counting:
    order-preserving coarse buckets on the numeric value, per-bucket
    counts exclusive-scanned on the driver (B numbers), within-bucket
    row_number in parallel. Every row gets exactly the rank a
    single-reducer ``row_number() OVER (ORDER BY ...)`` would emit.
    The tiebreak must make the composite order total."""
    mn, mx = df.agg(F.min(value_col), F.max(value_col)).first()
    if mn is None:
        return df.withColumn(out, F.lit(None).cast("long"))
    span = float(mx) - float(mn) + 1.0
    bucket = (
        (F.col(value_col).cast("double") - F.lit(float(mn))) * n_buckets / F.lit(span)
    ).cast("int")
    b = df.withColumn("_rb", bucket)
    totals = {
        r["_rb"]: r["_n"]
        for r in b.groupBy("_rb").agg(F.count("*").alias("_n")).collect()
    }
    run, offsets = 0, []
    for rb in sorted(totals):
        offsets.append((rb, run))
        run += totals[rb]
    off = df.sparkSession.createDataFrame(offsets, "_rb int, _off long")
    w = Window.partitionBy("_rb").orderBy(value_col, *tiebreak_cols)
    return (
        b.join(F.broadcast(off), "_rb")
        .withColumn(out, F.row_number().over(w) + F.col("_off"))
        .drop("_rb", "_off")
    )
