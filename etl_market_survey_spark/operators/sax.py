"""SAX — Symbolic Aggregate approXimation of per-key series.

The time-series-mining primitive (Lin, Keogh, Lonardi & Chiu, DMKD
2007): reduce each series to W Piecewise Aggregate Approximation
segment means, map each mean to a small alphabet by breakpoints, and
the series becomes a short WORD — equal words are motif candidates,
rare words are anomaly candidates (HOT SAX), and word equality joins
replace O(n^2) distance scans at corpus scale.

Exactness contract (the repo's fixed-point style): values are integer-
scaled by the caller, segment assignment is the counted allocation
``seg = floor(rank * W / n)`` (identical integer arithmetic on any
engine — no fractional window edges), and the symbol test compares
``segment_sum`` against ``breakpoint * segment_count`` so the PAA mean
is never materialized as a float. Breakpoints are caller-supplied
integer literals (the classic z-normalized Gaussian breakpoints become
data-driven cut literals upstream if desired — same contract as the
cuts tables).

Scale shape: one shuffle on the key for the rank window, one key+segment
groupBy (map-side combinable), one key groupBy to assemble the word
(bounded: W structs per key), then motif counting is a word-keyed
count. State per key is O(W), never the series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sax_words(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n_segments: int,
    breakpoints: list[int],
    alphabet: str = "abcdefghij",
) -> DataFrame:
    """``(key, n_points, sax_word)`` per key.

    ``value_col`` must already be integer (caller scales); symbol k is
    assigned when ``breakpoints[k-1] <= mean < breakpoints[k]`` via the
    exact cross-multiplied test. Keys with fewer points than
    ``n_segments`` still produce a (shorter) word — empty segments are
    skipped by construction of the counted allocation."""
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    if len(breakpoints) + 1 > len(alphabet):
        raise ValueError("alphabet too small for breakpoint count")
    if sorted(breakpoints) != list(breakpoints):
        raise ValueError("breakpoints must be ascending")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    ranked = df.select(
        F.col(key_col).alias("_k"),
        F.col(value_col).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    ).withColumn("_rn", F.row_number().over(
        Window.partitionBy("_k").orderBy(*order_cols)
    ))
    n_per = ranked.groupBy("_k").agg(F.count("*").alias("_n"))
    seg = (
        ranked.join(n_per, "_k")
        .withColumn(
            "_seg",
            F.expr(f"((_rn - 1) * {int(n_segments)}) div _n"),
        )
        .groupBy("_k", "_seg")
        .agg(
            F.sum("_v").alias("_s"),
            F.count("*").alias("_c"),
            F.max("_n").alias("_n"),
        )
    )
    # exact symbol: first breakpoint with s < b*c, else top symbol
    sym = F.lit(alphabet[len(breakpoints)])
    for i in range(len(breakpoints) - 1, -1, -1):
        sym = F.when(
            F.col("_s") < F.lit(int(breakpoints[i])) * F.col("_c"),
            F.lit(alphabet[i]),
        ).otherwise(sym)
    segs = seg.withColumn("_sym", sym)
    return (
        segs.groupBy("_k")
        .agg(
            F.max("_n").alias("n_points"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_seg", "_sym"))),
                    lambda x: x["_sym"],
                ),
            ).alias("sax_word"),
        )
        .select(F.col("_k").alias(key_col), "n_points", "sax_word")
    )


def sax_motifs(words: DataFrame, min_support: int = 2) -> DataFrame:
    """``(sax_word, n_keys)`` for words shared by >= min_support keys —
    the motif-candidate table."""
    return (
        words.groupBy("sax_word")
        .agg(F.count("*").cast("long").alias("n_keys"))
        .filter(F.col("n_keys") >= min_support)
    )
