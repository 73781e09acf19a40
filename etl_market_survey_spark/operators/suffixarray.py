"""Distributed suffix ranking via prefix doubling (beyond reference —
the index behind exact substring search / substring dedup).

Manber-Myers prefix doubling as DataFrame rounds: after round k every
position holds the rank of its length-2^k prefix; a round is one
self-equi-join on ``pos + 2^k`` (sentinel rank -1 past the end — the
shorter-suffix-sorts-first convention of string comparison) and one
dense re-ranking of the (rank, next_rank) pairs. O(log n) rounds, each
an equi-join + rank — the classic distributed suffix-array construction
(the same shape Flink/MapReduce SA papers use), with per-round
``localCheckpoint`` lineage cuts.

Ranking granularity: pairs re-rank per document with a window (documents
bound the partition — right for a corpus of many docs, which is this
engine's substring-dedup setting; a single giant string would swap the
window for ``prefix.distributed_rank`` + a dense-ify pass, same
algebra). Ranks are exact integers; suffixes of one string are pairwise
distinct, so the final ranks are a permutation — q218 gates them
against a brute-force suffix sort in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suffix_ranks(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, sa_rank): 1-based lexicographic rank of the suffix
    starting at 0-based ``pos`` within its document."""
    chars = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "(?!^)")).alias("pos", "_c"),
    ).filter(F.col("_c") != "")  # the zero-width split emits one trailing ""
    w = Window.partitionBy(id_col).orderBy("_r", "_rn")
    cur = chars.select(
        id_col, "pos", F.ascii("_c").cast("long").alias("_r")
    ).localCheckpoint(eager=True)
    lens = docs.select(F.length(text_col).alias("_l")).agg(F.max("_l")).first()[0]
    n_total = cur.count()
    k = 1
    while k < (lens or 1):
        nxt = cur.select(
            F.col(id_col).alias("_id2"),
            (F.col("pos") - k).alias("_p2"),
            F.col("_r").alias("_rn"),
        )
        paired = cur.join(
            nxt,
            (F.col(id_col) == F.col("_id2")) & (F.col("pos") == F.col("_p2")),
            "left",
        ).select(
            id_col,
            "pos",
            "_r",
            F.coalesce("_rn", F.lit(-1)).alias("_rn"),
        )
        cur = paired.withColumn("_nr", F.dense_rank().over(w)).select(
            id_col, "pos", F.col("_nr").cast("long").alias("_r")
        ).localCheckpoint(eager=True)
        k *= 2
        # early termination: once the (dense) ranks are a permutation,
        # every suffix is separated and further doubling is a no-op.
        # Real text separates after a few rounds; the worst case stays
        # ceil(log2(maxlen)). (Never fires before the first dense
        # re-rank — the initial ranks are raw character codes.)
        if cur.select(id_col, "_r").distinct().count() == n_total:
            break
    return cur.select(id_col, "pos", F.col("_r").alias("sa_rank"))


def lcp_array(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sa_rank, pos, lcp): longest common prefix of each suffix
    with its PREDECESSOR in suffix order (rank 1 -> 0) — Kasai et al.'s
    O(n) recurrence per document, run as one Arrow-batched kernel per
    doc over the distributed suffix ranks. The LCP array is what turns
    a suffix array into a repeat/substring index (q223's longest
    repeated substring is simply its argmax)."""
    import pandas as pd

    ranks = suffix_ranks(docs, id_col, text_col)
    withtext = ranks.join(docs.select(id_col, text_col), id_col)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos", ignore_index=True)
        text = pdf[text_col].iloc[0]
        n = len(pdf)
        rank = pdf["sa_rank"].to_numpy()  # rank[pos], 1-based
        sa = [0] * (n + 1)
        for pos in range(n):
            sa[rank[pos]] = pos
        lcp = [0] * (n + 1)
        h = 0
        for pos in range(n):
            r = rank[pos]
            if r > 1:
                j = sa[r - 1]
                while pos + h < n and j + h < n and text[pos + h] == text[j + h]:
                    h += 1
                lcp[r] = h
                if h:
                    h -= 1
            else:
                h = 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col].iloc[0],
                "sa_rank": [rank[p] for p in range(n)],
                "pos": list(range(n)),
                "lcp": [lcp[rank[p]] for p in range(n)],
            }
        )

    return withtext.groupBy(id_col).applyInPandas(
        kernel, f"{id_col} long, sa_rank long, pos int, lcp int"
    )


def suffix_ranks_global(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The giant-string variant of :func:`suffix_ranks`: per-round
    re-ranking uses the two-phase ``prefix.distributed_rank`` over
    packed (rank, next_rank) pairs plus a dense-ify join — NO per-key
    window anywhere, so a single multi-gigabyte document (or any skewed
    key) cannot pin one partition. Output is identical to
    :func:`suffix_ranks` (unit-asserted); cost per round is one extra
    distinct + join over the pair table."""
    from .prefix import distributed_rank

    chars = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "(?!^)")).alias("pos", "_c"),
    ).filter(F.col("_c") != "")
    cur = chars.select(
        id_col, "pos", F.ascii("_c").cast("long").alias("_r")
    ).localCheckpoint(eager=True)
    lens = docs.select(F.length(text_col).alias("_l")).agg(F.max("_l")).first()[0]
    n_total = cur.count()
    n_docs = docs.count()
    k = 1
    while k < (lens or 1):
        nxt = cur.select(
            F.col(id_col).alias("_id2"),
            (F.col("pos") - k).alias("_p2"),
            F.col("_r").alias("_rn"),
        )
        paired = cur.join(
            nxt,
            (F.col(id_col) == F.col("_id2")) & (F.col("pos") == F.col("_p2")),
            "left",
        ).select(
            id_col,
            "pos",
            "_r",
            F.coalesce("_rn", F.lit(-1)).alias("_rn"),
        )
        # pack (doc, r, r_next) into one orderable long: ranks are dense
        # (< n+1 after round 1; ascii < 2^21 before), docs bounded — the
        # pack below is collision-free for n * n_docs < 2^62 positions
        span = max(n_total + 2, 1 << 22)
        packed = paired.withColumn(
            "_pk",
            (
                F.col(id_col).cast("long") * span + F.col("_r")
            ) * span
            + (F.col("_rn") + 1),
        )
        dense = distributed_rank(
            packed.select("_pk").distinct(), "_pk", [], out="_dr"
        )
        cur = (
            packed.join(dense, "_pk")
            .select(id_col, "pos", F.col("_dr").alias("_g"))
        )
        # per-doc dense ranks from the global ones: subtract each doc's
        # minimum (global order sorts docs first via the pack prefix)
        base = cur.groupBy(F.col(id_col).alias("_bid")).agg(
            F.min("_g").alias("_g0")
        )
        cur = (
            cur.join(base, F.col(id_col) == F.col("_bid"))
            .select(
                id_col, "pos", (F.col("_g") - F.col("_g0") + 1).alias("_r")
            )
            .localCheckpoint(eager=True)
        )
        k *= 2
        if cur.select(id_col, "_r").distinct().count() == n_total:
            break
    return cur.select(id_col, "pos", F.col("_r").alias("sa_rank"))
