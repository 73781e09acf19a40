"""Deterministic random-walk corpus generation (DeepWalk/node2vec
style, Perozzi et al. 2014) — the graph-embedding training-data op.

Walks are driven by HASH, not RNG: step t of walk w at node v moves to
``sorted_neighbors[ xxhash64(v*K1 + w*K2 + t) mod degree(v) ]``. That
makes the whole corpus a pure function of the edge set — re-runs,
retries, and engines agree bit-for-bit (the q271 oracle replays every
step through the closed hashLong SQL form), while the walk distribution
retains the uniform-neighbor law DeepWalk assumes (xxhash64 is the
engine's avalanche hash over distinct keys).

Scale shape: adjacency = one groupBy to sorted neighbor arrays
(bounded by the max-degree contract — for hub graphs swap
``element_at`` for the rank-join variant: join the frontier to edges
and pick ``row_number == r``, same hash, no arrays); each step is one
frontier⋈adjacency join — walk_len joins total, frontier size =
starts x n_walks, constant per step. The emitted corpus streams out as
(start, walk_id, step, node) rows — exactly the skip-gram input shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_K1 = 1_000_000
_K2 = 1_000


def walk_key(cur, walk_id, step):
    """The packed hash key — shared with the oracle; callers must keep
    node ids < ~9e12/K1 and walk_id*K2 + step < K1."""
    return cur * _K1 + walk_id * _K2 + step


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    n_walks: int = 2,
    walk_len: int = 4,
) -> DataFrame:
    """``(start, walk_id, step, node)`` rows: for each start node,
    ``n_walks`` hash-driven walks of ``walk_len`` steps over the
    directed edge list ``(src, dst)``. Every start must have
    out-degree >= 1 at every reached node (symmetrize first for
    undirected graphs). ``starts`` exposes one ``node`` column."""
    if n_walks < 1 or walk_len < 1:
        raise ValueError("n_walks and walk_len must be >= 1")
    if n_walks * _K2 + walk_len >= _K1:
        raise ValueError("walk id space overflows the packed key")
    adj = (
        edges.groupBy(F.col("src").alias("_n"))
        .agg(
            F.sort_array(F.collect_list("dst")).alias("_nbrs"),
            F.count("*").alias("_deg"),
        )
        .persist()
    )
    wids = F.explode(
        F.sequence(F.lit(0), F.lit(n_walks - 1))
    ).alias("walk_id")
    frontier = starts.select(
        F.col("node").alias("start"), wids
    ).withColumns({"step": F.lit(0), "node": F.col("start")})
    out = frontier
    for t in range(1, walk_len + 1):
        key = walk_key(F.col("node"), F.col("walk_id"), F.lit(t))
        frontier = (
            frontier.join(adj, frontier["node"] == adj["_n"])
            .withColumn("_r", F.pmod(F.xxhash64(key), F.col("_deg")))
            .select(
                "start",
                "walk_id",
                F.lit(t).alias("step"),
                F.element_at("_nbrs", (F.col("_r") + 1).cast("int")).alias(
                    "node"
                ),
            )
        )
        out = out.unionByName(frontier)
    return out


def skipgram_pairs(
    walks: DataFrame,
    vocab: DataFrame,
    window: int = 2,
    n_negatives: int = 2,
) -> DataFrame:
    """Skip-gram training pairs with hash-driven negative sampling —
    the word2vec/node2vec data layer over a walk corpus.

    Positives: every (center, context) pair within ``window`` steps of
    the same walk (label 1). Negatives: for each positive, ``n_negatives``
    nodes drawn by ``xxhash64(packed key) mod |vocab|`` against a
    RANK-INDEXED vocab table (label 0) — a join, not an array literal,
    so the vocabulary can be corpus-sized. Deterministic end to end;
    q272 replays both the pair window and every negative draw in SQL.

    ``walks``: (start, walk_id, step, node); ``vocab``: one ``node``
    column (ranked internally by node order). Output: (start, walk_id,
    center, other, label)."""
    if window < 1 or n_negatives < 0:
        raise ValueError("window >= 1, n_negatives >= 0")
    from pyspark.sql import Window as W

    ranked = vocab.select("node").distinct().withColumn(
        "_rank", F.row_number().over(W.orderBy("node")) - 1
    )
    n_vocab = ranked.count()  # bounded: the node vocabulary
    a = walks.select("start", "walk_id", F.col("step").alias("_t"),
                     F.col("node").alias("center"))
    b = walks.select("start", "walk_id", F.col("step").alias("_u"),
                     F.col("node").alias("other"))
    pos = (
        a.join(b, ["start", "walk_id"])
        .filter(
            (F.col("_u") != F.col("_t"))
            & (F.abs(F.col("_u") - F.col("_t")) <= window)
        )
        .select("start", "walk_id", "_t", "_u", "center", "other")
    )
    positives = pos.select(
        "start", "walk_id", "center", "other", F.lit(1).alias("label")
    )
    if n_negatives == 0:
        return positives
    j = F.explode(F.sequence(F.lit(0), F.lit(n_negatives - 1))).alias("_j")
    negs = pos.select("start", "walk_id", "_t", "_u", "center", j)
    key = ((F.col("start") * 100 + F.col("_t")) * 100 + F.col("_u")) * 10 + F.col("_j")
    negs = negs.withColumn("_rank", F.pmod(F.xxhash64(key), F.lit(n_vocab)))
    negatives = negs.join(ranked, "_rank").select(
        "start", "walk_id", "center",
        F.col("node").alias("other"), F.lit(0).alias("label"),
    )
    return positives.unionByName(negatives)
