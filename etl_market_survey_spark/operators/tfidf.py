"""TF-IDF document vectors and inverted-index (posting-list) cosine
similarity — the sparse-text face of the similarity stack (the dense
face is operators/similarity.py over embeddings).

Vectors use the standard smooth formulation (public: the
sklearn/Salton-Buckley convention):

    idf(t) = ln((1 + N) / (1 + df_t)) + 1
    w(d,t) = tf_dt * idf(t), then L2-normalized per document

so pairwise cosine = plain dot product of shared terms — which is what
lets similarity run as an **inverted-index self-join**: join postings on
``term``, multiply weights, sum per pair. No dense vectors, no cross
join; only documents sharing at least one surviving term ever meet.

Scale shape (100 TB corpus):
- tf and df are two map-side-combined aggregates; N is one scalar.
- ``max_df_frac`` / ``min_df`` prune the posting lists *before* the
  pair join — dropping ubiquitous terms (stopwords) is THE lever, since
  a term with df=D contributes D^2/2 candidate pairs; frequency pruning
  is standard (and what every IR engine does). The pruning is applied
  to the shared vocabulary, so vectors and join stay consistent.
- The pair join shuffles postings by term; skewed (hot) terms split via
  AQE skew-join. The per-pair sum is a second shuffle keyed (id_a,
  id_b), partial-aggregated map-side.
- Determinism: idf logs round to 9 (libm last-ulp guard), weights round
  to 9, pair dot products sum through the exact decimal kernel
  (functions/stats.dsum) and round to 6 — a SQL oracle replays scores
  bit-for-bit on any partitioning (same convention as BM25,
  functions/relevance.py).

Reference analogue: none (beyond-reference operator, training-data
pipeline family per BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import dsum
from ..functions.text import TOKEN_PATTERN


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("term"),
    )


def tfidf_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_frac: float = 1.0,
    l2_norm: bool = True,
) -> DataFrame:
    """L2-normalized tf-idf postings: (id_col, term, w). Terms with
    df < ``min_df`` or df > ``max_df_frac``*N are pruned from the
    vocabulary (documents losing all terms disappear). Normalization is
    over the SURVIVING vocabulary (prune-then-normalize, the sklearn
    order)."""
    toks = _tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = tf.select(id_col).distinct().count()
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    kept = df_t.filter(
        (F.col("df") >= min_df) & (F.col("df") <= float(max_df_frac) * n_docs)
    )
    idf = kept.withColumn(
        "idf",
        F.round(
            F.log((F.lit(1.0 + n_docs)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0), 9
        ),
    )
    w0 = tf.join(F.broadcast(idf), "term").select(
        F.col(id_col), "term", F.round(F.col("tf") * F.col("idf"), 9).alias("w0")
    )
    if not l2_norm:
        return w0.withColumnRenamed("w0", "w")
    norms = w0.groupBy(id_col).agg(
        F.round(F.sqrt(dsum(F.col("w0") * F.col("w0"))), 9).alias("_nrm")
    )
    return w0.join(norms, id_col).select(
        F.col(id_col), "term", F.round(F.col("w0") / F.col("_nrm"), 9).alias("w")
    )


def tfidf_cosine_pairs(
    postings: DataFrame, min_sim: float, id_col: str = "doc_id"
) -> DataFrame:
    """Thresholded all-pairs cosine over L2-normalized postings via the
    inverted-index self-join: (id_a, id_b, sim) with id_a < id_b and
    sim >= ``min_sim``. Cost is sum over terms of df^2/2 candidate
    products — prune high-df terms in :func:`tfidf_postings` first."""
    a = postings.select(
        F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa")
    )
    b = postings.select(
        F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb")
    )
    prods = a.join(b, "term").filter(F.col("id_a") < F.col("id_b"))
    return (
        prods.groupBy("id_a", "id_b")
        .agg(F.round(dsum(F.col("wa") * F.col("wb")), 6).alias("sim"))
        .filter(F.col("sim") >= min_sim)
    )


def tfidf_topk_neighbors(
    postings: DataFrame, k: int, id_col: str = "doc_id", min_sim: float = 0.0
) -> DataFrame:
    """Top-k nearest neighbors per document over the pair graph
    (symmetrized), rank ties broken by neighbor id — deterministic.
    Output: (id, neighbor, sim, rank)."""
    from pyspark.sql import Window

    pairs = tfidf_cosine_pairs(postings, min_sim, id_col)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("neighbor"), "sim"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("neighbor"), "sim"
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
