"""Worked example — the retrieval / RAG-serving stack end-to-end on the
documents + embeddings tables, composing the engine's retrieval
operators the way a production index-and-serve run would chain them:

  1. corpus hygiene: eval-set decontamination        (operators/decontam)
  2. lexical index + query: BM25 top-k               (functions/relevance)
  3. dense exact baseline: cosine top-k              (operators/similarity)
  4. dense ANN serving path: IVF cell-pruned top-k   (operators/similarity)
  5. hybrid merge: reciprocal-rank fusion            (the q212 pattern)
  6. contrastive training feed: hash-ring negatives  (operators/sampling)

Asserts: ANN recall@10 against the exact baseline, fusion containment,
and the negative-sampling balance law. Run:

  python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.functions.relevance import bm25_scores
from etl_market_survey_spark.operators.decontam import decontaminate
from etl_market_survey_spark.operators.sampling import hash_ring_negatives
from etl_market_survey_spark.operators.similarity import cosine_topk, ivf_topk

K = 10
TERMS = ["hash", "scan", "merge"]
RRF_K = 60


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. keep the serving corpus clean of the eval slice (src0)
    bench = docs.filter(F.col("source") == "src0")
    corpus = decontaminate(
        docs.filter(F.col("source") != "src0"), bench, "doc_id", "text", n=4
    )
    n_corpus = corpus.count()

    # 2. lexical: BM25 top-k for the query terms
    lex = (
        bm25_scores(corpus, TERMS)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(K)
    )
    lex_ids = [r.doc_id for r in lex.collect()]

    # 3/4. dense: exact cosine baseline vs the IVF serving path
    queries = emb.filter(F.col("vec_id") == 0)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=K)
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=K, n_cells=8, nprobe=4)
    exact_ids = {r.vec_id for r in exact.collect()}
    approx_ids = {r.vec_id for r in approx.collect()}
    recall = len(exact_ids & approx_ids) / K

    # 5. hybrid: RRF merge of dense + lexical rankings
    dense_rank = exact.select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("rd")
    )
    lex_rank = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rl"),
    )
    fused = (
        dense_rank.join(lex_rank, "doc_id", "outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.lit(1.0) / (RRF_K + F.col("rd")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_K + F.col("rl")), F.lit(0.0))
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(K)
    )
    fused_ids = [r.doc_id for r in fused.collect()]

    # 6. contrastive negatives for the fused candidates' training feed
    negs = hash_ring_negatives(corpus, "doc_id", k=2)
    n_negs = negs.count()

    print(
        f"corpus={n_corpus} lexical_topk={len(lex_ids)} "
        f"ann_recall@{K}={recall:.2f} fused={len(fused_ids)} negatives={n_negs}"
    )
    assert len(lex_ids) == K and len(fused_ids) == K
    assert recall >= 0.5, f"IVF nprobe=4/8 recall collapsed: {recall}"
    # every fused doc came from one of the two source rankings
    assert set(fused_ids) <= (exact_ids | set(lex_ids))
    assert n_negs == 2 * n_corpus  # the ring balance law
    return {
        "corpus": n_corpus,
        "recall": recall,
        "fused": fused_ids,
    }


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    out = main(get_spark(), *(sys.argv[1:] or []))
    print(out)
