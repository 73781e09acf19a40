

def test_ndcg_mrr_known_values(spark):
    import math

    from etl_market_survey_spark.operators.evalmetrics import ndcg_mrr_at_k

    runs = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("z", 9, 1)],
        "query_id string, doc_id long, rank long",
    )
    gold = spark.createDataFrame(
        [("q", 2, 2), ("q", 3, 1)],  # doc1 irrelevant; z has no judgments
        "query_id string, doc_id long, rel long",
    )
    got = {
        r["query_id"]: (r["dcg"], r["ndcg"], r["mrr"])
        for r in ndcg_mrr_at_k(runs, gold, k=3).collect()
    }
    # gains: doc1=0, doc2=3, doc3=1 at ranks 1,2,3
    dcg = 0 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 0 / math.log2(4)
    assert got["q"][0] == round(dcg, 9)
    assert got["q"][1] == round(dcg / idcg, 9)
    assert got["q"][2] == 0.5  # first relevant at rank 2
    assert got["z"] == (0.0, 0.0, 0.0)
