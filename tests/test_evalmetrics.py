

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


def test_cuped_known_values(spark):
    from etl_market_survey_spark.operators.evalmetrics import (
        cuped_adjusted_means,
    )

    # y = x + variant lift: theta -> 1, adjustment removes ALL covariate
    # noise, so adjusted means show the pure lift
    rows = []
    for i in range(40):
        x = ((i // 2) * 37) % 100  # same x across the variant pair -> cov(x,v)=0
        v = i % 2
        rows.append((v, x, x + 10 * v))
    df = spark.createDataFrame(rows, "variant long, x long, y long")
    got = {
        r["variant"]: r
        for r in cuped_adjusted_means(df, "variant", "y", "x").collect()
    }
    assert abs(got[0]["theta"] - 1.0) < 1e-9
    assert abs(got[1]["mean_y_adj"] - got[0]["mean_y_adj"] - 10.0) < 1e-6
    assert got[0]["var_reduction_factor"] < 0.05  # almost all variance explained


def test_sq8_quantize_constant_dimension(spark):
    from etl_market_survey_spark.operators.similarity import sq8_quantize

    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0]), (3, [1.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    q, stats = sq8_quantize(df, "vec_id", "embedding")
    st = {r["pos"]: (r["mn"], r["mx"]) for r in stats.collect()}
    assert st[0] == (1.0, 1.0)  # degenerate dim
    codes = {r["vec_id"]: r["qvec"] for r in q.collect()}
    assert all(c[0] == 0 for c in codes.values())  # constant dim -> code 0
    assert codes[1][1] == 0 and codes[2][1] == 255  # min/max hit the rails
