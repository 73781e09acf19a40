"""Fellegi-Sunter record linkage: pair generation, agreement kinds,
weight math, and end-to-end classification."""

from etl_market_survey_spark.operators.linkage import (
    FieldSpec,
    blocked_pairs,
    classify,
    link_records,
    score_pairs,
)


def _df(spark):
    rows = [
        (1, "blk", "red widget", 10.0),
        (2, "blk", "red widgets", 10.2),   # near-dup of 1
        (3, "blk", "blue bolt", 55.0),
        (4, "other", "red widget", 10.0),  # same payload, different block
    ]
    return spark.createDataFrame(rows, "id long, blk string, name string, price double")


def test_blocked_pairs_respects_blocks_and_order(spark):
    pairs = blocked_pairs(_df(spark), "id", ["blk"], ["name", "price"]).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    # only within-block pairs, each unordered pair once, no self-pairs
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_score_and_weights(spark):
    fields = [
        FieldSpec("name", "levenshtein", tol=2, m=0.9, u=0.05),
        FieldSpec("price", "numeric", tol=0.5, m=0.8, u=0.1),
    ]
    pairs = blocked_pairs(_df(spark), "id", ["blk"], ["name", "price"])
    scored = {(r["id_a"], r["id_b"]): r for r in score_pairs(pairs, fields).collect()}
    # use the spec's own weight properties: (1-m) in float is not the
    # same double as a hand-written 0.1, and scores are bit-exact
    w_name_a, w_name_d = fields[0].agree_weight, fields[0].disagree_weight
    w_price_a, w_price_d = fields[1].agree_weight, fields[1].disagree_weight
    # (1,2): levenshtein("red widget","red widgets")=1 <= 2, |Δprice|=0.2
    assert scored[(1, 2)]["agr_name"] and scored[(1, 2)]["agr_price"]
    assert scored[(1, 2)]["score"] == (0.0 + w_name_a) + w_price_a
    # (1,3): both disagree
    assert not scored[(1, 3)]["agr_name"] and not scored[(1, 3)]["agr_price"]
    assert scored[(1, 3)]["score"] == (0.0 + w_name_d) + w_price_d


def test_exact_kind_is_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "b", None), (2, "b", None), (3, "b", "x")], "id long, blk string, v string"
    )
    fields = [FieldSpec("v", "exact", m=0.9, u=0.1)]
    pairs = blocked_pairs(df, "id", ["blk"], ["v"])
    scored = {(r["id_a"], r["id_b"]): r["agr_v"] for r in score_pairs(pairs, fields).collect()}
    assert scored[(1, 2)] is True      # null == null under eqNullSafe
    assert scored[(1, 3)] is False


def test_classify_three_way(spark):
    df = spark.createDataFrame([(5.0,), (2.0,), (-3.0,)], "score double")
    got = sorted(
        r["link_class"] for r in classify(df, lower=0.0, upper=4.0).collect()
    )
    assert got == ["match", "non_match", "possible"]


def test_link_records_end_to_end(spark):
    fields = [
        FieldSpec("name", "levenshtein", tol=2, m=0.9, u=0.05),
        FieldSpec("price", "numeric", tol=0.5, m=0.8, u=0.1),
    ]
    linked = link_records(_df(spark), "id", ["blk"], fields, lower=0.0, upper=4.0)
    by_pair = {(r["id_a"], r["id_b"]): r["link_class"] for r in linked.collect()}
    assert by_pair[(1, 2)] == "match"
    assert by_pair[(1, 3)] == "non_match"
