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


def test_em_recovers_known_mu(spark):
    """Synthetic pairs drawn from known (p, m, u): EM must recover the
    generating parameters within sampling tolerance."""
    import random

    rng = random.Random(42)
    # >= 3 fields: the conditional-independence model is unidentifiable
    # with 2 binary fields (5 params vs 3 free pattern stats)
    p_true, m_true, u_true = 0.2, [0.95, 0.85, 0.9], [0.08, 0.2, 0.12]
    rows = []
    for i in range(20_000):
        is_match = rng.random() < p_true
        probs = m_true if is_match else u_true
        rows.append((i, *[rng.random() < pr for pr in probs]))
    pairs = spark.createDataFrame(
        rows, "pid long, agr_f1 boolean, agr_f2 boolean, agr_f3 boolean"
    )
    from etl_market_survey_spark.operators.linkage import estimate_mu_em

    fields = [FieldSpec("f1"), FieldSpec("f2"), FieldSpec("f3")]
    p, fitted = estimate_mu_em(pairs, fields, p_init=0.3, m_init=0.8, u_init=0.3)
    assert abs(p - p_true) < 0.05
    # label swap cannot happen with these inits (m_init > u_init and the
    # true classes are separable), so compare directly
    for i in range(3):
        assert abs(fitted[i].m - m_true[i]) < 0.05, i
        assert abs(fitted[i].u - u_true[i]) < 0.05, i


def test_em_deterministic(spark):
    from etl_market_survey_spark.operators.linkage import estimate_mu_em

    fields = [
        FieldSpec("name", "levenshtein", tol=2),
        FieldSpec("price", "numeric", tol=0.5),
    ]
    pairs = blocked_pairs(_df(spark), "id", ["blk"], ["name", "price"])
    a = estimate_mu_em(pairs, fields)
    b = estimate_mu_em(pairs, fields)
    assert a[0] == b[0]
    assert [(f.m, f.u) for f in a[1]] == [(f.m, f.u) for f in b[1]]


def test_agreement_patterns_counts(spark):
    from etl_market_survey_spark.operators.linkage import agreement_patterns

    fields = [
        FieldSpec("name", "levenshtein", tol=2),
        FieldSpec("price", "numeric", tol=0.5),
    ]
    pairs = blocked_pairs(_df(spark), "id", ["blk"], ["name", "price"])
    pats = {
        (r["agr_name"], r["agr_price"]): r["n"]
        for r in agreement_patterns(pairs, fields).collect()
    }
    # (1,2) agrees on both; (1,3) and (2,3) disagree on both
    assert pats == {(True, True): 1, (False, False): 2}


def test_sorted_neighborhood_pairs_exact_window(spark):
    from etl_market_survey_spark.operators.linkage import sorted_neighborhood_pairs

    # ranks are the order of `key`; every row pairs with its w successors
    rows = [(i, float(i * 7 % 101), f"n{i}") for i in range(40)]  # unique keys
    df = spark.createDataFrame(rows, "id long, key double, name string")
    w = 3
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", "key", w, ["name"]).collect()
    )
    order = [i for i, _, _ in sorted(rows, key=lambda r: r[1])]
    want = sorted(
        (order[i], order[j])
        for i in range(len(order))
        for j in range(i + 1, min(i + w + 1, len(order)))
    )
    assert got == want
    assert len(got) == 40 * w - w * (w + 1) // 2  # n*w minus the tail


def test_sorted_neighborhood_partition_invariant(spark):
    from etl_market_survey_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [(i, float(1000 - i), f"n{i}") for i in range(100)]
    df1 = spark.createDataFrame(rows, "id long, key double, name string").repartition(2)
    df2 = df1.repartition(16)
    a = sorted(
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df1, "id", "key", 5, ["name"]).collect()
    )
    b = sorted(
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df2, "id", "key", 5, ["name"]).collect()
    )
    assert a == b
