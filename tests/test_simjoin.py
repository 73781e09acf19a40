"""Prefix-filtered similarity join: exact equality with brute force,
prefix-length arithmetic, trigram parity with DuckDB."""

import itertools

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.simjoin import (
    similarity_self_join,
    sql_trigrams,
    trigrams,
)


def _brute(rows, t_num, t_den):
    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        a, b = set(ta), set(tb)
        inter = len(a & b)
        if t_den * inter >= t_num * (len(a | b)):
            out.add((min(ia, ib), max(ia, ib)))
    return out


def test_matches_brute_force(spark):
    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),   # J(1,2) = 3/5 = 0.6
        (3, ["a", "b", "c", "d"]),   # J(1,3) = 1
        (4, ["x", "y"]),
        (5, ["x", "y", "z"]),        # J(4,5) = 2/3
        (6, ["q"]),
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    for t_num, t_den in ((1, 2), (3, 5), (2, 3), (9, 10), (1, 1)):
        got = {
            (r.id_a, r.id_b)
            for r in similarity_self_join(df, "id", "toks", t_num, t_den).collect()
        }
        assert got == _brute(rows, t_num, t_den), (t_num, t_den)


def test_randomized_against_brute_force(spark):
    import random

    rng = random.Random(3)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (i, rng.sample(vocab, rng.randrange(1, 8))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    for t_num, t_den in ((1, 2), (7, 10)):
        got = {
            (r.id_a, r.id_b)
            for r in similarity_self_join(df, "id", "toks", t_num, t_den).collect()
        }
        assert got == _brute(rows, t_num, t_den), (t_num, t_den)


def test_verify_counts_are_exact(spark):
    rows = [(1, ["a", "b", "c"]), (2, ["b", "c", "d"])]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    out = similarity_self_join(df, "id", "toks", 1, 2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.inter, r.n_a, r.n_b) == (2, 3, 3)


def test_trigrams_match_duckdb(spark):
    import duckdb

    rows = [("Customer#000000001",), ("ab",), ("abc",), ("hello world",)]
    df = spark.createDataFrame(rows, "s string")
    got = [sorted(r[0]) for r in df.select(trigrams("s")).collect()]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = [
        sorted(r[0])
        for r in con.execute(f"select {sql_trigrams('s')} from t").fetchall()
    ]
    assert got == want


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, ["a"])], "id long, toks array<string>")
    import pytest

    with pytest.raises(ValueError):
        similarity_self_join(df, "id", "toks", 0, 5)
    with pytest.raises(ValueError):
        similarity_self_join(df, "id", "toks", 6, 5)


def _brute_containment(rows, t_num, t_den):
    out = set()
    for (ia, ta) in rows:
        for (ib, tb) in rows:
            if ia == ib:
                continue
            inter = len(set(ta) & set(tb))
            if t_den * inter >= t_num * len(set(ta)):
                out.add((ia, ib))
    return out


def test_containment_matches_brute_force(spark):
    from etl_market_survey_spark.operators.simjoin import containment_join

    rows = [
        (1, ["a", "b", "c"]),
        (2, ["a", "b", "c", "d", "e"]),   # 1 fully contained in 2
        (3, ["a", "b", "x"]),             # C(3->2) = 2/3
        (4, ["z"]),
        (5, ["z", "q"]),                  # 4 contained in 5
        (6, ["a", "b", "c"]),             # mutual containment with 1
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    for t_num, t_den in ((1, 1), (9, 10), (2, 3), (1, 2)):
        got = {
            (r.id_a, r.id_b)
            for r in containment_join(df, "id", "toks", t_num, t_den).collect()
        }
        assert got == _brute_containment(rows, t_num, t_den), (t_num, t_den)


def test_containment_randomized(spark):
    import random

    from etl_market_survey_spark.operators.simjoin import containment_join

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, rng.sample(vocab, rng.randint(1, 8))) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>")
    for t_num, t_den in ((1, 1), (3, 4)):
        got = {
            (r.id_a, r.id_b)
            for r in containment_join(df, "id", "toks", t_num, t_den).collect()
        }
        assert got == _brute_containment(rows, t_num, t_den), (t_num, t_den)
