"""XXH64-in-SQL: the Python model is pinned bit-exact against Spark's
F.xxhash64, and the generated DuckDB SQL is pinned against the model —
the two-hop chain that makes q52's xxhash64 MinHash exact-gateable."""

import random

from pyspark.sql import functions as F

from etl_market_survey_spark.functions.xxh64sql import (
    hash_int,
    hash_long,
    sql_xxhash64_str,
    to_signed,
    xxhash64_int_str,
)

STRINGS = [
    "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
    "abcdefghi", "x" * 31, "y" * 32, "z" * 33, "q" * 40, "m" * 64,
    "n" * 65, "hello world foo", "w" * 100, "über-naïve 東京",
]


def _cases(n=40, seed=7):
    rng = random.Random(seed)
    extra = [
        "".join(rng.choice("abcdefghij xyz") for _ in range(rng.randint(0, 90)))
        for _ in range(n)
    ]
    return sorted(set(STRINGS + extra))


def test_python_model_matches_spark_xxhash64(spark):
    cases = [(i, s) for i in range(3) for s in _cases()]
    df = spark.createDataFrame(cases, "i int, s string").withColumn(
        "h", F.xxhash64("i", "s")
    )
    for r in df.collect():
        assert r.h == xxhash64_int_str(r.i, r.s), (r.i, repr(r.s))


def test_python_model_matches_spark_int_long(spark):
    vals = [(0, 0), (1, -1), (2, 1 << 40), (-5, -(1 << 50)), (123, 456)]
    df = spark.createDataFrame(vals, "i int, l long").select(
        "i", "l", F.xxhash64("i").alias("hi"), F.xxhash64("l").alias("hl")
    )
    for r in df.collect():
        assert r.hi == to_signed(hash_int(r.i, 42))
        assert r.hl == to_signed(hash_long(r.l & ((1 << 64) - 1), 42))


def test_sql_replay_matches_model():
    import duckdb

    strings = _cases()
    seeds = [hash_int(i, 42) for i in range(4)]
    con = duckdb.connect()
    con.execute("CREATE TABLE src (s VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?)", [(s,) for s in strings])
    sql = (
        "WITH RECURSIVE "
        + sql_xxhash64_str("src", seeds)
        + "\nSELECT s, hi, hv FROM xxh"
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == len(strings) * 4
    for s, hi, hv in rows:
        assert hv == xxhash64_int_str(hi, s), (repr(s), hi)


def test_hll_model_matches_spark(spark):
    import random

    from pyspark.sql import functions as F

    from etl_market_survey_spark.functions.hllsql import hll_count_longs

    rng = random.Random(31)
    for n, rsd in [(30, 0.05), (5000, 0.02), (60000, 0.02), (20000, 0.05)]:
        vals = [rng.randint(-2**62, 2**62) for _ in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = df.agg(F.approx_count_distinct("v", rsd=rsd)).first()[0]
        assert got == hll_count_longs(vals, rsd), (n, rsd)


def test_hll_sql_matches_model():
    import random

    import duckdb

    from etl_market_survey_spark.functions.hllsql import (
        hll_count_longs,
        sql_hll_count_longs,
    )

    rng = random.Random(29)
    datasets = {
        "tiny": [rng.randint(0, 10**5) for _ in range(25)],       # linear count
        "mid": [rng.randint(0, 10**9) for _ in range(7000)],      # bias branch
        "big": [rng.randint(-2**60, 2**60) for _ in range(70000)],  # raw branch
    }
    import pandas as pd

    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (g VARCHAR, v BIGINT)")
    all_pairs = pd.DataFrame(
        [(g, v) for g, vals in datasets.items() for v in set(vals)],
        columns=["g", "v"],
    )
    con.register("all_pairs", all_pairs)
    # bulk insert: executemany is row-at-a-time (~26s for these 77k rows)
    con.execute("INSERT INTO pairs SELECT g, v FROM all_pairs")
    sql = (
        "WITH RECURSIVE gp AS (SELECT DISTINCT g, v FROM pairs),\n"
        + sql_hll_count_longs("gp", 0.05)
        + "\nSELECT g, approx FROM hll_out"
    )
    rows = dict(con.execute(sql).fetchall())
    for g, vals in datasets.items():
        assert rows[g] == hll_count_longs(set(vals), 0.05), g
