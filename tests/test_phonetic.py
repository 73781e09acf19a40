"""Soundex: python model pinned vs F.soundex, SQL CTE pinned vs model,
and the blocking operator's contract."""

import random
import string

from pyspark.sql import functions as F

from etl_market_survey_spark.functions.soundexsql import (
    soundex_py,
    sql_soundex_cte,
)

EDGE = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "", "a", "h", "wh", "123", "1abc", "O'Brien", "van Dyke",
    "MacDonald", "ll", "hw", "aeiou", "bfpv", "HWHW", "bob", "chwb",
    "cwhhab", "chc", "bwb", "bhb", "b-b", "a1a", "ab1c", "abc1def",
    "b?b", "büb", "bXüXb", "Ça", "ßb", "Robert2", "  bob", "b  ob",
    "Tymczak Jr.", "jjjj", "sks", "wrr", "ybb", "hhb", "BBb", "x-ray",
]


def _cases(n=60, seed=5):
    rng = random.Random(seed)
    alpha = string.ascii_letters + " -'?1ü"
    extra = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15)))
        for _ in range(n)
    ]
    return sorted(set(EDGE + extra))


def test_python_model_matches_spark_soundex(spark):
    cases = _cases()
    df = spark.createDataFrame([(s,) for s in cases], "s string").select(
        "s", F.soundex("s").alias("sx")
    )
    for r in df.collect():
        assert r.sx == soundex_py(r.s), repr(r.s)


def test_sql_cte_matches_model():
    import duckdb

    cases = [c for c in _cases() if c != ""] + [""]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in cases])
    sql = (
        "WITH RECURSIVE "
        + sql_soundex_cte("t")
        + "\nSELECT s, sdx_code FROM sdx"
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == len(cases)
    for s, got in rows:
        assert got == soundex_py(s), repr(s)


def test_blocked_pairs_share_code_and_verify(spark):
    from etl_market_survey_spark.operators.phonetic import (
        soundex_blocked_pairs,
    )

    df = spark.createDataFrame(
        [(1, "Smith"), (2, "Smyth"), (3, "Schmidt"), (4, "Jones"),
         (5, "Smith")],  # duplicate collapses via distinct
        "id long, name string",
    )
    out = soundex_blocked_pairs(df, "name").collect()
    pairs = {(r.name_a, r.name_b): (r.sdx_code, r.dist) for r in out}
    assert ("Smith", "Smyth") in pairs
    code, dist = pairs[("Smith", "Smyth")]
    assert code == "S530" and dist == 1
    assert all("Jones" not in p for p in pairs)  # J520 blocks alone

    capped = soundex_blocked_pairs(df, "name", max_dist=1).collect()
    assert {(r.name_a, r.name_b) for r in capped} == {("Smith", "Smyth")}
