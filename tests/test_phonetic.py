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


def test_jw_model_matches_duckdb():
    import duckdb
    import random

    from etl_market_survey_spark.operators.phonetic import jaro_winkler_py

    rng = random.Random(3)
    words = ["martha", "marhta", "dwayne", "duane", "dixon", "dicksonx",
             "jellyfish", "smellyfish", "", "a", "ab", "same"]
    words += ["".join(rng.choice("abcde") for _ in range(rng.randint(0, 10)))
              for _ in range(40)]
    con = duckdb.connect()
    for a in words:
        for b in words[:15]:
            got = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert abs(got - jaro_winkler_py(a, b)) < 1e-12, (a, b)


def test_jw_soundex_blocked_is_subset_with_high_recall(spark):
    from etl_market_survey_spark.operators.phonetic import jaro_winkler_pairs

    rows = [(i, n) for i, n in enumerate(
        ["martha", "marhta", "marta", "dwayne", "duane", "jonathan",
         "johnathan", "kristina", "christina", "smith", "smyth"]
    )]
    df = spark.createDataFrame(rows, "id long, name string")
    full = {
        (r.name_a, r.name_b): r.jw
        for r in jaro_winkler_pairs(df, "name", 0.85, block="all").collect()
    }
    blocked = {
        (r.name_a, r.name_b): r.jw
        for r in jaro_winkler_pairs(df, "name", 0.85, block="soundex").collect()
    }
    # blocked is a subset scoring identically
    for k, v in blocked.items():
        assert full[k] == v
    # phonetic variants with the same first letter are recalled
    assert ("marhta", "martha") in blocked
    assert ("smith", "smyth") in blocked
    # the documented recall loss: different first letters fall outside
    # soundex blocks (christina/kristina) — present in full, not blocked
    assert ("christina", "kristina") in full
    assert ("christina", "kristina") not in blocked
