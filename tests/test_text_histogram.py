"""Text-function unit tests and the histogram golden against
np.histogram(bins='auto') (SURVEY §5.1/§7 'auto'-bin fidelity)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.functions.histogram import histogram
from etl_market_survey_spark.functions.text import (
    detect_language,
    fingerprint,
    n_tokens_re,
    n_tokens_ws,
    quality_score,
)


def test_histogram_matches_numpy_auto(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(50, 12, 5000)
    counts_np, edges_np = np.histogram(vals, bins="auto")
    out = (
        histogram(spark.createDataFrame(pd.DataFrame({"x": vals})), "x")
        .orderBy("bin")
        .toPandas()
    )
    assert len(out) <= len(counts_np) == out["bin"].max() + 1  # empty bins absent
    # densify and compare counts exactly
    dense = np.zeros(len(counts_np), dtype=int)
    dense[out["bin"].to_numpy()] = out["count"].to_numpy()
    assert (dense == counts_np).all()
    assert out["lo"].iloc[0] == pytest.approx(edges_np[0])
    assert out["hi"].iloc[-1] == pytest.approx(edges_np[-1])


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and looked at the dog",),
            ("der hund ist nicht auf der strasse und das haus",),
            ("el perro y el gato en la casa con un libro",),
            ("xyzzy qwerty plugh",),
        ],
        "text string",
    )
    out = [r[0] for r in df.select(detect_language("text")).collect()]
    assert out == ["en", "de", "es", "und"]


def test_token_counts_and_fingerprint(spark):
    df = spark.createDataFrame([("Hello world, 42 times!",)], "text string")
    row = df.select(
        n_tokens_ws("text").alias("ws"),
        n_tokens_re("text").alias("re"),
        fingerprint("text").alias("fp"),
        quality_score("text").alias("q"),
    ).collect()[0]
    assert row["ws"] == 4
    assert row["re"] == 4  # hello, world, 42, times
    assert len(row["fp"]) == 32
    assert 0.0 <= row["q"] <= 1.0
    # fingerprint is token-order insensitive
    df2 = spark.createDataFrame([("world, Hello times! 42",)], "text string")
    fp2 = df2.select(fingerprint("text")).collect()[0][0]
    assert fp2 == row["fp"]


def test_distributed_stats_bit_equal_sorted(spark, sf_dir):
    """The recursive bucket-selection quantile path must reproduce the
    sorted-array path bit-for-bit (same interpolation expression, exact
    counted ranks) — including under duplicate pileups."""
    import numpy as np
    import pandas as pd

    from etl_market_survey_spark.functions.histogram import (
        _stats,
        _stats_distributed,
        histogram,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for colname in ("l_extendedprice", "l_discount"):
        a = _stats(li, colname).collect()[0].asDict()
        b = _stats_distributed(li, colname, n_buckets=64, levels=2).collect()[0].asDict()
        assert a == b, colname

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {"x": np.concatenate([np.full(500, 3.14), rng.normal(0, 1, 200), np.full(300, -1.0)])}
    )
    df = spark.createDataFrame(pdf)
    assert (
        _stats(df, "x").collect()[0].asDict()
        == _stats_distributed(df, "x", n_buckets=16, levels=3).collect()[0].asDict()
    )

    ha = histogram(li, "l_extendedprice").orderBy("bin").collect()
    hb = histogram(li, "l_extendedprice", stats_impl="distributed").orderBy("bin").collect()
    assert ha == hb


# --- PII redaction ----------------------------------------------------------

from etl_market_survey_spark.functions.text import redact_pii, sql_redact_pii  # noqa: E402


def test_redact_pii_rules_and_order(spark):
    rows = [
        ("mail john.doe+x@mail.example.com t", "mail <email> t"),
        ("ip 192.168.0.1 end", "ip <ip> end"),
        ("card 4111111111111111 w", "card <card> w"),
        ("call +1 (415) 555-0199 now", "call <phone> now"),
        ("both a@b.io and 10.0.0.7 and 555-123-4567", "both <email> and <ip> and <phone>"),
        ("clean text 42", "clean text 42"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r[0] for r in df.select(redact_pii("text")).collect()]
    assert got == [want for _, want in rows]


def test_redact_pii_idempotent_and_sql_parity(spark):
    import duckdb

    texts = [
        "a@b.cc 1.2.3.4 4111111111111111 +1 415 555 0199",
        "edge 255.255.255.255.255 mail a.b@c.d.ee",
        "digits 1234567890123 mid 12345678901234567890 long",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = [r[0] for r in df.select(redact_pii("text").alias("r")).collect()]
    twice = [
        r[0]
        for r in df.select(redact_pii(redact_pii("text")).alias("r")).collect()
    ]
    assert once == twice  # tags contain no redactable substrings
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = [r[0] for r in con.execute(f"select {sql_redact_pii('text')} from t").fetchall()]
    assert once == want
