"""Unicode normalization kernel (functions/unicodenorm): all four UAX
#15 forms vs stdlib ground truth, null passthrough, and the dedup
motivation (decomposed/composed forms hash together after NFC).

All non-ASCII is spelled with explicit escapes — combining characters
are invisible in editors and silently normalizable by tooling."""

import unicodedata

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.functions.unicodenorm import unicode_normalize

DECOMPOSED = "e" + chr(0x0301) + "clair"   # e + combining acute
COMPOSED = chr(0x00E9) + "clair"           # precomposed e-acute
SAMPLES = [
    DECOMPOSED,
    COMPOSED,
    chr(0xFB01) + "le",       # fi ligature (compatibility form)
    chr(0x2460) + " first",   # circled digit one (compatibility form)
    "A" + chr(0x030A) + "ring",  # A + combining ring above
    "plain ascii",
    "",
]


class TestUnicodeNormalize:
    @pytest.mark.parametrize("form", ["NFC", "NFD", "NFKC", "NFKD"])
    def test_matches_stdlib(self, spark, form):
        df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
        got_pairs = {
            (r["s"], r["n"])
            for r in df.select("s", unicode_normalize("s", form).alias("n"))
            .collect()
        }
        assert got_pairs == {(s, unicodedata.normalize(form, s)) for s in SAMPLES}

    def test_null_passthrough(self, spark):
        df = spark.createDataFrame([(None,), ("x",)], "s string")
        rows = {
            r["n"]
            for r in df.select(unicode_normalize("s").alias("n")).collect()
        }
        assert rows == {None, "x"}

    def test_nfc_unifies_dup_hashes(self, spark):
        assert DECOMPOSED != COMPOSED  # genuinely different codepoints
        df = spark.createDataFrame(
            [(1, DECOMPOSED), (2, COMPOSED)], "id long, s string"
        )
        n = (
            df.select(F.sha2(unicode_normalize("s"), 256).alias("h"))
            .distinct()
            .count()
        )
        assert n == 1  # the whole point: forms collapse before dedup

    def test_bad_form_raises(self, spark):
        with pytest.raises(ValueError):
            unicode_normalize("s", "NFX")
