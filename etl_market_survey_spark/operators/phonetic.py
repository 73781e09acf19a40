"""Phonetic (soundex) blocking for entity resolution — beyond reference.

The classic record-linkage blocking key: names that SOUND alike share an
American Soundex code, so candidate pairs come from an equi-join on the
code — never all-pairs — and an exact comparator (bounded levenshtein)
decides. Complements the q-gram prefix filter (``editdist``) and the
Fellegi-Sunter model (``linkage``): soundex blocks catch phonetic
variants ("Smith"/"Smyth") that q-grams score poorly.

Spark-first: ``F.soundex`` is a JVM expression (whole-stage codegen);
the DuckDB oracle replays the soundex automaton itself via
``functions/soundexsql`` (recursive-CTE fold pinned bit-exact against
F.soundex), so the whole chain is gate-able (q235).

Scale shape: one shuffle on the code. Soundex codes are coarse (max
26 * 7^3 values), so at corpus scale run it over DISTINCT names (the
deduper's real input) and/or salt hot codes; the verify stage is
bounded-levenshtein per candidate, O(d * len).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def soundex_blocked_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int | None = None,
) -> DataFrame:
    """Candidate pairs of DISTINCT names sharing a soundex code:
    ``(name_a, name_b, sdx_code, dist)`` with ``name_a < name_b`` and
    exact levenshtein ``dist`` (filtered to ``<= max_dist`` when
    given — the bounded form keeps verification O(d * len))."""
    names = (
        df.select(F.col(name_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("sdx_code", F.soundex("name"))
    )
    a = names.select(F.col("name").alias("name_a"), "sdx_code")
    b = names.select(F.col("name").alias("name_b"), "sdx_code")
    pairs = a.join(b, "sdx_code").filter(F.col("name_a") < F.col("name_b"))
    if max_dist is not None:
        pairs = pairs.withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist)
        ).filter(F.col("dist") >= 0)
    else:
        pairs = pairs.withColumn("dist", F.levenshtein("name_a", "name_b"))
    return pairs.select(
        "name_a", "name_b", "sdx_code", F.col("dist").cast("long").alias("dist")
    )
