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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def soundex_blocked_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int | None = None,
    salt: int = 1,
    hot_threshold: int = 10_000,
) -> DataFrame:
    """Candidate pairs of DISTINCT names sharing a soundex code:
    ``(name_a, name_b, sdx_code, dist)`` with ``name_a < name_b`` and
    exact levenshtein ``dist`` (filtered to ``<= max_dist`` when
    given — the bounded form keeps verification O(d * len)).

    ``salt > 1`` activates hot-code salting (VERDICT r4 item 8): codes
    with more than ``hot_threshold`` distinct names — soundex is coarse,
    max 26*7^3 values, so heavy hitters are certain at corpus scale —
    spread their candidate volume over ``salt`` shuffle partitions via
    :mod:`.salting`. Pair-identical to the unsalted join by
    construction (unit-pinned)."""
    names = (
        df.select(F.col(name_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("sdx_code", F.soundex("name"))
    )
    a = names.select(F.col("name").alias("name_a"), "sdx_code")
    b = names.select(F.col("name").alias("name_b"), "sdx_code")
    if salt > 1:
        from .salting import hot_keys, salted_join

        names = names.persist()  # histogram + both join sides share one scan
        hot = hot_keys(names, "sdx_code", hot_threshold)
        pairs = salted_join(
            a, b, "sdx_code", F.col("name_a"), hot=hot, n_salt=salt
        )
    else:
        pairs = a.join(b, "sdx_code")
    pairs = pairs.filter(F.col("name_a") < F.col("name_b"))
    if max_dist is not None:
        pairs = pairs.withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist)
        ).filter(F.col("dist") >= 0)
    else:
        pairs = pairs.withColumn("dist", F.levenshtein("name_a", "name_b"))
    return pairs.select(
        "name_a", "name_b", "sdx_code", F.col("dist").cast("long").alias("dist")
    )


def jaro_winkler_py(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Jaro-Winkler similarity, calibrated bit-compatible with DuckDB's
    ``jaro_winkler_similarity`` (tests pin 1,500+ pairs): empty strings
    score 0.0 even against themselves; the Winkler prefix boost (l <= 4,
    p = 0.1) applies only when jaro > 0.7."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > boost:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j += l * p * (1.0 - j)
    return j


def jaro_winkler_udf(a: Column, b: Column) -> Column:
    """Arrow-batched Jaro-Winkler column (round-6 double). Python is
    unavoidable here — the match-window alignment is a per-pair
    stateful scan no built-in expresses — so it runs as a pandas UDF
    over the (already blocked) candidate pairs, never the corpus."""

    @F.pandas_udf("double")
    def _jw(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                round(jaro_winkler_py(x or "", y or ""), 6)
                for x, y in zip(s1, s2)
            ]
        )

    return _jw(a, b)


def jaro_winkler_pairs(
    df: DataFrame,
    name_col: str,
    threshold: float = 0.85,
    block: str = "soundex",
    salt: int = 1,
    hot_threshold: int = 10_000,
) -> DataFrame:
    """Distinct-name pairs with Jaro-Winkler >= ``threshold``:
    ``(name_a, name_b, jw)``, name_a < name_b, jw rounded to 6.

    ``block='soundex'`` (the scale path) generates candidates from
    shared soundex codes — phonetic variants land in one block and
    work scales with block sizes, never all-pairs; pairs differing in
    their FIRST letter are out of recall by construction (they also
    forfeit the Winkler prefix boost, so high-threshold joins lose
    little — the recall unit pins this). ``block='all'`` is the exact
    all-pairs baseline for bounded inputs and the correctness oracle's
    shape (q236)."""
    names = (
        df.select(F.col(name_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
    )
    if block == "soundex":
        keyed = names.withColumn("_blk", F.soundex("name"))
        a = keyed.select(F.col("name").alias("name_a"), "_blk")
        b = keyed.select(F.col("name").alias("name_b"), "_blk")
        if salt > 1:
            from .salting import hot_keys, salted_join

            keyed = keyed.persist()
            hot = hot_keys(keyed, "_blk", hot_threshold)
            pairs = salted_join(
                a, b, "_blk", F.col("name_a"), hot=hot, n_salt=salt
            ).drop("_blk")
        else:
            pairs = a.join(b, "_blk").drop("_blk")
    elif block == "all":
        a = names.select(F.col("name").alias("name_a"))
        b = names.select(F.col("name").alias("name_b"))
        pairs = a.crossJoin(b)
    else:
        raise ValueError(f"unknown block mode {block!r}")
    return (
        pairs.filter(F.col("name_a") < F.col("name_b"))
        .withColumn("jw", jaro_winkler_udf(F.col("name_a"), F.col("name_b")))
        .filter(F.col("jw") >= F.lit(float(threshold)))
        .select("name_a", "name_b", "jw")
    )
