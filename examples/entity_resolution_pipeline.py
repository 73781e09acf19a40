"""Worked example — entity resolution end-to-end on dirty person
records, composing the engine's record-linkage family the way an MDM /
identity pipeline chains it:

  1. phonetic blocking: soundex keys bound the candidate space
                                                  (operators/phonetic)
  2. field comparison + Fellegi-Sunter log-likelihood scoring over the
     blocked pairs (exact / levenshtein / numeric agreement predicates)
                                                  (operators/linkage)
  3. fuzzy reinforcement: Jaro-Winkler on names for the 'possible' band
                                                  (operators/phonetic)
  4. transitive closure: matched pairs -> connected components ->
     canonical entity ids                         (operators/components)

Run: python examples/entity_resolution_pipeline.py
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.operators.components import connected_components
from etl_market_survey_spark.operators.linkage import (
    FieldSpec,
    blocked_pairs,
    classify,
    score_pairs,
)
from etl_market_survey_spark.operators.phonetic import jaro_winkler_udf

# dirty duplicates: typos, swapped digits, phonetic variants
RECORDS = [
    (1, "robert", "martinez", 1984, "12 oak st"),
    (2, "robert", "martines", 1984, "12 oak st"),      # typo surname
    (3, "rupert", "martinez", 1984, "12 oak street"),  # phonetic first
    (4, "maria", "gonzalez", 1990, "7 elm ave"),
    (5, "maria", "gonsalez", 1991, "7 elm ave"),       # typo + year slip
    (6, "john", "smith", 1975, "3 main rd"),
    (7, "jon", "smyth", 1975, "3 main rd"),            # phonetic both
    (8, "alice", "wong", 2001, "9 pine ct"),           # singleton
]


def main(spark):
    df = spark.createDataFrame(
        RECORDS, "rec_id long, first string, last string, born int, addr string"
    )

    # 1: block on soundex(last) — candidate space is per-block, never n^2
    blocked = df.withColumn("blk", F.soundex("last"))
    pairs = blocked_pairs(
        blocked, "rec_id", ["blk"], ["first", "last", "born", "addr"]
    )
    n_pairs = pairs.count()
    print(f"== {n_pairs} candidate pairs from soundex blocks "
          f"(vs {len(RECORDS)*(len(RECORDS)-1)//2} all-pairs) ==")

    # 2: Fellegi-Sunter scoring with per-field m/u weights
    fields = [
        FieldSpec("first", "levenshtein", tol=2, m=0.9, u=0.1),
        FieldSpec("last", "levenshtein", tol=2, m=0.95, u=0.02),
        FieldSpec("born", "numeric", tol=1, m=0.9, u=0.05),
        FieldSpec("addr", "levenshtein", tol=4, m=0.85, u=0.05),
    ]
    decided = classify(score_pairs(pairs, fields), lower=0.0, upper=6.0)

    # 3: reinforce the gray zone with Jaro-Winkler on the full name
    decided = decided.withColumn(
        "jw",
        jaro_winkler_udf(
            F.concat_ws(" ", "first_a", "last_a"),
            F.concat_ws(" ", "first_b", "last_b"),
        ),
    ).withColumn(
        "final_match",
        (F.col("link_class") == "match")
        | ((F.col("link_class") == "possible") & (F.col("jw") >= 0.90)),
    )
    print("== scored pairs ==")
    for r in decided.orderBy("id_a", "id_b").collect():
        print(f"  ({r.id_a},{r.id_b}) score {r.score:+.2f} jw {r.jw:.3f}"
              f" -> {r.link_class} / match={r.final_match}")

    # 4: transitive closure -> canonical entity ids
    edges = decided.filter("final_match").select("id_a", "id_b")
    comps = connected_components(edges, "id_a", "id_b")
    entities = (
        df.join(comps, df["rec_id"] == comps["node"], "left")
        .select(
            "rec_id",
            F.coalesce("comp", "rec_id").alias("entity_id"),
            "first",
            "last",
        )
        .orderBy("entity_id", "rec_id")
    )
    print("== resolved entities ==")
    rows = entities.collect()
    for r in rows:
        print(f"  entity {r.entity_id}: rec {r.rec_id} ({r.first} {r.last})")

    clusters = {}
    for r in rows:
        clusters.setdefault(r.entity_id, set()).add(r.rec_id)
    got = {frozenset(v) for v in clusters.values()}
    want = {
        frozenset({1, 2, 3}),
        frozenset({4, 5}),
        frozenset({6, 7}),
        frozenset({8}),
    }
    assert got == want, got
    return entities


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("entity-resolution-example")
    spark.sparkContext.setLogLevel("ERROR")
    main(spark)
    print("entity resolution pipeline OK")
