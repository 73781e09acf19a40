"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) — the MOSS local fingerprinting algorithm, Spark-first.

Pipeline: token k-grams -> per-gram XXH64 -> for every window of ``w``
consecutive gram positions select the MINIMUM hash (ties -> rightmost
occurrence, the paper's rule) -> the distinct selected (position, hash)
pairs are the document's fingerprints. Winnowing guarantees any shared
substring of length >= w + k - 1 tokens yields at least one shared
fingerprint, while storing only ~2/(w+1) of the gram hashes — the
locality property MinHash lacks (MinHash is global per doc; winnowing
localizes matches to positions).

Scale shape: one posexplode, two LEAD windows per doc (per-doc ordered
state, embarrassing partitioning on doc id), a bounded w-way window
explosion (``sequence(pos-w+1, pos)``), a per-(doc, window) argmin, and
a hash-keyed equi-join for cross-doc matches — candidates come only
from equal fingerprints, never all-pairs. Stop-fingerprints (hashes in
more than ``max_df`` docs) are dropped before pairing, the same
hot-key cap as the similarity-join family.

Cross-engine exactness: gram hashes are Spark's ``xxhash64(lit(0), s)``
which the oracle replays in SQL via functions/xxh64sql; everything else
is integer window algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """``(id, pos, fp)`` winnowed fingerprints: ``pos`` is the k-gram
    position of the selected hash, ``fp`` the signed-int64 XXH64."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(text_col), F.lit(TOKEN_RE), F.lit(0)
            )
        ).alias("pos", "tok"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(win) for i in range(1, k)]
    grams = toks.select(
        "id", "pos", F.concat_ws(" ", *parts).alias("s"),
        F.lead("tok", k - 1).over(win).isNotNull().alias("isfull"),
    ).filter("isfull")
    hashed = grams.select(
        "id", "pos", F.xxhash64(F.lit(0), F.col("s")).alias("h")
    )
    m = hashed.groupBy("id").agg(F.count("*").alias("m"))
    # every gram at pos participates in windows [pos-w+1, pos] ∩ [0, m-w]
    exploded = (
        hashed.join(m, "id")
        .filter(F.col("m") >= w)
        .select(
            "id",
            "pos",
            "h",
            F.explode(
                F.sequence(
                    F.greatest(F.col("pos") - (w - 1), F.lit(0)),
                    F.least(F.col("pos"), F.col("m") - w),
                )
            ).alias("ws"),
        )
    )
    # per-(doc, window) argmin (min hash, ties -> rightmost pos) as ONE
    # partial-aggregable min over struct(h, -pos): lexicographic min
    # picks the smallest hash, then the smallest negated pos = the
    # largest pos — the same winner as the row_number window this
    # replaces, but with map-side combine over the w×-exploded rows and
    # no per-(id, ws) sort (the explode output is already partitioned
    # by id from the LEAD windows, so neither form re-shuffles; the
    # sort over w×|grams| rows was the cost)
    return (
        exploded.groupBy("id", "ws")
        .agg(F.min(F.struct(F.col("h"), (-F.col("pos")).alias("_np"))).alias("_m"))
        .select("id", (-F.col("_m._np")).alias("pos"), F.col("_m.h").alias("fp"))
        .distinct()
    )


def shared_fingerprint_pairs(
    fps: DataFrame, min_shared: int = 2, max_df: int = 50
) -> DataFrame:
    """``(id_a, id_b, n_shared)`` document pairs sharing >= ``min_shared``
    distinct fingerprint hashes, after dropping hashes present in more
    than ``max_df`` documents (stop-fingerprints)."""
    per_doc = fps.select("id", "fp").distinct()
    df_count = per_doc.groupBy("fp").agg(F.count("*").alias("df"))
    kept = per_doc.join(
        df_count.filter(F.col("df") <= max_df).select("fp"), "fp"
    )
    a = kept.select(F.col("id").alias("id_a"), "fp")
    b = kept.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
