"""Worked example — preference-data (reward-model) curation.

The RLHF data-prep shape: candidate responses are quality-scored with
the trigram language model, near-duplicates are removed with winnowing
fingerprints (the MOSS locality guarantee — a shared >= w+k-1-token run
is always caught), preference PAIRS are assembled between quality
tiers, and per-source Bradley-Terry strengths summarize which sources
win the comparisons — the exact model a reward model is then trained
against.

Stages (all exact-gated operators — q293, q300, q308 cover them):

  1. LM quality score   — stupid-backoff trigram bits/token (q293)
  2. Near-dup removal   — winnowing fingerprints + shared-pair drop,
                          keeping each pair's better-scored doc (q300)
  3. Pair assembly      — chosen/rejected pairs across quality median,
                          same language, deterministic pairing
  4. Source strengths   — Bradley-Terry MM over per-source pair wins
                          (q308's fold, driver-side on the tiny
                          source x source table)

Run: python examples/preference_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.operators.winnowing import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)
from etl_market_survey_spark.plans.registry import QUERIES, load


def bradley_terry(wins: np.ndarray, n_iter: int = 20) -> np.ndarray:
    """Hunter's MM on a small wins matrix (driver-side: the source
    dimension is bounded; the distributed form is q308)."""
    n = wins.shape[0]
    w = np.ones(n)
    total_wins = wins.sum(axis=1)
    m = wins + wins.T
    for _ in range(n_iter):
        denom = np.array(
            [
                sum(
                    m[i, j] / (w[i] + w[j])
                    for j in range(n)
                    if j != i and m[i, j] > 0
                )
                for i in range(n)
            ]
        )
        w = np.where(denom > 0, total_wins / np.maximum(denom, 1e-12), w)
    return w / w.sum()


def main(sf_dir: str, out_dir: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("preference-data-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    docs = load(spark, sf_dir, "documents")

    # 1. quality: bits/token from the exact-gated LM query (scored half)
    scores = QUERIES["q293_lm_perplexity"](spark, sf_dir).select(
        "doc_id", "bits_per_token"
    )
    scored = docs.join(scores, "doc_id").cache()

    # 2. near-dup removal: winnowed fingerprints; for each shared-run
    # pair drop the WORSE-scored doc (higher bits/token)
    fps = winnow_fingerprints(scored, "doc_id", "text", k=3, w=4)
    dup_pairs = shared_fingerprint_pairs(fps, min_shared=2, max_df=50)
    ranked = (
        dup_pairs.join(
            scored.select(
                F.col("doc_id").alias("id_a"),
                F.col("bits_per_token").alias("bits_a"),
            ),
            "id_a",
        )
        .join(
            scored.select(
                F.col("doc_id").alias("id_b"),
                F.col("bits_per_token").alias("bits_b"),
            ),
            "id_b",
        )
    )
    losers = ranked.select(
        F.when(F.col("bits_a") > F.col("bits_b"), F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("doc_id")
    ).distinct()
    kept = scored.join(losers, "doc_id", "left_anti").cache()

    # 3. preference pairs: within language, best third vs worst third,
    # paired by quality rank (deterministic)
    lang_w = Window.partitionBy("lang").orderBy("bits_per_token", "doc_id")
    tiled = kept.select(
        "doc_id", "lang", "source", "bits_per_token",
        F.ntile(3).over(lang_w).alias("tier"),
        F.row_number().over(lang_w).alias("rk"),
    ).cache()
    best = tiled.filter(F.col("tier") == 1).select(
        "lang",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("rk"))
        .alias("k"),
        F.col("doc_id").alias("chosen"),
        F.col("source").alias("chosen_source"),
    )
    worst = tiled.filter(F.col("tier") == 3).select(
        "lang",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("rk"))
        .alias("k"),
        F.col("doc_id").alias("rejected"),
        F.col("source").alias("rejected_source"),
    )
    pairs = best.join(worst, ["lang", "k"]).cache()
    pairs.write.mode("overwrite").parquet(f"{out_dir}/preference_pairs")

    # 4. per-source Bradley-Terry from pair outcomes
    srcs = sorted(
        r["source"] for r in kept.select("source").distinct().collect()
    )
    idx = {s: i for i, s in enumerate(srcs)}
    wins = np.zeros((len(srcs), len(srcs)))
    for r in (
        pairs.groupBy("chosen_source", "rejected_source").count().collect()
    ):
        wins[idx[r["chosen_source"]], idx[r["rejected_source"]]] += r["count"]
    strength = bradley_terry(wins)
    report = list(zip(srcs, strength.round(6).tolist()))

    n_pairs = pairs.count()
    n_dropped = losers.count()
    print(f"docs kept: {kept.count()}  near-dups dropped: {n_dropped}")
    print(f"preference pairs: {n_pairs}")
    print("source strengths:", report)
    return n_pairs, n_dropped, dict(report)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/preference_data_out"
    main(sf, out)
