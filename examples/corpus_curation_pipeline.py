"""Worked example — the full training-data curation pipeline end-to-end
on the documents table, composing the engine's curation operators the
way a 100 TB corpus run would chain them:

  1. normalize + redact      (functions/text.normalize_text)
  2. exact dedup on the normalized digest (survivor = min doc_id)
  3. benchmark decontamination (word-4-gram broadcast semi-join
     against the src0 "eval set")                 (operators/decontam)
  4. quality gate: repetition rules (distinct ratio, top-unigram
     fraction) + language filter
  5. near-dup sweep: MinHash-LSH candidates -> connected components
     -> canonical survivors                       (operators/dedup,
                                                   operators/components)
  6. context-window chunking (16-token windows, stride 12) and
     greedy sequence packing into 64-token bins   (operators/prefix)
  7. strict next-fit packing + JSONL manifest     (operators/packing)
  8. selection: DSIR domain weights, temperature-flattened mixture,
     token-budget cap, hash-ring contrastive negatives
                         (operators/dsir, mixing, prefix, sampling)

Each stage prints its surviving-row count; the script asserts the
monotone-shrink invariant (every gate only removes rows) and that the
final packed bins respect the budget. Run:

  python examples/corpus_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.functions.text import (
    TOKEN_PATTERN,
    detect_language,
    normalize_text,
)
from etl_market_survey_spark.operators.components import dedup_canonical
from etl_market_survey_spark.operators.decontam import decontaminate
from etl_market_survey_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from etl_market_survey_spark.operators.prefix import pack_bins_cumsum

CHUNK, STRIDE, BIN_BUDGET = 16, 12, 64


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. normalize + redact; keep the digest for exact dedup
    normed = docs.withColumn("norm", normalize_text("text")).withColumn(
        "digest", F.md5("norm")
    )

    # 2. exact dedup: survivor = min doc_id per normalized digest
    from pyspark.sql.window import Window

    w = Window.partitionBy("digest").orderBy("doc_id")
    # the spine frames below each feed 3-6 downstream consumers; persist
    # them so every consumer doesn't recompute the whole upstream chain
    # (normalize -> dedup -> decontam -> quality -> LSH) from the scan
    exact = normed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn").persist()
    n1 = exact.count()

    # 3. decontaminate against the src0 benchmark slice
    bench = exact.filter(F.col("source") == "src0")
    train = exact.filter(F.col("source") != "src0")
    clean = decontaminate(train, bench, "doc_id", "text", n=4).persist()
    n2 = clean.count()

    # 4. quality gate: repetition rules + language coverage
    toks = clean.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("tok"),
    )
    uc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    stats = uc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top1"),
    )
    good_ids = stats.filter(
        (2 * F.col("n_distinct") >= F.col("n_tok"))
        & (5 * F.col("top1") <= F.col("n_tok"))
        & (F.col("n_tok") >= 10)
    ).select("doc_id")
    lang_ok = clean.withColumn("lang_det", detect_language("text")).filter(
        F.col("lang_det") != "und"
    )
    quality = lang_ok.join(good_ids, "doc_id", "left_semi").persist()
    n3 = quality.count()

    # 5. near-dup sweep: MinHash-LSH -> components -> canonical survivors
    sig = minhash_signatures(quality, "doc_id", "text", n_hashes=16, shingle_n=3, mode="xxhash64")
    pairs = lsh_candidate_pairs(sig, "doc_id", n_hashes=16, n_bands=4)
    survivors = (
        dedup_canonical(quality, pairs, "doc_id")
        .filter(F.col("canonical_id") == F.col("doc_id"))
        .drop("canonical_id")
        .persist()
    )
    n4 = survivors.count()

    # 6. chunk + pack
    tl = survivors.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0)).alias("t"),
    )
    n = F.size("t")
    grid = F.sequence(F.lit(0), F.floor((F.greatest(n - 1, F.lit(0))) / STRIDE).cast("int"))
    chunks = (
        tl.select("doc_id", "t", F.explode(grid).alias("chunk_id"))
        .filter(F.col("chunk_id") * STRIDE < n)
        .select(
            "doc_id",
            "chunk_id",
            F.size(F.slice("t", F.col("chunk_id") * STRIDE + 1, CHUNK)).alias("n_tokens"),
        )
    ).persist()
    n5 = chunks.count()
    ordered = chunks.withColumn(
        "_ord", F.col("doc_id") * 1000 + F.col("chunk_id")
    )
    packed = pack_bins_cumsum(
        ordered, order_col="_ord", size_col="n_tokens", budget=BIN_BUDGET
    )
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("fill"))
    n_bins = bins.count()
    # packing contract: a chunk is never split, so a bin may overflow by
    # at most (max chunk - 1) when a chunk spans the budget boundary
    max_chunk = chunks.agg(F.max("n_tokens")).collect()[0][0]
    over_contract = bins.filter(
        F.col("fill") > BIN_BUDGET + max_chunk - 1
    ).count()

    # 7. exact next-fit packing of the same chunks (the strict-budget
    #    alternative: never overflows, sequential per hash shard) and a
    #    JSONL manifest export — the handoff format training jobs read.
    from etl_market_survey_spark.operators.packing import pack_bins_nosplit
    from etl_market_survey_spark.sources.writers import write_jsonl

    strict = pack_bins_nosplit(
        chunks.withColumn("_cid", F.col("doc_id") * 1000 + F.col("chunk_id")),
        "_cid",
        "n_tokens",
        capacity=BIN_BUDGET,
    )
    strict_over = (
        strict.groupBy("shard", "bin_id")
        .agg(F.max("bin_used").alias("fill"))
        .filter(F.col("fill") > BIN_BUDGET)
        .count()
    )
    import tempfile

    manifest_dir = tempfile.mkdtemp(prefix="curation_manifest_")
    write_jsonl(strict, manifest_dir)
    n_manifest = spark.read.json(manifest_dir).count()

    # 8. round-2 selection stages on the near-dup survivors: DSIR
    #    domain weighting (target = head sources), temperature-flattened
    #    mixture draw, a token-budget cap, and hash-ring contrastive
    #    negatives for the selected set.
    from etl_market_survey_spark.operators.dsir import dsir_logweights
    from etl_market_survey_spark.operators.mixing import (
        temperature_weights,
        weighted_mix,
    )
    from etl_market_survey_spark.operators.prefix import (
        distributed_cumsum,
        distributed_rank,
    )
    from etl_market_survey_spark.operators.sampling import hash_ring_negatives

    surv = survivors  # full rows: quality gate minus near-dup losers
    # src0 was consumed as the benchmark in stage 3 -> target the next head sources
    target_srcs = ("src1", "src2", "src3")
    dsir = dsir_logweights(
        surv, "doc_id", "text", F.col("source").isin(*target_srcs), n_buckets=256
    )
    n_dsir_pos = dsir.filter(
        ~F.col("is_target") & (F.col("logw") > 0)
    ).count()

    mix_w = temperature_weights(
        {s: 2.0 ** i for i, s in enumerate(target_srcs)}, tau=2.0
    )
    mixed = weighted_mix(
        surv, "source", mix_w, total=min(40, n4), id_cols=["doc_id"]
    )
    n_mixed = mixed.count()

    sized = surv.select(
        "doc_id",
        "n_chars",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))
        ).cast("long").alias("n_tok"),
        (-F.col("n_chars")).alias("_negq"),
    )
    ranked = distributed_rank(sized, "_negq", ["doc_id"], out="_sel")
    budgeted = distributed_cumsum(ranked, "_sel", "n_tok", out="_cum").filter(
        F.col("_cum") <= 2000
    )
    n_budget = budgeted.count()

    negs = hash_ring_negatives(surv, "doc_id", k=2)
    n_negs = negs.count()
    for _df in (exact, clean, quality, survivors, chunks):
        _df.unpersist()

    print(
        f"docs={n0} exact_dedup={n1} decontaminated={n2} quality={n3} "
        f"neardup_survivors={n4} chunks={n5} bins={n_bins} "
        f"strict_bins_overflowed={strict_over} manifest_rows={n_manifest} "
        f"dsir_in_domain={n_dsir_pos} mixed={n_mixed} budgeted={n_budget} "
        f"negatives={n_negs}"
    )
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0, "gates must only remove rows"
    assert n5 >= n4, "every surviving doc yields >= 1 chunk"
    assert over_contract == 0, "bin overflow must stay under one chunk"
    assert strict_over == 0, "next-fit bins must never exceed the budget"
    assert n_manifest == n5, "manifest covers every chunk exactly once"
    assert n_mixed <= min(40, n4), "mixer never exceeds its total"
    assert n_budget <= n4 and n_negs == 2 * n4, "selection stages consistent"
    return {
        "docs": n0, "exact": n1, "clean": n2, "quality": n3,
        "survivors": n4, "chunks": n5, "bins": n_bins,
        "manifest": n_manifest, "mixed": n_mixed, "budgeted": n_budget,
    }


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    out = main(get_spark(), *(sys.argv[1:] or []))
    print(out)
