"""Worked example — supervised-fine-tuning data assembly, the stage
between a curated corpus and a training run:

  1. prompt/response pair synthesis from documents     (deterministic split)
  2. chat-template rendering with special tokens       (pure string ops)
  3. token budgeting: drop over-long samples           (functions/text)
  4. decontamination against an eval set               (operators/decontam)
  5. deterministic train/val split + epoch ordering    (hash ranks)
  6. sequence packing of the train split               (operators/packing)

Run: python examples/sft_assembly_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.functions.text import n_tokens_ws
from etl_market_survey_spark.operators.packing import pack_sequences

TEMPLATE_BUDGET = 96


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1: first 8 words become the "instruction", the rest the "response"
    toks = F.split(F.col("text"), " ")
    pairs = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("prompt"),
        F.concat_ws(" ", F.slice(toks, 9, 10_000)).alias("response"),
    ).filter(F.size(toks) > 12)

    # 2: chat-template render (the tokenizer-visible training string)
    rendered = pairs.withColumn(
        "sample",
        F.concat(
            F.lit("<|system|>You are a helpful assistant.<|end|>"),
            F.lit("<|user|>"), F.col("prompt"), F.lit("<|end|>"),
            F.lit("<|assistant|>"), F.col("response"), F.lit("<|end|>"),
        ),
    ).withColumn("n_tokens", n_tokens_ws("sample"))

    # 3: budget gate
    budgeted = rendered.filter(F.col("n_tokens") <= TEMPLATE_BUDGET)
    print(f"pairs: {pairs.count()}, within budget: {budgeted.count()}")

    # 4: decontaminate against a held-out eval prompt set
    from etl_market_survey_spark.operators.decontam import decontaminate

    eval_set = pairs.filter(F.col("doc_id") % 97 == 0).select(
        "doc_id", F.col("prompt").alias("text")
    )
    clean = decontaminate(
        budgeted.select("doc_id", F.col("prompt").alias("text"), "sample", "n_tokens"),
        eval_set,
        id_col="doc_id",
        text_col="text",
    )
    print(f"after decontamination: {clean.count()}")

    # 5: 95/5 split + epoch-0 order, both by hash (retry-stable)
    split = clean.withColumn(
        "is_train", F.pmod(F.xxhash64(F.lit(7), F.col("doc_id")), F.lit(20)) < 19
    ).withColumn("epoch0_rank", F.xxhash64(F.lit(0), F.col("doc_id")))
    train = split.filter(F.col("is_train"))
    print(f"train: {train.count()}, val: {split.count() - train.count()}")

    # 6: pack into 128-token sequences
    packed = pack_sequences(train, "doc_id", "n_tokens", capacity=128)
    n_seq = packed.select("shard", "seq_id").distinct().count()
    print(f"packed into {n_seq} sequences of <= 128 tokens")
    return train


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("sft-assembly-example")
    spark.sparkContext.setLogLevel("ERROR")
    main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
