"""Worked example — the web-corpus curation pipeline end-to-end, the
Common Crawl shape on this engine's own operators:

  1. WARC ingestion (plain + gzip members)            (sources/warc)
  2. HTML -> clean text extraction                    (functions/html)
  3. URL parse + per-domain document cap              (functions/urls)
  4. quality rules (tokens, stopwords, language)      (functions/text)
  5. exact + MinHash near-dup removal with canonical
     survivors                                        (operators/dedup, components)
  6. GPT-style sequence packing of the survivors      (operators/packing)

Run: python examples/web_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.functions.html import html_links, strip_html
from etl_market_survey_spark.functions.text import detect_language, n_tokens_ws
from etl_market_survey_spark.functions.urls import cap_per_domain
from etl_market_survey_spark.operators.components import dedup_canonical
from etl_market_survey_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from etl_market_survey_spark.operators.packing import pack_sequences
from etl_market_survey_spark.sources.warc import build_warc, read_warc

STAGE = "/tmp/spark_graft_webcuration"


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    # 0: synthesize a small WARC capture: each doc wrapped in HTML,
    # URLs with md5-arithmetic domains (the q275/q276 fixtures' shape)
    shutil.rmtree(STAGE, ignore_errors=True)
    os.makedirs(STAGE)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200).collect()
    recs = []
    for r in docs:
        page = (
            f"<html><head><title>Doc {r['doc_id']}</title></head><body>"
            f"<p>{r['text']}</p>"
            f'<a href="https://site{r["doc_id"] % 20}.com/next">next</a>'
            "</body></html>"
        )
        recs.append(
            {
                "warc_type": "response",
                "target_uri": f"https://site{r['doc_id'] % 20}.com/doc/{r['doc_id']}",
                "warc_date": "2024-01-01T00:00:00Z",
                "content_type": "text/html",
                "payload": page.encode(),
            }
        )
    half = len(recs) // 2
    with open(f"{STAGE}/a.warc", "wb") as f:
        f.write(build_warc(recs[:half]))
    with open(f"{STAGE}/b.warc.gz", "wb") as f:
        f.write(build_warc(recs[half:], compress=True))

    # 1: distributed WARC scan
    raw = read_warc(spark, f"{STAGE}/*")
    print(f"warc records: {raw.count()}")

    # 2: HTML -> text (+ outlink count, a crawl-frontier signal)
    pages = raw.select(
        F.monotonically_increasing_id().alias("row_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("page"),
    ).select(
        "row_id",
        "url",
        strip_html("page").alias("text"),
        F.size(html_links("page")).alias("n_links"),
    )

    # 3: per-domain cap (8 docs/domain) in hash order
    capped = cap_per_domain(pages, "url", "row_id", max_per_domain=8)
    kept = capped.filter(F.col("kept"))
    print(f"after domain cap: {kept.count()} (domains: "
          f"{kept.select('domain').distinct().count()})")

    # 4: quality gate: length + language
    quality = kept.filter(
        (n_tokens_ws("text") >= 20) & (detect_language("text") == "en")
    )
    print(f"after quality: {quality.count()}")

    # 5: near-dup removal, best-quality survivor per cluster
    sigs = minhash_signatures(
        quality.select(F.col("row_id").alias("doc_id"), "text"),
        "doc_id", "text", n_hashes=32, shingle_n=3,
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=32, n_bands=8)
    surv = dedup_canonical(
        quality, pairs.select("id_a", "id_b"), "row_id"
    ).filter(F.col("row_id") == F.col("canonical_id"))
    print(f"after dedup: {surv.count()}")

    # 6: pack into 512-token training sequences
    packed = pack_sequences(
        surv.select(F.col("row_id").alias("doc_id"),
                    n_tokens_ws("text").alias("n_tokens")),
        "doc_id", "n_tokens", capacity=512,
    )
    n_seq = packed.select("shard", "seq_id").distinct().count()
    print(f"packed into {n_seq} sequences of <= 512 tokens")
    return surv


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("web-curation-example")
    spark.sparkContext.setLogLevel("ERROR")
    main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
