"""Benchmark decontamination query (training-data curation family).

q68_decontaminate — treat source='src0' documents as the benchmark/eval
set and every other source as the training corpus; flag training docs
sharing any word 4-gram with the benchmark, roll up per language.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import sql_shingles
from ..operators.decontam import contaminated_ids
from .registry import load, register

_N = 4
_SH = sql_shingles("text", _N)

_Q68_ORACLE = f"""
WITH bench AS (
  SELECT DISTINCT unnest({_SH}) AS shingle FROM documents WHERE source = 'src0'
),
tr AS (SELECT doc_id, lang FROM documents WHERE source <> 'src0'),
trs AS (
  SELECT doc_id, unnest({_SH}) AS shingle FROM documents WHERE source <> 'src0'
),
cont AS (
  SELECT DISTINCT doc_id FROM trs WHERE shingle IN (SELECT shingle FROM bench)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_train,
       CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated,
       CAST(COUNT(*) - COUNT(c.doc_id) AS BIGINT) AS n_clean
FROM tr LEFT JOIN cont c USING (doc_id)
GROUP BY lang ORDER BY lang
"""


@register("q68_decontaminate", _Q68_ORACLE)
def q68_decontaminate(spark, sf_dir):
    """Contamination audit. Plan shape: the corpus side never shuffles —
    benchmark shingles broadcast into a map-side LeftSemi, only the
    (tiny) contaminated-id set and the per-lang partial aggregates move."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0").select("doc_id", "lang")
    bad = contaminated_ids(
        docs.filter(F.col("source") != "src0"), bench, "doc_id", "text", n=_N
    )
    flagged = train.join(
        F.broadcast(bad.withColumn("_c", F.lit(1))), "doc_id", "left"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            F.count("_c").cast("bigint").alias("n_contaminated"),
            (F.count("*") - F.count("_c")).cast("bigint").alias("n_clean"),
        )
        .orderBy("lang")
    )
