"""Text-analysis queries (training-data pipeline, first-class).

q22_text_stats — per-document language ID, quality score, token counts,
                 fingerprint.
q23_lang_rollup — per-language aggregate over detected text features.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    TOKEN_PATTERN,
    detect_language,
    fingerprint,
    n_tokens_re,
    n_tokens_ws,
    quality_score,
    sql_fingerprint,
    sql_n_tokens_re,
    sql_n_tokens_ws,
    sql_stopword_hits,
    sql_words,
)
from .registry import load, register

_HITS = {lang: sql_stopword_hits("text", lang) for lang in sorted(STOPWORDS)}
_MX = f"GREATEST({', '.join(_HITS.values())})"
_LANG_CASE = (
    f"CASE WHEN {_MX} = 0 THEN 'und' "
    + " ".join(f"WHEN {_HITS[lang]} = {_MX} THEN '{lang}'" for lang in sorted(STOPWORDS))
    + " END"
)

_QUALITY_SQL = f"""(
  LEAST((CAST(LENGTH(text) AS DOUBLE) / GREATEST(CAST({sql_n_tokens_ws('text')} AS DOUBLE), 1.0)) / 8.0, 1.0)
  + LEAST(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE) / GREATEST(CAST({sql_n_tokens_ws('text')} AS DOUBLE), 1.0), 1.0)
  + LEAST((CAST({sql_stopword_hits('text', 'en')} AS DOUBLE) / GREATEST(CAST({sql_n_tokens_ws('text')} AS DOUBLE), 1.0)) * 5.0, 1.0)
) / 3.0"""

_Q22_ORACLE = f"""
SELECT doc_id,
       {sql_n_tokens_ws('text')} AS n_tokens_ws,
       {sql_n_tokens_re('text')} AS n_tokens_re,
       {_LANG_CASE} AS lang_detected,
       {_QUALITY_SQL} AS quality,
       {sql_fingerprint('text')} AS fingerprint
FROM documents ORDER BY doc_id
"""


@register("q22_text_stats", _Q22_ORACLE)
def q22_text_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens_ws("text").alias("n_tokens_ws"),
        n_tokens_re("text").alias("n_tokens_re"),
        detect_language("text").alias("lang_detected"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


_Q23_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM({sql_n_tokens_ws('text')}) AS BIGINT) AS total_tokens,
       CAST(SUM({sql_n_tokens_ws('text')}) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


@register("q23_lang_rollup", _Q23_ORACLE)
def q23_lang_rollup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tokens_ws("text")).cast("bigint").alias("total_tokens"),
            (
                F.sum(n_tokens_ws("text")).cast("double") / F.count("*")
            ).alias("avg_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang")
    )
