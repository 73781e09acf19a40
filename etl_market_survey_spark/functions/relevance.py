"""BM25 relevance scoring over a document corpus.

The standard Okapi BM25 ranking function (Robertson & Zaragoza 2009) as
a pure DataFrame composition — the relevance-scoring / quality-filter
stage of a training-data pipeline ("keep documents that match a topic
query", "rank corpus hits for inspection"):

    idf(t)      = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    score(d, q) = sum_t idf(t) * tf_td (k1+1) / (tf_td + k1 (1 - b + b dl_d/avgdl))

Scale shape: the query-term filter lands BEFORE the (doc, term) shuffle,
so tf/df aggregate only the matching postings (a vanishing corpus
fraction for selective queries); doc lengths are one map-side-combined
count per doc; N and avgdl are two scalars collected once. The idf table
is |query| rows — broadcast. Nothing driver-side scales with the corpus.

Determinism: tf / df / dl are exact integers on any engine; ln is
rounded to 9 decimals (libm last-ulp guard, the A-ES convention); each
term's contribution is rounded to 9 and summed per doc through the
exact decimal kernel (functions/stats.dsum), so scores are
order-independent and a SQL oracle replays them bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import dsum
from .text import TOKEN_PATTERN


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("term"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (docs matching no term
    are absent). Output: ``(id_col, score)``, score rounded to 6."""
    query_terms = sorted(set(query_terms))
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(docs, id_col, text_col)

    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    totals = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    n_docs = int(totals["n_docs"])
    avgdl = float(totals["total_tokens"]) / n_docs if n_docs else 1.0

    qt = toks.filter(F.col("term").isin(query_terms))
    tf = qt.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_t.withColumn(
        "idf",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            9,
        ),
    )

    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .withColumn(
            "contrib",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * (F.col("dl") / F.lit(avgdl))
                    )
                ),
                9,
            ),
        )
    )
    return contrib.groupBy(id_col).agg(
        F.round(dsum("contrib"), 6).alias("score")
    )


def sql_bm25_scores(
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB mirror of :func:`bm25_scores` (same expression tree, same
    rounding points) producing ``(id_col, score)``."""
    from .stats import sql_dsum

    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}')) AS term
  FROM {table}
),
dl AS (SELECT {id_col}, COUNT(*) AS dl FROM toks GROUP BY 1),
scal AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY 1, 2
),
idf AS (
  SELECT term,
         ROUND(LN((scal.n_docs - COUNT(*) + 0.5) / (COUNT(*) + 0.5) + 1.0), 9) AS idf
  FROM tf, scal GROUP BY term, scal.n_docs
),
contrib AS (
  SELECT tf.{id_col},
         ROUND(idf.idf * (tf.tf * {k1 + 1.0!r})
               / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * (dl.dl / scal.avgdl))), 9) AS contrib
  FROM tf
  JOIN idf USING (term)
  JOIN dl USING ({id_col})
  CROSS JOIN scal
)
SELECT {id_col}, ROUND({sql_dsum('contrib')}, 6) AS score
FROM contrib GROUP BY 1
"""
