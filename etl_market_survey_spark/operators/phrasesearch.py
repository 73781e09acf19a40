"""Positional phrase search over an inverted index (beyond reference —
the exact-match retrieval primitive next to BM25/TF-IDF ranking).

"find documents containing the exact phrase w1 w2 ... wk" via
positional postings: the scan keeps ONLY the phrase's tokens (predicate
pushdown on the posting filter — the index never materializes for the
rest of the vocabulary), per-document position sets per term, and a
match is the intersection of the shifted sets
``P(w1) ∩ (P(w2) - 1) ∩ ... ∩ (P(wk) - (k-1))`` — one groupBy(doc)
shuffle, array arithmetic JVM-side, no per-start-position explosion.
Repeated phrase tokens are handled by construction (sets are per
TERM INDEX via the shared token's positions).

Scale shape: postings are filtered to k tokens before the shuffle, so
work is proportional to the phrase tokens' posting lists (as in any
search engine), never the corpus token count. The DuckDB oracle slides
a window over the token array per document — quadratic-ish but exact —
and must agree bit-for-bit on counts (q240).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words


def phrase_match_counts(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_matches) for documents containing the whitespace-token
    phrase at least once (lowercased, same tokenizer as
    ``functions.text.words``)."""
    terms = phrase.lower().split()
    if not terms:
        raise ValueError("empty phrase")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"),
    ).filter(F.col("w").isin(*set(terms)))
    per_doc = toks.groupBy(id_col).agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("w") == t, F.col("pos") - i))
            ).alias(f"_p{i}")
            for i, t in enumerate(terms)
        ]
    )
    starts = F.col("_p0")
    for i in range(1, len(terms)):
        starts = F.array_intersect(starts, F.col(f"_p{i}"))
    return (
        per_doc.select(F.col(id_col), F.size(starts).alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .select(id_col, F.col("n_matches").cast("long").alias("n_matches"))
    )


def sql_phrase_match_counts(
    table: str,
    id_expr: str,
    text_expr: str,
    phrase: str,
) -> str:
    """DuckDB mirror: slide a window over the token array — exact,
    independent algorithm, same counts."""
    from ..functions.text import sql_words

    terms = phrase.lower().split()
    k = len(terms)
    conds = " AND ".join(
        f"w[i + {i}] = '{t}'" for i, t in enumerate(terms)
    )
    return f"""
SELECT {id_expr}, n_matches FROM (
  SELECT {id_expr},
         CAST(COALESCE(list_sum(list_transform(
           generate_series(1, greatest(len(w) - {k - 1}, 0)),
           i -> CASE WHEN {conds} THEN 1 ELSE 0 END)), 0) AS BIGINT)
           AS n_matches
  FROM (SELECT {id_expr}, {sql_words(text_expr)} AS w FROM {table})
)
WHERE n_matches > 0
"""
