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
    sql_normalize_text,
    sql_stopword_hits,
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


_Q48_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, source, n_chars,
         {sql_n_tokens_ws('text')} AS n_tok,
         {_QUALITY_SQL} AS quality,
         md5(text) AS digest
  FROM documents
),
survivors AS (
  SELECT *, row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
  FROM scored
),
curated AS (
  SELECT * FROM survivors
  WHERE rn = 1 AND quality >= 0.5 AND n_tok >= 20
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(FLOOR(quality * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_quality
FROM curated GROUP BY lang ORDER BY lang
"""


@register("q48_corpus_curation", _Q48_ORACLE)
def q48_corpus_curation(spark, sf_dir):
    """The end-to-end training-data curation pipeline: score -> exact-dedup
    (keep lowest doc_id per digest) -> quality/length filter -> per-lang
    token budget. One plan: scan, window on digest, filter, one groupBy."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        n_tokens_ws("text").alias("n_tok"),
        quality_score("text").alias("quality"),
        F.md5("text").alias("digest"),
    )
    w = Window.partitionBy("digest").orderBy("doc_id")
    curated = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("quality") >= 0.5) & (F.col("n_tok") >= 20))
    )
    return (
        curated.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            (
                F.sum(F.floor(F.col("quality") * 1000000.0).cast("decimal(38,0)")).cast("double")
                / 1000000.0
            ).alias("sum_quality"),
        )
        .orderBy("lang")
    )


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


_Q61_ORACLE = """
WITH toks AS (
  SELECT lang, lower(unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'))) AS token
  FROM documents
),
counts AS (
  SELECT lang, token, COUNT(*) AS cnt FROM toks GROUP BY lang, token
)
SELECT lang, token, cnt, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk
  FROM counts
) WHERE rk <= 10 ORDER BY lang, rk
"""


@register("q61_token_heavy_hitters", _Q61_ORACLE)
def q61_token_heavy_hitters(spark, sf_dir):
    """Heavy hitters: top-10 tokens per language by exact count.

    Scale shape: the token stream (the 100 TB part) hits ONE partial-
    aggregated groupBy(lang, token) — map-side combine collapses each
    task's token stream to its local vocabulary before the only
    full-size shuffle. The top-k window then runs over the counts table
    (vocabulary-sized, not corpus-sized), and row_number+filter triggers
    the WindowGroupLimit rewrite so even that shuffle carries at most
    k rows per (lang x map partition). Skewed languages are therefore
    bounded at every exchange. (For unbounded vocabularies where even
    counts don't fit, swap stage 1 for df.stat.countMinSketch + a
    candidate pre-filter; exact counting is preferred while the
    vocabulary fits a shuffle, which at ~1e8 distinct tokens it does.)
    """
    from ..operators.windows import top_k_per_group

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[A-Za-z]+|[0-9]+"), F.lit(0))
        ).alias("token"),
    )
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    return top_k_per_group(
        counts, ["lang"], [F.col("cnt").desc(), F.col("token")], k=10
    ).orderBy("lang", "rk")


_Q65_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+') AS t
  FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2
),
m2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
m1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM((1000000 * m2.c2) // m1.c1) AS BIGINT) AS fluency
FROM big b JOIN m2 USING (w1, w2) JOIN m1 USING (w1)
GROUP BY b.doc_id ORDER BY b.doc_id
"""


@register("q65_bigram_fluency", _Q65_ORACLE)
def q65_bigram_fluency(spark, sf_dir):
    """Self-trained bigram LM fluency per document — model build (two
    vocab-sized aggs) + scoring join + per-doc rollup, all in exact
    integer arithmetic so the DuckDB replay hash-matches the scores."""
    from ..functions.text import bigram_fluency

    docs = load(spark, sf_dir, "documents")
    return bigram_fluency(docs).orderBy("doc_id")


_Q70_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+')) AS tok
  FROM documents
),
uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
u AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top1_cnt
  FROM uc GROUP BY 1
),
tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+') AS t
  FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM tl, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2
),
bc AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM big GROUP BY 1, 2, 3),
b AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_cnt FROM bc GROUP BY 1)
SELECT u.doc_id, n_tok, n_distinct, top1_cnt,
       COALESCE(top_bigram_cnt, 0) AS top_bigram_cnt,
       CAST(CASE WHEN 2 * n_distinct >= n_tok
                  AND 5 * top1_cnt <= n_tok
                  AND 10 * COALESCE(top_bigram_cnt, 0) <= n_tok
            THEN 1 ELSE 0 END AS INT) AS keep
FROM u LEFT JOIN b ON u.doc_id = b.doc_id
ORDER BY u.doc_id
"""


@register("q70_repetition_filter", _Q70_ORACLE)
def q70_repetition_filter(spark, sf_dir):
    """Gopher-style repetition quality rules, all-integer so the oracle
    hash-matches: distinct-token ratio >= 1/2, top-unigram fraction
    <= 1/5, top-bigram fraction <= 1/10. Two token-level aggregations
    (map-side combined) joined on doc_id — the corpus-sized explode
    collapses to per-doc rows before any wide shuffle."""
    from ..functions.text import TOKEN_PATTERN

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("tok"),
    )
    uc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    u = uc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tok"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top1_cnt"),
    )
    withws = docs.withColumn(
        "_ws", F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))
    ).filter(F.size("_ws") >= 2)
    bg = withws.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_ws") - 2),
                lambda i: F.concat_ws(" ", F.get("_ws", i), F.get("_ws", i + 1)),
            )
        ).alias("bg"),
    )
    bc = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    b = bc.groupBy("doc_id").agg(F.max("c").cast("bigint").alias("top_bigram_cnt"))
    n_tok, top1, topb = F.col("n_tok"), F.col("top1_cnt"), F.col("top_bigram_cnt")
    return (
        u.join(b, "doc_id", "left")
        .withColumn("top_bigram_cnt", F.coalesce(topb, F.lit(0)))
        .withColumn(
            "keep",
            (
                (2 * F.col("n_distinct") >= n_tok)
                & (5 * top1 <= n_tok)
                & (10 * topb <= n_tok)
            ).cast("int"),
        )
        .orderBy("doc_id")
    )


_CMS_T = 900

_Q76_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+')) AS token
  FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks GROUP BY 1 HAVING COUNT(*) >= {_CMS_T}
ORDER BY token
"""


@register("q76_cms_heavy_hitters", _Q76_ORACLE)
def q76_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters, exact-gated: the oracle is the
    plain GROUP BY ... HAVING — the sketch stage must only prune (its
    no-underestimate guarantee makes candidates a superset), never
    change the answer. Exchanges are bounded by depth*width per task in
    the build and by surviving occurrences in the verify."""
    from ..operators.sketch import cms_heavy_hitters

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("token")
    )
    return cms_heavy_hitters(toks, "token", threshold=_CMS_T).orderBy("token")


_CHUNK, _STRIDE = 16, 12  # window of 16 tokens, overlap 4

_Q82_ORACLE = f"""
WITH tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(s.i AS INT) AS chunk_id,
         t[s.i * {_STRIDE} + 1 : s.i * {_STRIDE} + {_CHUNK}] AS c
  FROM tl, UNNEST(generate_series(0, GREATEST(len(t) - 1, 0) // {_STRIDE})) AS s(i)
  WHERE s.i * {_STRIDE} < len(t)
)
SELECT doc_id, chunk_id,
       CAST(len(c) AS INT) AS n_tokens,
       md5(array_to_string(c, ' ')) AS chunk_digest
FROM chunks ORDER BY doc_id, chunk_id
"""


@register("q82_doc_chunking", _Q82_ORACLE)
def q82_doc_chunking(spark, sf_dir):
    """Context-window chunking: split each document into overlapping
    fixed-size token windows (stride < window), the standard LLM
    pre-tokenization step. Map-only: tokenize, explode the start grid,
    slice — no shuffle at all until a consumer asks for one; the chunk
    table inherits the corpus partitioning."""
    docs = load(spark, sf_dir, "documents")
    tl = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), F.lit(0)).alias("t"),
    )
    n = F.size("t")
    grid = F.sequence(F.lit(0), F.floor((F.greatest(n - 1, F.lit(0))) / _STRIDE).cast("int"))
    chunks = (
        tl.select("doc_id", "t", F.explode(grid).alias("chunk_id"))
        .filter(F.col("chunk_id") * _STRIDE < n)
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.slice("t", F.col("chunk_id") * _STRIDE + 1, _CHUNK).alias("c"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("c").cast("int").alias("n_tokens"),
        F.md5(F.array_join("c", " ")).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_id")


_Q83_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_num_runs,
       md5({sql_normalize_text('text')}) AS norm_digest
FROM documents ORDER BY doc_id
"""


@register("q83_normalize_redact", _Q83_ORACLE)
def q83_normalize_redact(spark, sf_dir):
    """Text normalization + number redaction (the canonicalization pass
    that runs before exact dedup in a real corpus pipeline): lowercase,
    digit runs -> '<num>', whitespace squash. Map-only; digests make
    the normalized text hash-comparable without shipping it."""
    from ..functions.text import normalize_text

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0)))
        .cast("int")
        .alias("n_num_runs"),
        F.md5(normalize_text("text")).alias("norm_digest"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q93 — BM25 relevance scoring (Okapi BM25, Robertson & Zaragoza 2009):
# score every document against a 3-term topic query. tf/df/dl are exact
# integers; ln and each term contribution round to 9 decimals and the
# per-doc sum runs through the exact decimal kernel, so the oracle
# (built by the same module, identical expression tree) matches
# bit-for-bit.
# ---------------------------------------------------------------------------

_Q93_TERMS = ["spark", "vector", "join"]


def _q93_oracle() -> str:
    from ..functions.relevance import sql_bm25_scores

    return f"""
WITH scored AS ({sql_bm25_scores(_Q93_TERMS)})
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id
"""


@register("q93_bm25", _q93_oracle())
def q93_bm25(spark, sf_dir):
    from ..functions.relevance import bm25_scores

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_scores(docs, _Q93_TERMS).orderBy(F.desc("score"), "doc_id")


# ---------------------------------------------------------------------------
# q94 — PII redaction (emails / IPv4s / card numbers / phones -> typed
# tags). The corpus carries no real PII, so both engines synthesize the
# same PII-laced text from customer columns (the q77 pattern:
# deterministic payloads from testdata), then apply the ordered rule
# chain; the gate hash-compares the redacted strings row-by-row, pinning
# every pattern, the rule order, and replace-all semantics.
# ---------------------------------------------------------------------------


def _q94_oracle() -> str:
    from ..functions.text import sql_redact_pii

    text = (
        "'user ' || CAST(c_custkey AS VARCHAR) || ' <' || lower(c_name) || "
        "'@corp.example.org> ip 10.' || CAST(c_nationkey AS VARCHAR) || '.0.' || "
        "CAST(c_custkey % 200 AS VARCHAR) || ' card 4111 2222 3333 4444 or "
        "4111222233334444, call +1 (415) 555-0199, acct ' || CAST(c_acctbal AS VARCHAR)"
    )
    return f"""
SELECT c_custkey, {sql_redact_pii(f'({text})')} AS redacted
FROM customer ORDER BY c_custkey
"""


@register("q94_pii_redaction", _q94_oracle())
def q94_pii_redaction(spark, sf_dir):
    from ..functions.text import redact_pii

    cust = load(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("user "), F.col("c_custkey").cast("string"),
        F.lit(" <"), F.lower("c_name"), F.lit("@corp.example.org> ip 10."),
        F.col("c_nationkey").cast("string"), F.lit(".0."),
        (F.col("c_custkey") % 200).cast("string"),
        F.lit(" card 4111 2222 3333 4444 or 4111222233334444, call +1 (415) 555-0199, acct "),
        F.col("c_acctbal").cast("string"),
    )
    return cust.select(
        "c_custkey", redact_pii(text).alias("redacted")
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q108 — temperature-based domain mixing (XLM-R-style alpha sampling):
# rebalance the corpus so low-resource languages are upsampled,
# p_d ∝ n_d^0.5. Quotas are integer-exact cross-engine (correctly-
# rounded sqrt -> floor -> bigint division), the draw is the
# deterministic md5 hash rank, so the oracle recomputes the identical
# quota table from raw counts and replays the identical draw with a
# row_number window. Output is the selected rows themselves.
# ---------------------------------------------------------------------------

_Q108_TOTAL = 300
_Q108_SEED = 13


def _q108_oracle() -> str:
    from ..operators.sampling import sql_hash_rank

    h = sql_hash_rank(["doc_id"], _Q108_SEED)
    return f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1
),
w AS (
  SELECT lang, n,
         CAST(FLOOR(SQRT(CAST(n AS DOUBLE) * 1000000.0)) AS BIGINT) AS wd
  FROM counts
),
quota AS (
  SELECT lang, LEAST(n, {_Q108_TOTAL} * wd // (SELECT SUM(wd) FROM w)) AS q
  FROM w
),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rk
  FROM documents
)
SELECT r.lang, r.doc_id
FROM ranked r JOIN quota USING (lang)
WHERE r.rk <= quota.q
ORDER BY 1, 2
"""


@register("q108_temperature_mixing", _q108_oracle())
def q108_temperature_mixing(spark, sf_dir):
    from ..operators.sampling import temperature_mixing

    docs = load(spark, sf_dir, "documents")
    out = temperature_mixing(
        docs, "lang", ["doc_id"], _Q108_TOTAL, alpha=0.5, seed=_Q108_SEED
    )
    return out.select("lang", "doc_id").orderBy("lang", "doc_id")


# ---------------------------------------------------------------------------
# q112/q113 — TF-IDF vectors + inverted-index cosine similarity
# (operators/tfidf.py). q112 gates the whole vector pipeline (tokenize
# -> tf -> smooth idf -> L2 normalize) value-exact; q113 gates the
# posting-list pair join + exact-decimal dot products at sim >= 0.8.
# ---------------------------------------------------------------------------

_TFIDF_CTE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
idf AS (
  SELECT term, round(ln((1.0 + n.n) / (1.0 + COUNT(*))) + 1.0, 9) AS idf
  FROM tf, n GROUP BY term, n.n
),
w0 AS (
  SELECT doc_id, tf.term, round(tf * idf, 9) AS w0
  FROM tf JOIN idf ON tf.term = idf.term
),
nrm AS (
  SELECT doc_id,
         round(sqrt({dsum_w0sq}), 9) AS nrm
  FROM w0 GROUP BY doc_id
),
v AS (
  SELECT w0.doc_id, term, round(w0 / nrm, 9) AS w
  FROM w0 JOIN nrm USING (doc_id)
)
"""


def _tfidf_cte():
    from ..functions.stats import sql_dsum

    return _TFIDF_CTE.format(dsum_w0sq=sql_dsum("w0 * w0"))


_Q112_ORACLE = _tfidf_cte() + """
SELECT doc_id, term, w FROM v ORDER BY doc_id, term
"""


@register("q112_tfidf_vectors", _Q112_ORACLE)
def q112_tfidf_vectors(spark, sf_dir):
    from ..operators.tfidf import tfidf_postings

    docs = load(spark, sf_dir, "documents")
    return tfidf_postings(docs, "doc_id", "text").orderBy("doc_id", "term")


_Q113_MIN_SIM = 0.8


def _q113_oracle():
    from ..functions.stats import sql_dsum

    return _tfidf_cte() + f"""
, sims AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round({sql_dsum('a.w * b.w')}, 6) AS sim
  FROM v a JOIN v b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, sim FROM sims WHERE sim >= {_Q113_MIN_SIM}
ORDER BY id_a, id_b
"""


@register("q113_tfidf_cosine", _q113_oracle())
def q113_tfidf_cosine(spark, sf_dir):
    from ..operators.tfidf import tfidf_cosine_pairs, tfidf_postings

    docs = load(spark, sf_dir, "documents")
    post = tfidf_postings(docs, "doc_id", "text")
    return tfidf_cosine_pairs(post, _Q113_MIN_SIM).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q135 — Python UDTF (Spark 4 table function API): one doc row expands
# to one row per delimiter-bounded segment with its index and length —
# the shape (flatMap with computed metadata) that pure explode makes
# awkward. The UDTF yields per-partition without driver involvement;
# the oracle replays the segmentation with list arithmetic. Coverage
# for the last PySpark API family (UDTF) next to pandas_udf /
# applyInPandas / mapInPandas / applyInPandasWithState.
# ---------------------------------------------------------------------------

_Q135_ORACLE = """
WITH segs AS (
  SELECT doc_id,
         string_split(text, ' the ') AS parts
  FROM documents WHERE doc_id < 100
),
x AS (
  SELECT doc_id,
         generate_subscripts(parts, 1) AS seg_idx,
         unnest(parts) AS seg
  FROM segs
)
SELECT doc_id, CAST(seg_idx - 1 AS INT) AS seg_idx, seg,
       CAST(len(seg) AS INT) AS seg_len
FROM x
WHERE len(seg) > 0
ORDER BY doc_id, seg_idx
"""


@register("q135_udtf_segments", _Q135_ORACLE)
def q135_udtf_segments(spark, sf_dir):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="seg_idx int, seg string, seg_len int")
    class Segment:
        def eval(self, text: str):
            if text is None:
                return
            for i, seg in enumerate(text.split(" the ")):
                if seg:
                    yield i, seg, len(seg)

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("_q135_docs")
    spark.udtf.register("segment_udtf", Segment)
    return spark.sql(
        """
        SELECT d.doc_id, s.seg_idx, s.seg, s.seg_len
        FROM _q135_docs d, LATERAL segment_udtf(d.text) s
        ORDER BY d.doc_id, s.seg_idx
        """
    )


# ---------------------------------------------------------------------------
# q142 — intra-document repetition (Gopher-style quality rule): the
# fraction of word 3-gram OCCURRENCES that are repeats of an earlier
# 3-gram in the same document. Repetitive machine-generated text scores
# high; natural text low. Integer counts + one double division — exact.
# ---------------------------------------------------------------------------

_Q142_N = 3

_Q142_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= {_Q142_N}
              THEN list_transform(
                     generate_series(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - {_Q142_N} + 1),
                     i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + {_Q142_N} - 1), ' '))
              ELSE [] END AS grams
  FROM documents
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
            ELSE 0.0 END AS rep_ratio
FROM g
ORDER BY doc_id
"""


@register("q142_repetition_ratio", _Q142_ORACLE)
def q142_repetition_ratio(spark, sf_dir):
    n = _Q142_N
    docs = load(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    docs = docs.select("doc_id", ws.alias("_ws"))
    grams = F.when(
        F.size("_ws") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_ws") - n + 1),
            lambda i: F.array_join(F.slice("_ws", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = docs.select("doc_id", grams.alias("_grams"))
    total = F.size("_grams").cast("long")
    dist = F.size(F.array_distinct("_grams")).cast("long")
    return docs.select(
        "doc_id",
        total.alias("n_grams"),
        dist.alias("n_distinct"),
        F.when(
            total > 0, (total - dist).cast("double") / total.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q143 — document-frequency segment pruning (CCNet boilerplate removal
# generalized): segments occurring in more than K distinct documents are
# dropped and the document text is reassembled in original order. Gated
# on the reassembled TEXT — order-stable collect is the hard part, and
# it is exact.
# ---------------------------------------------------------------------------

_Q143_K = 40


def _q143_oracle() -> str:
    from ..operators.linededup import sql_df_prune_segments

    body = sql_df_prune_segments("documents", "doc_id", "text", " ", _Q143_K)
    return f"SELECT * FROM ({body}) ORDER BY doc_id"


@register("q143_df_prune", _q143_oracle())
def q143_df_prune(spark, sf_dir):
    from ..operators.linededup import df_prune_segments

    docs = load(spark, sf_dir, "documents")
    return df_prune_segments(docs, "doc_id", "text", " ", _Q143_K).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q146 — frequency vocabulary + OOV rate (tokenizer prep): the top-V
# corpus tokens under a DETERMINISTIC order (count desc, token asc —
# native top-k ties are engine-defined, unusable under a hash gate),
# then each document's out-of-vocabulary token fraction against it.
# Scale shape: token groupBy with map-side combine; the vocabulary is
# V rows -> broadcast; per-doc OOV is one more grouped count.
# ---------------------------------------------------------------------------

_Q146_V = 500

_Q146_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
),
freq AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1),
vocab AS (
  SELECT token FROM freq ORDER BY cnt DESC, token ASC LIMIT {_Q146_V}
),
per_doc AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tok,
         COUNT(*) - COUNT(v.token) AS n_oov
  FROM toks t LEFT JOIN vocab v USING (token)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
       CASE WHEN COALESCE(p.n_tok, 0) > 0
            THEN CAST(p.n_oov AS DOUBLE) / CAST(p.n_tok AS DOUBLE)
            ELSE 0.0 END AS oov_rate
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


@register("q146_vocab_oov", _Q146_ORACLE)
def q146_vocab_oov(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("token"),
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    vocab = (
        freq.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(_Q146_V)
        .select("token", F.lit(1).alias("_inv"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.coalesce("n_tok", F.lit(0)) > 0,
                F.col("n_oov").cast("double") / F.col("n_tok").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q156 — unigram token entropy per document (quality signal: keyboard
# mash and template spam sit at the entropy extremes). Counts are
# integers; each token's -(c/n)*log2(c/n) term is round-9 gated and the
# per-document reduction is an exact decimal sum.
# ---------------------------------------------------------------------------


def _q156_oracle() -> str:
    from ..functions.stats import sql_dsum

    term = (
        "ROUND(-(CAST(c AS DOUBLE) / n) * LOG2(CAST(c AS DOUBLE) / n), 9)"
    )
    return f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n FROM c GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(ANY_VALUE(n.n), 0) AS BIGINT) AS n_tok,
       COALESCE({sql_dsum(term)}, 0.0) AS entropy
FROM documents d
LEFT JOIN c ON d.doc_id = c.doc_id
LEFT JOIN n ON d.doc_id = n.doc_id
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


@register("q156_token_entropy", _q156_oracle())
def q156_token_entropy(spark, sf_dir):
    from ..functions.stats import dsum

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    c = t.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    n = c.groupBy("doc_id").agg(F.sum("c").cast("double").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log2(p), 9)
    scored = (
        c.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_tok"),
            dsum(term).alias("entropy"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q157 — per-source KL divergence from the corpus token distribution
# (which sources are drifting from the mix): D(source || corpus) over
# the top shared unigrams. Integer counts everywhere, round-9 log
# terms, exact decimal reduction; tokens unseen in a source contribute
# nothing (standard plug-in estimator on the source support).
# ---------------------------------------------------------------------------


def _q157_oracle() -> str:
    from ..functions.stats import sql_dsum

    term = (
        "ROUND((CAST(sc AS DOUBLE) / sn) * "
        "LOG2((CAST(sc AS DOUBLE) / sn) / (CAST(cc AS DOUBLE) / cn)), 9)"
    )
    return f"""
WITH t AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
sc AS (SELECT source, tok, COUNT(*) AS sc FROM t GROUP BY 1, 2),
cc AS (SELECT tok, COUNT(*) AS cc FROM t GROUP BY 1),
sn AS (SELECT source, CAST(SUM(sc) AS DOUBLE) AS sn FROM sc GROUP BY 1),
cn AS (SELECT CAST(SUM(cc) AS DOUBLE) AS cn FROM cc)
SELECT s.source,
       CAST(ANY_VALUE(sn.sn) AS BIGINT) AS n_tok,
       {sql_dsum(term)} AS kl_bits
FROM sc s
JOIN cc USING (tok)
JOIN sn ON s.source = sn.source
CROSS JOIN cn
GROUP BY s.source
ORDER BY s.source
"""


@register("q157_source_kl", _q157_oracle())
def q157_source_kl(spark, sf_dir):
    from ..functions.stats import dsum

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    sc = t.groupBy("source", "tok").agg(F.count("*").alias("sc"))
    cc = t.groupBy("tok").agg(F.count("*").alias("cc"))
    sn = sc.groupBy("source").agg(F.sum("sc").cast("double").alias("sn"))
    cn = cc.agg(F.sum("cc").cast("double").alias("cn"))
    p = F.col("sc").cast("double") / F.col("sn")
    q = F.col("cc").cast("double") / F.col("cn")
    term = F.round(p * F.log2(p / q), 9)
    return (
        sc.join(cc, "tok")
        .join(sn, "source")
        .crossJoin(F.broadcast(cn))
        .groupBy("source")
        .agg(
            F.max("sn").cast("long").alias("n_tok"),
            dsum(term).alias("kl_bits"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q240 — positional phrase search (operators/phrasesearch): exact
# occurrence counts of a 2-token phrase via shifted-position-set
# intersection over a posting-filtered inverted index (the scan keeps
# only the phrase's tokens). The oracle slides a window over each
# document's token array — an independent exact algorithm — and the
# counts must hash-match.
# ---------------------------------------------------------------------------

_Q240_PHRASE = "table table"


def _q240_oracle() -> str:
    from ..operators.phrasesearch import sql_phrase_match_counts

    body = sql_phrase_match_counts(
        "documents", "doc_id", "text", _Q240_PHRASE
    )
    return f"SELECT * FROM ({body}) ORDER BY doc_id"


@register("q240_phrase_search", _q240_oracle())
def q240_phrase_search(spark, sf_dir):
    from ..operators.phrasesearch import phrase_match_counts

    docs = load(spark, sf_dir, "documents")
    return phrase_match_counts(docs, _Q240_PHRASE).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q258 — Aho-Corasick multi-pattern dictionary scan
# (operators/ahocorasick): every occurrence of a 7-pattern blocklist
# over documents — including NESTED matches ('tab'/'able' inside
# 'table', 'an' inside 'scan'), which only fire through the automaton's
# failure/output links. One O(text) pass per doc, no shuffle; the
# oracle replays per-pattern position scans (substr equality over a
# lateral position series) — quadratic in SQL, linear here, identical
# rows. The blocklist-scrub primitive of corpus curation.
# ---------------------------------------------------------------------------

_Q258_PATTERNS = ["table", "tab", "able", "scan", "an", "value", "row"]


def _q258_oracle() -> str:
    vals = ", ".join(f"('{p}')" for p in _Q258_PATTERNS)
    return f"""
WITH pats(pattern) AS (VALUES {vals}),
m AS (
  SELECT d.doc_id, p.pattern,
         unnest(list_filter(
           generate_series(1, len(d.text) - len(p.pattern) + 1),
           i -> substr(d.text, CAST(i AS INT), CAST(len(p.pattern) AS INT)) = p.pattern
         )) AS pos
  FROM documents d CROSS JOIN pats p
)
SELECT doc_id, pattern, CAST(pos AS INT) AS pos
FROM m ORDER BY doc_id, pattern, pos
"""


@register("q258_aho_corasick_scan", _q258_oracle())
def q258_aho_corasick_scan(spark, sf_dir):
    from ..operators.ahocorasick import multi_pattern_scan

    docs = load(spark, sf_dir, "documents")
    return multi_pattern_scan(docs, "doc_id", "text", _Q258_PATTERNS).orderBy(
        "doc_id", "pattern", "pos"
    )


# ---------------------------------------------------------------------------
# q263 — BPE tokenizer APPLY (operators/bpe.bpe_encode_word): segment
# every distinct corpus word with a pretrained 17-rule merge table
# (literal in both engines — applying a trained tokenizer is the
# production op; training itself is q217). Inference is standard greedy
# BPE: repeatedly merge the lowest-rank adjacent pair (leftmost on
# ties). The oracle replays the EXACT recurrence with a recursive CTE:
# per step, rank lookup via a literal CASE over adjacent pairs,
# best = list_min of rank*100000+pos codes, one list-splice merge —
# the XXH64/Winkler-EM treatment applied to tokenizer inference.
# ---------------------------------------------------------------------------

_Q263_MERGES = [
    ("a", "n"), ("t", "a"), ("l", "e"), ("ta", "b"), ("tab", "le"),
    ("s", "c"), ("sc", "an"), ("r", "o"), ("ro", "w"), ("e", "r"),
    ("v", "a"), ("u", "e"), ("va", "l"), ("val", "ue"), ("o", "r"),
    ("d", "a"), ("da", "ta"),
]


def _q263_oracle() -> str:
    case = " ".join(
        f"WHEN '{a}|{b}' THEN {i + 1}"
        for i, (a, b) in enumerate(_Q263_MERGES)
    )
    return f"""
WITH RECURSIVE words AS MATERIALIZED (
  SELECT w, COUNT(*) AS n_occurrences FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
enc AS (
  SELECT w, list_transform(generate_series(1, len(w)), i -> w[i:i]) AS seq,
         0 AS step
  FROM words
  UNION ALL
  SELECT w,
         seq[1:pos - 1]
           || [seq[pos] || seq[pos + 1]]
           || seq[pos + 2:len(seq)] AS seq,
         step + 1
  FROM (
    SELECT w, seq, step,
           CAST(list_min(list_filter(
             list_transform(generate_series(1, len(seq) - 1),
               i -> (CASE seq[i] || '|' || seq[i + 1] {case} END) * 100000 + i),
             x -> x IS NOT NULL)) % 100000 AS INT) AS pos
    FROM enc
  ) WHERE pos IS NOT NULL
),
final AS (
  SELECT w, seq,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY step DESC) AS rn
  FROM enc
)
SELECT f.w AS word, array_to_string(f.seq, ' ') AS encoded,
       CAST(len(f.seq) AS INT) AS n_pieces,
       CAST(words.n_occurrences AS BIGINT) AS n_occurrences
FROM final f JOIN words ON f.w = words.w
WHERE f.rn = 1
ORDER BY word
"""


@register("q263_bpe_encode", _q263_oracle())
def q263_bpe_encode(spark, sf_dir):
    from ..operators.bpe import bpe_encode_words

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    words = toks.groupBy("w").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    enc = bpe_encode_words(words, "w", _Q263_MERGES)
    return (
        enc.join(words, enc["word"] == words["w"])
        .select("word", "encoded", "n_pieces", "n_occurrences")
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# q267 — WARC corpus scan (sources/warc): a two-file WARC fixture (one
# plain, one per-record-gzip — both layouts of ISO 28500) is built
# deterministically from documents (doc_id < 100), then read back
# through the distributed binaryFile + Arrow-kernel parser; output is
# (target_uri, content_type, n_bytes, payload md5). The oracle rebuilds
# every field from documents with pure SQL — proving header parse,
# Content-Length slicing, gzip member handling, and payload integrity
# end to end. The Common Crawl ingestion shape.
# ---------------------------------------------------------------------------

_Q267_NDOCS = 100

_Q267_ORACLE = f"""
SELECT 'http://example.com/doc/' || doc_id AS target_uri,
       'text/plain' AS content_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents WHERE doc_id < {_Q267_NDOCS}
ORDER BY target_uri
"""


@register("q267_warc_scan", _Q267_ORACLE)
def q267_warc_scan(spark, sf_dir):
    import hashlib
    import os
    import shutil

    from ..sources.warc import build_warc, read_warc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out_dir = f"/tmp/spark_graft_warc_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _Q267_NDOCS)
        .select("doc_id", "text")
        .collect()  # bounded fixture build (driver-side, q257 pattern)
    )
    half = _Q267_NDOCS // 2

    def rec(r):
        return {
            "warc_type": "response",
            "target_uri": f"http://example.com/doc/{r['doc_id']}",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "text/plain",
            "payload": r["text"].encode("utf-8"),
        }

    a = [rec(r) for r in docs if r["doc_id"] < half]
    b = [rec(r) for r in docs if r["doc_id"] >= half]
    with open(f"{out_dir}/part-0.warc", "wb") as f:
        f.write(build_warc(a, compress=False))
    with open(f"{out_dir}/part-1.warc.gz", "wb") as f:
        f.write(build_warc(b, compress=True))

    recs = read_warc(spark, f"{out_dir}/*")
    return recs.select(
        "target_uri",
        "content_type",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
    ).orderBy("target_uri")


# ---------------------------------------------------------------------------
# q275 — URL structure + per-domain cap (functions/urls): deterministic
# URLs are synthesized per doc (md5-arithmetic subdomain/tld/port/path/
# query), parsed back into host, registrable domain, port, path depth,
# and query-param count — a regex round-trip both engines replay — then
# a 3-per-domain cap is applied in xxhash64(doc_id) order (the q241
# heavy-key-cap recipe at domain granularity). The domain-dominance
# control every web corpus applies.
# ---------------------------------------------------------------------------

_Q275_CAP = 3


def _q275_oracle() -> str:
    from ..functions.xxh64sql import sql_xxhash64_long_cte

    xxh = sql_xxhash64_long_cte("(SELECT DISTINCT doc_id AS v FROM documents)")
    return f"""
WITH RECURSIVE m AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS h
  FROM documents
),
u AS (
  SELECT doc_id,
         'https://'
         || (CASE h % 4 WHEN 0 THEN '' WHEN 1 THEN 'www.' WHEN 2 THEN 'cdn.' ELSE 'blog.' END)
         || 'site' || CAST(doc_id % 50 AS VARCHAR)
         || '.' || (CASE (h // 4) % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)
         || (CASE WHEN (h // 12) % 5 = 0 THEN ':8080' ELSE '' END)
         || (CASE (h // 60) % 4 WHEN 0 THEN '' WHEN 1 THEN '/p0' WHEN 2 THEN '/p0/p1' ELSE '/p0/p1/p2' END)
         || (CASE (h // 240) % 3 WHEN 0 THEN '?a=1&b=2' WHEN 1 THEN '?x=9' ELSE '' END)
         AS url,
         h
  FROM m
),
parsed AS (
  SELECT doc_id, url,
         regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
         CASE WHEN regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) = ''
              THEN NULL
              ELSE CAST(regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) AS INT) END AS port,
         regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS pth,
         regexp_extract(url, '\\?([^#]*)', 1) AS qry
  FROM u
),
dom AS (
  SELECT doc_id, url, host, port,
         CASE WHEN len(string_split(host, '.')) >= 2
              THEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
              ELSE host END AS domain,
         CAST(len(list_filter(string_split(pth, '/'), x -> x <> '')) AS INT) AS path_depth,
         CAST(CASE WHEN qry = '' THEN 0 ELSE len(string_split(qry, '&')) END AS INT) AS n_params
  FROM parsed
),
{xxh},
ranked AS (
  SELECT d.*, ROW_NUMBER() OVER (
           PARTITION BY d.domain ORDER BY x.hv, d.doc_id) AS rn
  FROM dom d JOIN xxhl x ON x.v = d.doc_id
)
SELECT doc_id, url, host, port, domain, path_depth, n_params,
       rn <= {_Q275_CAP} AS kept
FROM ranked ORDER BY doc_id
"""


@register("q275_url_domain_cap", _q275_oracle())
def q275_url_domain_cap(spark, sf_dir):
    from ..functions.urls import (
        cap_per_domain,
        n_query_params,
        path_depth,
        url_host,
        url_port,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    docs = docs.withColumn("_h", h)
    url = F.concat(
        F.lit("https://"),
        F.element_at(
            F.array(F.lit(""), F.lit("www."), F.lit("cdn."), F.lit("blog.")),
            (F.col("_h") % 4 + 1).cast("int"),
        ),
        F.lit("site"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("."),
        F.element_at(
            F.array(F.lit("com"), F.lit("org"), F.lit("net")),
            ((F.col("_h") / 4).cast("long") % 3 + 1).cast("int"),
        ),
        F.when((F.col("_h") / 12).cast("long") % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.element_at(
            F.array(F.lit(""), F.lit("/p0"), F.lit("/p0/p1"), F.lit("/p0/p1/p2")),
            ((F.col("_h") / 60).cast("long") % 4 + 1).cast("int"),
        ),
        F.element_at(
            F.array(F.lit("?a=1&b=2"), F.lit("?x=9"), F.lit("")),
            ((F.col("_h") / 240).cast("long") % 3 + 1).cast("int"),
        ),
    )
    withurl = docs.withColumn("url", url)
    capped = cap_per_domain(withurl, "url", "doc_id", _Q275_CAP)
    return capped.select(
        "doc_id",
        "url",
        url_host("url").alias("host"),
        url_port("url").alias("port"),
        "domain",
        path_depth("url").alias("path_depth"),
        n_query_params("url").alias("n_params"),
        "kept",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q276 — HTML text extraction (functions/html): deterministic HTML is
# synthesized around each document (title, style+script blocks, a
# comment, bold-wrapped text, an href, entities), then stripped back to
# clean text — title, clean-text md5, token count, and extracted links
# must hash-match the oracle running the IDENTICAL regex chain (all
# patterns chosen to behave the same under Java regex and RE2 — no \\s,
# lazy quantifiers + negated classes only). The WARC->text step of web
# curation.
# ---------------------------------------------------------------------------


def _q276_oracle() -> str:
    from ..functions.html import sql_html_links, sql_html_title, sql_strip_html

    html = (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>"
        "<style>p { color: red; }</style></head><body>"
        "<!-- comment --><h1>Header</h1><p>' || text || '</p>"
        "<script>var x = 1 < 2;</script>"
        "<a href=\"https://site' || CAST(doc_id % 50 AS VARCHAR) || '.com/p\">x</a>"
        " &amp; tail</body></html>'"
    )
    return f"""
WITH h AS (SELECT doc_id, {html} AS page FROM documents)
SELECT doc_id,
       {sql_html_title('page')} AS title,
       md5({sql_strip_html('page')}) AS clean_md5,
       CAST(len(list_filter(string_split({sql_strip_html('page')}, ' '),
                            t -> t <> '')) AS INT) AS n_tokens,
       {sql_html_links('page')} AS links
FROM h ORDER BY doc_id
"""


@register("q276_html_extract", _q276_oracle())
def q276_html_extract(spark, sf_dir):
    from ..functions.html import html_links, html_title, strip_html

    docs = load(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p { color: red; }</style></head><body>"),
        F.lit("<!-- comment --><h1>Header</h1><p>"),
        F.col("text"),
        F.lit("</p><script>var x = 1 < 2;</script>"),
        F.lit('<a href="https://site'),
        (F.col("doc_id") % 50).cast("string"),
        F.lit('.com/p">x</a> &amp; tail</body></html>'),
    )
    h = docs.select("doc_id", page.alias("page"))
    clean = strip_html("page")
    return h.select(
        "doc_id",
        html_title("page").alias("title"),
        F.md5(clean).alias("clean_md5"),
        F.size(F.filter(F.split(clean, " "), lambda t: t != "")).alias(
            "n_tokens"
        ),
        html_links("page").alias("links"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q293 — trigram language-model scoring with stupid backoff (Brants et
# al. 2007), the CCNet-style perplexity quality filter a curation
# pipeline runs before training. Train counts on even doc_ids, score
# odd doc_ids: S(c|a,b) = c3/c2(a,b), backing off to 0.4*c2(b,c)/c1(b),
# then 0.16*(c1(c)+1)/(N+V). Every log2 term is round-9 gated (the
# q149/q157 libm rule) and per-doc bits average through the exact
# decimal sum. Scale shape: three map-side-combined count shuffles on
# gram keys + token-keyed joins — no driver state, no Python.
# ---------------------------------------------------------------------------


def _q293_oracle() -> str:
    from ..functions.stats import sql_davg

    return f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS w
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
grams AS (
  SELECT doc_id, pos, w AS c,
         LAG(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS b,
         LAG(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS a
  FROM toks
),
train AS (SELECT * FROM grams WHERE doc_id % 2 = 0),
uni AS (SELECT c AS w, COUNT(*) AS c1 FROM train GROUP BY 1),
nv AS (SELECT COUNT(*) AS n, COUNT(DISTINCT c) AS v FROM train),
bi AS (SELECT b, c, COUNT(*) AS c2 FROM train WHERE b IS NOT NULL GROUP BY 1, 2),
tri AS (SELECT a, b, c, COUNT(*) AS c3
        FROM train WHERE a IS NOT NULL GROUP BY 1, 2, 3),
score AS (
  SELECT g.doc_id,
         CASE
           WHEN t.c3 IS NOT NULL
             THEN ROUND(-LOG2(CAST(t.c3 AS DOUBLE) / ab.c2), 9)
           WHEN bc.c2 IS NOT NULL
             THEN ROUND(-LOG2(0.4 * CAST(bc.c2 AS DOUBLE) / ub.c1), 9)
           ELSE ROUND(-LOG2(0.16 * (CAST(COALESCE(uc.c1, 0) AS DOUBLE) + 1.0)
                            / (nv.n + nv.v)), 9)
         END AS bits
  FROM grams g
  LEFT JOIN tri t ON t.a = g.a AND t.b = g.b AND t.c = g.c
  LEFT JOIN bi ab ON ab.b = g.a AND ab.c = g.b
  LEFT JOIN bi bc ON bc.b = g.b AND bc.c = g.c
  LEFT JOIN uni ub ON ub.w = g.b
  LEFT JOIN uni uc ON uc.w = g.c
  CROSS JOIN nv
  WHERE g.doc_id % 2 = 1 AND g.a IS NOT NULL
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
       {sql_davg('bits')} AS bits_per_token
FROM score GROUP BY 1 ORDER BY 1
"""


@register("q293_lm_perplexity", _q293_oracle())
def q293_lm_perplexity(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.stats import davg

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        "pos",
        F.col("w").alias("c"),
        F.lag("w", 1).over(win).alias("b"),
        F.lag("w", 2).over(win).alias("a"),
    )
    # one tokenize+window pass feeds the three count tables AND the
    # scoring join (the merge-family one-scan rule)
    grams = grams.cache()
    train = grams.filter(F.col("doc_id") % 2 == 0)
    train = train.cache()
    uni = train.groupBy(F.col("c").alias("w")).agg(F.count("*").alias("c1"))
    nv = train.agg(
        F.count("*").alias("n"), F.countDistinct("c").alias("v")
    )
    bi = (
        train.filter(F.col("b").isNotNull())
        .groupBy("b", "c")
        .agg(F.count("*").alias("c2"))
    )
    tri = (
        train.filter(F.col("a").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count("*").alias("c3"))
    )
    g = grams.filter((F.col("doc_id") % 2 == 1) & F.col("a").isNotNull())
    scored = (
        g.join(
            tri.select(
                F.col("a").alias("ta"), F.col("b").alias("tb"),
                F.col("c").alias("tc"), "c3",
            ),
            (F.col("ta") == F.col("a"))
            & (F.col("tb") == F.col("b"))
            & (F.col("tc") == F.col("c")),
            "left",
        )
        .join(
            bi.select(
                F.col("b").alias("ab_b"), F.col("c").alias("ab_c"),
                F.col("c2").alias("ab_c2"),
            ),
            (F.col("ab_b") == F.col("a")) & (F.col("ab_c") == F.col("b")),
            "left",
        )
        .join(
            bi.select(
                F.col("b").alias("bc_b"), F.col("c").alias("bc_c"),
                F.col("c2").alias("bc_c2"),
            ),
            (F.col("bc_b") == F.col("b")) & (F.col("bc_c") == F.col("c")),
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("ub_w"), F.col("c1").alias("ub_c1"))),
            F.col("ub_w") == F.col("b"),
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("uc_w"), F.col("c1").alias("uc_c1"))),
            F.col("uc_w") == F.col("c"),
            "left",
        )
        .crossJoin(F.broadcast(nv))
    )
    bits = (
        F.when(
            F.col("c3").isNotNull(),
            F.round(-F.log2(F.col("c3").cast("double") / F.col("ab_c2")), 9),
        )
        .when(
            F.col("bc_c2").isNotNull(),
            F.round(
                -F.log2(0.4 * F.col("bc_c2").cast("double") / F.col("ub_c1")), 9
            ),
        )
        .otherwise(
            F.round(
                -F.log2(
                    0.16
                    * (F.coalesce(F.col("uc_c1"), F.lit(0)).cast("double") + 1.0)
                    / (F.col("n") + F.col("v"))
                ),
                9,
            )
        )
    )
    return (
        scored.select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            davg("bits").alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q294 — PMI collocations: top-20 adjacent bigrams by pointwise mutual
# information with a min-count support floor — the classic phrase-mining
# primitive (Church & Hanks 1990) a tokenizer-vocabulary pipeline runs
# to find multi-word units. pmi = log2((c2/N2) / ((c1x/N)(c1y/N))),
# round-9 gated; deterministic (pmi DESC, x, y) ordering.
# ---------------------------------------------------------------------------

_Q294_MIN_COUNT = 5
_Q294_TOP = 20


def _q294_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS w
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
grams AS (
  SELECT doc_id, w AS y,
         LAG(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS x
  FROM toks
),
uni AS (SELECT y AS w, COUNT(*) AS c1 FROM grams GROUP BY 1),
n1 AS (SELECT COUNT(*) AS n FROM grams),
bi AS (SELECT x, y, COUNT(*) AS c2 FROM grams WHERE x IS NOT NULL GROUP BY 1, 2),
n2 AS (SELECT SUM(c2) AS n2 FROM bi)
SELECT b.x, b.y, CAST(b.c2 AS BIGINT) AS c2,
       ROUND(LOG2((CAST(b.c2 AS DOUBLE) / n2.n2)
                  / ((CAST(ux.c1 AS DOUBLE) / n1.n)
                     * (CAST(uy.c1 AS DOUBLE) / n1.n))), 9) AS pmi
FROM bi b
JOIN uni ux ON ux.w = b.x
JOIN uni uy ON uy.w = b.y
CROSS JOIN n1 CROSS JOIN n2
WHERE b.c2 >= {_Q294_MIN_COUNT}
ORDER BY pmi DESC, b.x, b.y
LIMIT {_Q294_TOP}
"""


@register("q294_pmi_collocations", _q294_oracle())
def q294_pmi_collocations(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        F.col("w").alias("y"),
        F.lag("w", 1).over(win).alias("x"),
    )
    grams = grams.cache()  # feeds uni, the total, and the bigram counts
    uni = grams.groupBy(F.col("y").alias("w")).agg(F.count("*").alias("c1"))
    n1 = grams.agg(F.count("*").alias("n"))
    bi = (
        grams.filter(F.col("x").isNotNull())
        .groupBy("x", "y")
        .agg(F.count("*").alias("c2"))
    )
    n2 = bi.agg(F.sum("c2").alias("n2"))
    pmi = F.round(
        F.log2(
            (F.col("c2").cast("double") / F.col("n2"))
            / (
                (F.col("ux_c1").cast("double") / F.col("n"))
                * (F.col("uy_c1").cast("double") / F.col("n"))
            )
        ),
        9,
    )
    return (
        bi.filter(F.col("c2") >= _Q294_MIN_COUNT)
        .join(
            F.broadcast(uni.select(F.col("w").alias("ux_w"), F.col("c1").alias("ux_c1"))),
            F.col("ux_w") == F.col("x"),
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("uy_w"), F.col("c1").alias("uy_c1"))),
            F.col("uy_w") == F.col("y"),
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "x", "y", F.col("c2").cast("long").alias("c2"), pmi.alias("pmi")
        )
        .orderBy(F.desc("pmi"), "x", "y")
        .limit(_Q294_TOP)
    )


# ---------------------------------------------------------------------------
# q295 — multinomial naive-Bayes language classifier, trained on even
# doc_ids (Laplace alpha=1 over the train vocab), scored on odd doc_ids
# as a confusion matrix. Every log-likelihood term is round-9 gated,
# token sums go through the exact decimal sum, and the argmax is a
# deterministic (score DESC, lang) row_number — so both engines pick
# identical winners. Train state is two count tables (lang, token) and
# (lang) — broadcastable at any corpus size with a bounded vocab.
# ---------------------------------------------------------------------------


def _q295_oracle() -> str:
    return """
WITH toks AS (
  SELECT d.doc_id, d.lang, unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS w
  FROM documents d
),
train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
cls AS (
  SELECT lang, COUNT(DISTINCT doc_id) AS nd FROM train GROUP BY 1
),
tot AS (SELECT SUM(nd) AS td FROM cls),
cw AS (SELECT lang, w, COUNT(*) AS c FROM train GROUP BY 1, 2),
nl AS (SELECT lang, COUNT(*) AS nt FROM train GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM train),
dt AS (
  SELECT doc_id, w, COUNT(*) AS m FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2
),
scores AS (
  SELECT dt.doc_id, c.lang,
         ROUND(LOG2(CAST(c.nd AS DOUBLE) / t.td), 9)
         + (CAST(SUM(CAST(FLOOR(
               (dt.m * ROUND(LOG2((CAST(COALESCE(cw.c, 0) AS DOUBLE) + 1.0)
                                  / (nl.nt + vb.v)), 9)) * 1000000.0
             ) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS s
  FROM dt
  CROSS JOIN cls c
  CROSS JOIN tot t
  CROSS JOIN vocab vb
  JOIN nl ON nl.lang = c.lang
  LEFT JOIN cw ON cw.lang = c.lang AND cw.w = dt.w
  GROUP BY dt.doc_id, c.lang, c.nd, t.td
),
pred AS (
  SELECT doc_id, lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rk
  FROM scores
)
SELECT d.lang AS true_lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
WHERE p.rk = 1
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("q295_naive_bayes_langid", _q295_oracle())
def q295_naive_bayes_langid(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.stats import dsum

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("w"),
    )
    toks = toks.cache()  # feeds the train tables and the scoring side
    train = toks.filter(F.col("doc_id") % 2 == 0)
    train = train.cache()
    cls = train.groupBy("lang").agg(F.countDistinct("doc_id").alias("nd"))
    tot = cls.agg(F.sum("nd").alias("td"))
    cw = train.groupBy("lang", "w").agg(F.count("*").alias("c"))
    nl = train.groupBy("lang").agg(F.count("*").alias("nt"))
    vocab = train.agg(F.countDistinct("w").alias("v"))
    dt = (
        toks.filter(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("m"))
    )
    term = F.col("m") * F.round(
        F.log2(
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") + 1.0)
            / (F.col("nt") + F.col("v"))
        ),
        9,
    )
    scores = (
        dt.crossJoin(F.broadcast(cls.select(F.col("lang").alias("cl"), "nd")))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .join(
            F.broadcast(nl.select(F.col("lang").alias("nll"), "nt")),
            F.col("nll") == F.col("cl"),
        )
        .join(
            cw.select(
                F.col("lang").alias("cwl"), F.col("w").alias("cww"), "c"
            ),
            (F.col("cwl") == F.col("cl")) & (F.col("cww") == F.col("w")),
            "left",
        )
        .groupBy("doc_id", F.col("cl").alias("lang"), "nd", "td")
        .agg(dsum(term).alias("tok_s"))
        .select(
            "doc_id",
            "lang",
            (
                F.round(F.log2(F.col("nd").cast("double") / F.col("td")), 9)
                + F.col("tok_s")
            ).alias("s"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("s"), "lang")
    pred = scores.select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        F.row_number().over(win).alias("rk"),
    ).filter(F.col("rk") == 1)
    return (
        pred.join(docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# q307 — TextRank keyword extraction (Mihalcea & Tarau 2004): the
# corpus co-occurrence graph (adjacent-token pairs, symmetrized
# count weights) ranked by edge-weighted integer PageRank
# (operators/pagerank.weighted_pagerank, the q255 fixed-point
# contract), top-20 tokens. Token strings are the node keys — no id
# remapping — and the oracle unrolls the identical 1e-12-grid
# recurrence over the same edge list, so the keyword list is bit-exact.
# ---------------------------------------------------------------------------

_Q307_TOP = 20
_Q307_ITER = 3


def _q307_oracle() -> str:
    from ..operators.pagerank import UNIT

    it = """
wc{k} AS (
  SELECT e.dst AS node, SUM((CAST(p.pr AS HUGEINT) * e.w) // wt.wt) AS s
  FROM wp{j} p JOIN wtot wt ON p.node = wt.src JOIN wedges e ON e.src = p.node
  GROUP BY 1
),
wp{k} AS (
  SELECT n.node,
         ((15 * {unit}::HUGEINT) // (100 * s.n))
         + (85 * COALESCE(wc{k}.s, 0)) // 100 AS pr
  FROM wnodes n CROSS JOIN wscal s LEFT JOIN wc{k} USING (node)
)"""
    its = ",".join(
        it.format(k=k, j=k - 1, unit=UNIT)
        for k in range(1, _Q307_ITER + 1)
    )
    return f"""
WITH toks AS (
  SELECT id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS tok
  FROM (SELECT doc_id AS id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
bi AS (
  SELECT x, y, COUNT(*) AS w FROM (
    SELECT LAG(tok, 1) OVER (PARTITION BY id ORDER BY pos) AS x, tok AS y
    FROM toks
  ) WHERE x IS NOT NULL AND x <> y
  GROUP BY 1, 2
),
wedges AS (
  SELECT src, dst, SUM(w) AS w FROM (
    SELECT x AS src, y AS dst, w FROM bi
    UNION ALL SELECT y, x, w FROM bi
  ) GROUP BY 1, 2
),
wtot AS (SELECT src, SUM(w) AS wt FROM wedges GROUP BY 1),
wnodes AS (SELECT DISTINCT src AS node FROM wedges),
wscal AS (SELECT COUNT(*) AS n FROM wnodes),
wp0 AS (SELECT node, {UNIT}::HUGEINT // s.n AS pr FROM wnodes CROSS JOIN wscal s),
{its}
SELECT node AS token, CAST(pr AS BIGINT) AS pr
FROM wp{_Q307_ITER}
ORDER BY pr DESC, token LIMIT {_Q307_TOP}
"""


@register("q307_textrank_keywords", _q307_oracle())
def q307_textrank_keywords(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.pagerank import weighted_pagerank

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "tok"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    bi = (
        toks.select(
            F.lag("tok", 1).over(win).alias("x"), F.col("tok").alias("y")
        )
        .filter(F.col("x").isNotNull() & (F.col("x") != F.col("y")))
        .groupBy("x", "y")
        .agg(F.count("*").alias("w"))
    )
    bi = bi.cache()  # feeds both directions of the symmetrize union
    wedges = (
        bi.select(F.col("x").alias("src"), F.col("y").alias("dst"), "w")
        .unionByName(
            bi.select(F.col("y").alias("src"), F.col("x").alias("dst"), "w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    return (
        weighted_pagerank(wedges, n_iter=_Q307_ITER)
        .select(F.col("node").alias("token"), "pr")
        .orderBy(F.desc("pr"), "token")
        .limit(_Q307_TOP)
    )


# ---------------------------------------------------------------------------
# q325 — team-draft interleaving (Radlinski et al., CIKM 2008): the
# online ranker-comparison protocol. Ranker A = BM25 (q93), ranker B =
# raw term-frequency; per round a deterministic coin (XXH64 of the
# round index, pinned as literals by the shared Python model) decides
# which team drafts first, each team picks its best not-yet-picked
# doc, and deterministic "clicks" (docs containing all three query
# terms) credit the team that picked them. The draft is a sequential
# state machine: the Spark side runs it in a per-query Arrow kernel,
# and the oracle replays it as a recursive CTE carrying the picked
# list — the q305 list-state treatment applied to evaluation.
# ---------------------------------------------------------------------------

_Q325_DEPTH = 10  # 5 rounds x 2 picks
_Q325_TOP = 20


def _q325_coins() -> list[int]:
    from ..functions.xxh64sql import hash_long, to_signed

    return [
        abs(to_signed(hash_long(r, 42))) % 2
        for r in range(_Q325_DEPTH // 2)
    ]


def _q325_oracle() -> str:
    from ..functions.relevance import sql_bm25_scores

    coins = _q325_coins()
    coin_case = " ".join(
        f"WHEN {r} THEN {c}" for r, c in enumerate(coins)
    )
    terms_any = " OR ".join(f"tok = '{t}'" for t in _Q93_TERMS)
    n_terms = len(_Q93_TERMS)
    return f"""
WITH RECURSIVE scored AS ({sql_bm25_scores(_Q93_TERMS)}),
la AS (
  SELECT list(doc_id ORDER BY rn) AS l FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
    FROM scored
  ) WHERE rn <= {_Q325_TOP}
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
tfb AS (
  SELECT doc_id, COUNT(*) AS tf
  FROM toks WHERE {terms_any} GROUP BY 1
),
lb AS (
  SELECT list(doc_id ORDER BY rn) AS l FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS rn
    FROM tfb
  ) WHERE rn <= {_Q325_TOP}
),
rel AS (
  SELECT doc_id FROM toks WHERE {terms_any}
  GROUP BY 1 HAVING COUNT(DISTINCT tok) = {n_terms}
),
draft AS (
  SELECT 0 AS step, CAST([] AS BIGINT[]) AS picked,
         CAST([] AS VARCHAR[]) AS teams
  UNION ALL
  SELECT step + 1,
         picked || [p1] || [p2],
         teams || [t1] || [CASE WHEN t1 = 'A' THEN 'B' ELSE 'A' END]
  FROM (
    SELECT d.step, d.picked, d.teams,
           CASE (CASE d.step {coin_case} END)
             WHEN 0 THEN 'A' ELSE 'B' END AS t1,
           list_filter(
             CASE (CASE d.step {coin_case} END)
               WHEN 0 THEN la.l ELSE lb.l END,
             x -> NOT list_contains(d.picked, x))[1] AS p1,
           CASE (CASE d.step {coin_case} END)
             WHEN 0 THEN lb.l ELSE la.l END AS lsec
    FROM draft d CROSS JOIN la CROSS JOIN lb
    WHERE d.step < {_Q325_DEPTH // 2}
  ) s
  CROSS JOIN LATERAL (
    SELECT list_filter(
      s.lsec, x -> NOT list_contains(s.picked || [s.p1], x))[1] AS p2
  ) q
),
finals AS (
  SELECT picked, teams FROM draft WHERE step = {_Q325_DEPTH // 2}
),
rows_o AS (
  SELECT g.i AS pos, picked[g.i] AS doc_id, teams[g.i] AS team
  FROM finals CROSS JOIN generate_series(1, {_Q325_DEPTH}) g(i)
)
SELECT r.pos, r.doc_id, r.team,
       EXISTS (SELECT 1 FROM rel WHERE rel.doc_id = r.doc_id) AS clicked
FROM rows_o r ORDER BY r.pos
"""


@register("q325_team_draft_interleave", _q325_oracle())
def q325_team_draft_interleave(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import Window

    from ..functions.relevance import bm25_scores

    coins = _q325_coins()
    docs = load(spark, sf_dir, "documents")
    docs = docs.cache()  # BM25 + tf ranker + relevance set
    scored = bm25_scores(docs, _Q93_TERMS)
    wa = Window.orderBy(F.desc("score"), "doc_id")
    la = (
        scored.select("doc_id", F.row_number().over(wa).alias("rn"))
        .filter(F.col("rn") <= _Q325_TOP)
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "doc_id"))),
                lambda s: s["doc_id"],
            ).alias("la")
        )
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    ).filter(F.col("tok").isin(*_Q93_TERMS))
    toks = toks.cache()  # tf ranker + relevance set
    tfb = toks.groupBy("doc_id").agg(F.count("*").alias("tf"))
    wb = Window.orderBy(F.desc("tf"), "doc_id")
    lb = (
        tfb.select("doc_id", F.row_number().over(wb).alias("rn"))
        .filter(F.col("rn") <= _Q325_TOP)
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "doc_id"))),
                lambda s: s["doc_id"],
            ).alias("lb")
        )
    )
    rel = (
        toks.groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("nt"))
        .filter(F.col("nt") == len(_Q93_TERMS))
        .groupBy()
        .agg(F.collect_list("doc_id").alias("rel"))
    )
    state = (
        la.crossJoin(F.broadcast(lb))
        .crossJoin(F.broadcast(rel))
        .withColumn("qid", F.lit(0))
    )
    depth = _Q325_DEPTH

    def draft(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        la_, lb_ = list(row["la"]), list(row["lb"])
        rel_ = set(row["rel"])
        picked, teams = [], []
        for r in range(depth // 2):
            first = "A" if coins[r] == 0 else "B"
            lists = {"A": la_, "B": lb_}
            p1 = next(d for d in lists[first] if d not in picked)
            picked.append(p1)
            teams.append(first)
            second = "B" if first == "A" else "A"
            p2 = next(d for d in lists[second] if d not in picked)
            picked.append(p2)
            teams.append(second)
        return pd.DataFrame(
            {
                "pos": range(1, depth + 1),
                "doc_id": picked,
                "team": teams,
                "clicked": [d in rel_ for d in picked],
            }
        )

    return (
        state.groupBy("qid")
        .applyInPandas(
            draft, "pos long, doc_id long, team string, clicked boolean"
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# q327 — URL canonicalization (functions/urls.canonical_url): the
# dedup-key normalization every web-curation pipeline runs before
# per-URL dedup — case-folded scheme/host, default ports and fragments
# dropped, tracking params (utm_*, gclid, fbclid, ref) removed,
# surviving query params SORTED, trailing path slashes stripped. Three
# synthesized variants per document (shuffled params, UTM noise,
# default port, fragment, trailing slash) must collapse to ONE
# canonical each; pure string expressions, SQL-replayed.
# ---------------------------------------------------------------------------


def _q327_oracle() -> str:
    from ..functions.urls import sql_canonical_url

    return f"""
WITH raw AS (
  SELECT doc_id,
         'https://WWW.Site' || CAST(doc_id % 50 AS VARCHAR)
           || '.com:443/articles/' || CAST(doc_id AS VARCHAR)
           || '?b=2&a=1#sec' AS url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://www.site' || CAST(doc_id % 50 AS VARCHAR)
           || '.com/articles/' || CAST(doc_id AS VARCHAR)
           || '/?a=1&b=2&utm_source=x' AS url
  FROM documents
  UNION ALL
  SELECT doc_id,
         'https://www.site' || CAST(doc_id % 50 AS VARCHAR)
           || '.com/articles/' || CAST(doc_id AS VARCHAR)
           || '?a=1&utm_campaign=y&b=2' AS url
  FROM documents
)
SELECT {sql_canonical_url('url')} AS canonical,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw
FROM raw GROUP BY 1 ORDER BY canonical
"""


@register("q327_url_canonicalize", _q327_oracle())
def q327_url_canonicalize(spark, sf_dir):
    from ..functions.urls import canonical_url

    docs = load(spark, sf_dir, "documents").select("doc_id")
    docs = docs.cache()  # three variant branches off one scan
    k = F.col("doc_id") % 50
    i = F.col("doc_id")

    def u(*parts):
        return F.concat(*[p if isinstance(p, F.Column) else F.lit(p) for p in parts])

    v0 = docs.select(
        u(
            "https://WWW.Site", k.cast("string"), ".com:443/articles/",
            i.cast("string"), "?b=2&a=1#sec",
        ).alias("url")
    )
    v1 = docs.select(
        u(
            "https://www.site", k.cast("string"), ".com/articles/",
            i.cast("string"), "/?a=1&b=2&utm_source=x",
        ).alias("url")
    )
    v2 = docs.select(
        u(
            "https://www.site", k.cast("string"), ".com/articles/",
            i.cast("string"), "?a=1&utm_campaign=y&b=2",
        ).alias("url")
    )
    raw = v0.unionByName(v1).unionByName(v2)
    return (
        raw.groupBy(canonical_url("url").alias("canonical"))
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.countDistinct("url").cast("long").alias("n_distinct_raw"),
        )
        .orderBy("canonical")
    )


# ---------------------------------------------------------------------------
# q330 — Good-Turing frequency smoothing (Good 1953): the
# frequency-of-frequencies table N_r and the discounted counts
# r* = (r+1) N_{r+1} / N_r for r <= 10 — the classic unseen-mass
# estimate (P0 = N_1 / N) that backs off n-gram models older than
# stupid backoff (q293). Pure counting + one self-join on r+1;
# integer-exact except the final round-9 ratios.
# ---------------------------------------------------------------------------

_Q330_MAX_R = 10

_Q330_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
counts AS (SELECT w, COUNT(*) AS r FROM toks GROUP BY 1),
fof AS (SELECT r, COUNT(*) AS nr FROM counts GROUP BY 1),
tot AS (SELECT SUM(r * nr) AS n FROM fof)
SELECT f.r, CAST(f.nr AS BIGINT) AS n_r,
       ROUND((f.r + 1) * CAST(f2.nr AS DOUBLE) / f.nr, 9) AS r_star,
       ROUND(CAST((SELECT nr FROM fof WHERE r = 1) AS DOUBLE)
             / (SELECT n FROM tot), 9) AS p_unseen
FROM fof f JOIN fof f2 ON f2.r = f.r + 1
WHERE f.r <= {_Q330_MAX_R}
ORDER BY f.r
"""


@register("q330_good_turing", _Q330_ORACLE)
def q330_good_turing(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count("*").alias("r"))
    fof = counts.groupBy("r").agg(F.count("*").alias("nr"))
    fof = fof.cache()  # self-join both sides + N1 + total
    tot = fof.agg(F.sum(F.col("r") * F.col("nr")).alias("n"))
    n1 = fof.filter(F.col("r") == 1).select(F.col("nr").alias("n1"))
    f2 = fof.select((F.col("r") - 1).alias("r"), F.col("nr").alias("nr2"))
    return (
        fof.join(f2, "r")
        .filter(F.col("r") <= _Q330_MAX_R)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            F.col("nr").cast("long").alias("n_r"),
            F.round(
                (F.col("r") + 1) * F.col("nr2").cast("double") / F.col("nr"), 9
            ).alias("r_star"),
            F.round(F.col("n1").cast("double") / F.col("n"), 9).alias(
                "p_unseen"
            ),
        )
        .orderBy("r")
    )


# ---------------------------------------------------------------------------
# q331 — Heaps'-law vocabulary growth (Herdan 1960 / Heaps 1978):
# V(N) ~ K N^beta, fitted by log-log OLS over the corpus's own growth
# curve. The curve is built DISTRIBUTED-EXACT without replaying the
# stream: each token type contributes at its FIRST document (min
# doc_id), so V after doc d = count of types with first_doc <= d and
# N after doc d = running token total — two cumulative windows over
# per-doc aggregates. Log terms are round-9 gated, the OLS runs on
# exact decimal sums. Complements the q204 Zipf diagnostic.
# ---------------------------------------------------------------------------


def _q331_oracle() -> str:
    from ..functions.stats import sql_dsum

    det = "(sn * sxx - sx * sx)"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
firsts AS (SELECT w, MIN(doc_id) AS fd FROM toks GROUP BY 1),
new_types AS (SELECT fd AS doc_id, COUNT(*) AS nv FROM firsts GROUP BY 1),
doc_tokens AS (SELECT doc_id, COUNT(*) AS nt FROM toks GROUP BY 1),
curve AS (
  SELECT d.doc_id,
         SUM(d.nt) OVER (ORDER BY d.doc_id) AS n_tokens,
         SUM(COALESCE(nv.nv, 0)) OVER (ORDER BY d.doc_id) AS v_types
  FROM doc_tokens d LEFT JOIN new_types nv USING (doc_id)
),
pts AS (
  SELECT ROUND(LOG2(CAST(n_tokens AS DOUBLE)), 9) AS x,
         ROUND(LOG2(CAST(v_types AS DOUBLE)), 9) AS y
  FROM curve
),
s AS (
  SELECT {sql_dsum('1.0')} AS sn, {sql_dsum('x')} AS sx,
         {sql_dsum('(x * x)')} AS sxx, {sql_dsum('y')} AS sy,
         {sql_dsum('(x * y)')} AS sxy,
         COUNT(*) AS n
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_points,
       ROUND((sn * sxy - sx * sy) / {det}, 9) AS beta,
       ROUND(POWER(2.0, (sxx * sy - sx * sxy) / {det}), 6) AS k
FROM s
"""


@register("q331_heaps_law", _q331_oracle())
def q331_heaps_law(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.stats import dsum

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("w"),
    )
    toks = toks.cache()  # firsts + per-doc totals off one pass
    firsts = toks.groupBy("w").agg(F.min("doc_id").alias("fd"))
    new_types = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count("*").alias("nv")
    )
    doc_tokens = toks.groupBy("doc_id").agg(F.count("*").alias("nt"))
    win = Window.orderBy("doc_id")
    curve = (
        doc_tokens.join(new_types, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("nt").over(win).alias("n_tokens"),
            F.sum(F.coalesce("nv", F.lit(0))).over(win).alias("v_types"),
        )
    )
    pts = curve.select(
        F.round(F.log2(F.col("n_tokens").cast("double")), 9).alias("x"),
        F.round(F.log2(F.col("v_types").cast("double")), 9).alias("y"),
    )
    det = "(sn * sxx - sx * sx)"
    s = pts.agg(
        dsum(F.lit(1.0)).alias("sn"),
        dsum("x").alias("sx"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        F.count("*").alias("n"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        F.expr(f"ROUND((sn * sxy - sx * sy) / {det}, 9)").alias("beta"),
        F.expr(
            f"ROUND(POWER(2.0, (sxx * sy - sx * sxy) / {det}), 6)"
        ).alias("k"),
    )


# ---------------------------------------------------------------------------
# q334 — S-stemmer conflation (Harman 1991): the three-rule suffix
# stemmer ("-ies"->"-y" unless e/a-ies, "-es"->"-e" unless o/a/e-es,
# "-s"->"" unless us/ss/s) applied as one shared CASE cascade, with
# the vocabulary-reduction report (types before/after, conflation
# ratio) — the cheap recall-boosting normalization an index pipeline
# applies before token matching. Pure string expressions; the heavier
# Porter cascade is the same plan shape with more rules.
# ---------------------------------------------------------------------------

_Q334_CASE = """
CASE
  WHEN w LIKE '%ies' AND w NOT LIKE '%eies' AND w NOT LIKE '%aies'
    THEN substr(w, 1, length(w) - 3) || 'y'
  WHEN w LIKE '%es' AND w NOT LIKE '%aes' AND w NOT LIKE '%ees'
       AND w NOT LIKE '%oes'
    THEN substr(w, 1, length(w) - 1)
  WHEN w LIKE '%s' AND w NOT LIKE '%us' AND w NOT LIKE '%ss'
       AND length(w) > 2
    THEN substr(w, 1, length(w) - 1)
  ELSE w
END"""

_Q334_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
stemmed AS (SELECT w, {_Q334_CASE} AS stem FROM toks)
SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS types_before,
       CAST(COUNT(DISTINCT stem) AS BIGINT) AS types_after,
       ROUND(CAST(COUNT(DISTINCT stem) AS DOUBLE)
             / COUNT(DISTINCT w), 9) AS conflation_ratio,
       CAST(SUM(CASE WHEN stem <> w THEN 1 ELSE 0 END) AS BIGINT)
         AS tokens_changed
FROM stemmed
"""


@register("q334_s_stemmer", _Q334_ORACLE)
def q334_s_stemmer(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("w")
    )
    stemmed = toks.select("w", F.expr(_Q334_CASE).alias("stem"))
    return stemmed.agg(
        F.countDistinct("w").cast("long").alias("types_before"),
        F.countDistinct("stem").cast("long").alias("types_after"),
        F.round(
            F.countDistinct("stem").cast("double") / F.countDistinct("w"), 9
        ).alias("conflation_ratio"),
        F.sum(F.when(F.col("stem") != F.col("w"), 1).otherwise(0))
        .cast("long")
        .alias("tokens_changed"),
    )


# ---------------------------------------------------------------------------
# q336 — span-corruption data prep (the T5 denoising objective, Raffel
# et al. 2020): deterministic ~15% Bernoulli seeds (XXH64 of a
# doc/position key, replayed via the closed hashLong form) extended to
# 3-token spans, masked runs collapsed to numbered sentinels — input =
# text with <extra_id_k> holes, target = sentinel-prefixed masked
# spans. Pure window/gaps-and-islands algebra over the token table;
# outputs are md5 digests of the rebuilt strings so the gate pins
# every byte. The pretraining-objective member of the data-prep family
# (packing q140, chunking q141, SFT assembly example).
# ---------------------------------------------------------------------------

_Q336_RATE = 15   # percent of seed positions
_Q336_SPAN = 3    # tokens per seeded span
_Q336_KEYBASE = 9_000_000_000_000


def _q336_oracle() -> str:
    from ..functions.xxh64sql import sql_xxhash64_long_cte

    xxh = sql_xxhash64_long_cte("(SELECT DISTINCT key AS v FROM toks)")
    sp = _Q336_SPAN
    return f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS w,
         {_Q336_KEYBASE} + doc_id * 131072
           + (generate_subscripts(tok, 1) - 1) AS key
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
{xxh},
seeded AS (
  SELECT t.doc_id, t.pos, t.w,
         CASE WHEN ((x.hv % 100) + 100) % 100 < {_Q336_RATE}
              THEN 1 ELSE 0 END AS seed
  FROM toks t JOIN xxhl x ON x.v = t.key
),
masked AS (
  SELECT doc_id, pos, w,
         GREATEST(
           seed,
           COALESCE(LAG(seed, 1) OVER w2, 0),
           COALESCE(LAG(seed, 2) OVER w2, 0)) AS m
  FROM seeded WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
),
runs AS (
  SELECT doc_id, pos, w, m,
         CASE WHEN m = 1 AND COALESCE(LAG(m) OVER w2, 0) = 0
              THEN 1 ELSE 0 END AS run_start
  FROM masked WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos, w, m, run_start,
         SUM(run_start) OVER (PARTITION BY doc_id ORDER BY pos) AS k
  FROM runs
),
pieces AS (
  SELECT doc_id, pos,
         CASE WHEN m = 0 THEN w
              WHEN run_start = 1 THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
         END AS in_piece,
         CASE WHEN m = 1 AND run_start = 1
              THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || w
              WHEN m = 1 THEN w
         END AS tg_piece
  FROM isl
)
SELECT doc_id,
       CAST(SUM(CASE WHEN in_piece IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN in_piece LIKE '<extra%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_masked,
       CAST(MAX(k_total) AS BIGINT) AS n_sentinels,
       md5(COALESCE(string_agg(in_piece, ' ' ORDER BY pos)
           FILTER (WHERE in_piece IS NOT NULL), '')) AS input_md5,
       md5(COALESCE(string_agg(tg_piece, ' ' ORDER BY pos)
           FILTER (WHERE tg_piece IS NOT NULL), '')) AS target_md5
FROM (SELECT p.*, MAX(k) OVER (PARTITION BY p.doc_id) AS k_total
      FROM pieces p JOIN isl USING (doc_id, pos))
GROUP BY 1 ORDER BY doc_id
"""


@register("q336_span_corruption", _q336_oracle())
def q336_span_corruption(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "w"),
    ).select(
        "doc_id",
        "pos",
        "w",
        (
            F.lit(_Q336_KEYBASE) + F.col("doc_id") * 131072 + F.col("pos")
        ).alias("key"),
    )
    seeded = toks.select(
        "doc_id",
        "pos",
        "w",
        F.when(F.pmod(F.xxhash64(F.col("key")), F.lit(100)) < _Q336_RATE, 1)
        .otherwise(0)
        .alias("seed"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("pos")
    masked = seeded.select(
        "doc_id",
        "pos",
        "w",
        F.greatest(
            F.col("seed"),
            F.coalesce(F.lag("seed", 1).over(w2), F.lit(0)),
            F.coalesce(F.lag("seed", 2).over(w2), F.lit(0)),
        ).alias("m"),
    )
    runs = masked.select(
        "doc_id",
        "pos",
        "w",
        "m",
        F.when(
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(w2), F.lit(0)) == 0),
            1,
        )
        .otherwise(0)
        .alias("run_start"),
    )
    isl = runs.select(
        "doc_id", "pos", "w", "m", "run_start",
        F.sum("run_start").over(w2).alias("k"),
    )
    pieces = isl.select(
        "doc_id",
        "pos",
        "m",
        "k",
        F.when(F.col("m") == 0, F.col("w"))
        .when(
            F.col("run_start") == 1,
            F.concat(F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")),
        )
        .alias("in_piece"),
        F.when(
            (F.col("m") == 1) & (F.col("run_start") == 1),
            F.concat(
                F.lit("<extra_id_"),
                F.col("k").cast("string"),
                F.lit("> "),
                F.col("w"),
            ),
        )
        .when(F.col("m") == 1, F.col("w"))
        .alias("tg_piece"),
        F.max("k").over(Window.partitionBy("doc_id")).alias("k_total"),
    )

    def joined(col):
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col(col).isNotNull(),
                            F.struct("pos", F.col(col).alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        )

    return (
        pieces.groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("in_piece").isNull(), 1).otherwise(0))
                + F.sum(
                    F.when(F.col("in_piece").startswith("<extra"), 1).otherwise(0)
                )
            )
            .cast("long")
            .alias("n_masked"),
            F.max("k_total").cast("long").alias("n_sentinels"),
            F.md5(joined("in_piece")).alias("input_md5"),
            F.md5(joined("tg_piece")).alias("target_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q337 — hard-negative mining for retrieval training (the DPR / dense-
# retriever data-prep step, Karpukhin et al. 2020): each of 20 pseudo-
# queries (a document's first three tokens) is paired with its source
# doc as the positive and its BM25 top-3 OTHER docs as hard negatives.
# Multi-query BM25 runs as one postings join (query-term-filtered scan,
# the q240 discipline): idf/tf terms round-9 gated, per-(query, doc)
# sums through the exact decimal grid, ranks deterministic. Output is
# the labeled training-pair table a contrastive trainer consumes.
# ---------------------------------------------------------------------------

_Q337_NQ = 20
_Q337_NEG = 3
_Q337_K1 = "1.2"
_Q337_B = "0.75"


def _q337_oracle() -> str:
    from ..functions.stats import sql_dsum

    k1, b = _Q337_K1, _Q337_B
    term = (
        f"(ROUND(LN((nd - df + 0.5) / (df + 0.5) + 1.0), 9)"
        f" * ROUND((tf * ({k1} + 1.0))"
        f" / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)), 9))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS w
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
qterms AS (
  SELECT doc_id AS qid, w AS term FROM toks
  WHERE doc_id < {_Q337_NQ} AND pos < 3
),
qt AS (SELECT DISTINCT qid, term FROM qterms),
postings AS (SELECT w AS term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dlen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dlen
),
dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM postings GROUP BY 1),
scored AS (
  SELECT q.qid, p.doc_id,
         {sql_dsum(term)} AS score
  FROM qt q
  JOIN postings p ON p.term = q.term
  JOIN dfs ON dfs.term = q.term
  JOIN dlen ON dlen.doc_id = p.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
),
negs AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
           AS rnk
  FROM scored WHERE doc_id <> qid
)
SELECT qid, 0 AS rnk, qid AS doc_id, 'pos' AS label,
       CAST(NULL AS DOUBLE) AS score
FROM (SELECT DISTINCT qid FROM qt)
UNION ALL
SELECT qid, rnk, doc_id, 'neg' AS label, ROUND(score, 9) AS score
FROM negs WHERE rnk <= {_Q337_NEG}
ORDER BY qid, rnk
"""


@register("q337_hard_negative_mining", _q337_oracle())
def q337_hard_negative_mining(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.stats import dsum

    k1, b = _Q337_K1, _Q337_B
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "w"),
    )
    toks = toks.cache()  # qterms, postings, doc lengths off one pass
    qt = (
        toks.filter((F.col("doc_id") < _Q337_NQ) & (F.col("pos") < 3))
        .select(F.col("doc_id").alias("qid"), F.col("w").alias("term"))
        .distinct()
    )
    postings = toks.groupBy(F.col("w").alias("term"), "doc_id").agg(
        F.count("*").alias("tf")
    )
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dlen.agg(
        F.count("*").cast("double").alias("nd"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    term = F.expr(
        f"(ROUND(LN((nd - df + 0.5) / (df + 0.5) + 1.0), 9)"
        f" * ROUND((tf * ({k1} + 1.0))"
        f" / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)), 9))"
    )
    dfs = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    scored = (
        qt.join(postings, "term")
        .join(F.broadcast(dfs), "term")
        .join(dlen.withColumnRenamed("doc_id", "pd"), F.col("pd") == F.col("doc_id"))
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(dsum(term).alias("score"))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("score"), "doc_id")
    negs = (
        scored.filter(F.col("doc_id") != F.col("qid"))
        .select("qid", "doc_id", "score", F.row_number().over(wq).alias("rnk"))
        .filter(F.col("rnk") <= _Q337_NEG)
        .select(
            "qid", "rnk", "doc_id", F.lit("neg").alias("label"),
            F.round("score", 9).alias("score"),
        )
    )
    pos = qt.select("qid").distinct().select(
        "qid",
        F.lit(0).alias("rnk"),
        F.col("qid").alias("doc_id"),
        F.lit("pos").alias("label"),
        F.lit(None).cast("double").alias("score"),
    )
    return pos.unionByName(negs).orderBy("qid", "rnk")


# ---------------------------------------------------------------------------
# q338 — tokenizer fertility by language: the q263 BPE inference chain
# applied per distinct word ONCE, joined back to per-language word
# counts — fertility = BPE pieces per word token, plus characters per
# piece: the multilingual-tokenizer-equity diagnostic (a tokenizer
# with high fertility on a language taxes its context budget). Exact:
# the oracle replays the identical rank-ordered merge recursion and
# the per-language rollup is integer/rational arithmetic.
# ---------------------------------------------------------------------------


def _q338_oracle() -> str:
    case = " ".join(
        f"WHEN '{a}|{b}' THEN {i + 1}"
        for i, (a, b) in enumerate(_Q263_MERGES)
    )
    return f"""
WITH RECURSIVE lw AS MATERIALIZED (
  SELECT lang, w, COUNT(*) AS n FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY 1, 2
),
words AS MATERIALIZED (SELECT DISTINCT w FROM lw),
enc AS (
  SELECT w, list_transform(generate_series(1, len(w)), i -> w[i:i]) AS seq,
         0 AS step
  FROM words
  UNION ALL
  SELECT w,
         seq[1:pos - 1]
           || [seq[pos] || seq[pos + 1]]
           || seq[pos + 2:len(seq)] AS seq,
         step + 1
  FROM (
    SELECT w, seq, step,
           CAST(list_min(list_filter(
             list_transform(generate_series(1, len(seq) - 1),
               i -> (CASE seq[i] || '|' || seq[i + 1] {case} END) * 100000 + i),
             x -> x IS NOT NULL)) % 100000 AS INT) AS pos
    FROM enc
  ) WHERE pos IS NOT NULL
),
final AS MATERIALIZED (
  SELECT w, CAST(len(seq) AS BIGINT) AS n_pieces, length(w) AS n_chars
  FROM (
    SELECT w, seq, ROW_NUMBER() OVER (PARTITION BY w ORDER BY step DESC)
             AS rn
    FROM enc
  ) WHERE rn = 1
)
SELECT lw.lang,
       CAST(SUM(lw.n) AS BIGINT) AS n_word_tokens,
       CAST(SUM(lw.n * f.n_pieces) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(SUM(lw.n * f.n_pieces) AS DOUBLE) / SUM(lw.n), 9)
         AS fertility,
       ROUND(CAST(SUM(lw.n * f.n_chars) AS DOUBLE)
             / SUM(lw.n * f.n_pieces), 9) AS chars_per_piece
FROM lw JOIN final f ON f.w = lw.w
GROUP BY 1 ORDER BY lang
"""


@register("q338_tokenizer_fertility", _q338_oracle())
def q338_tokenizer_fertility(spark, sf_dir):
    from ..operators.bpe import bpe_encode_words

    docs = load(spark, sf_dir, "documents")
    lw = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count("*").alias("n"))
    )
    lw = lw.cache()  # word dimension + the rollup join
    words = lw.select("w").distinct()
    enc = bpe_encode_words(words, "w", _Q263_MERGES).select(
        F.col("word").alias("w"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
        F.length("word").alias("n_chars"),
    )
    return (
        lw.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_word_tokens"),
            F.sum(F.col("n") * F.col("n_pieces")).cast("long").alias(
                "n_bpe_tokens"
            ),
            F.round(
                F.sum(F.col("n") * F.col("n_pieces")).cast("double")
                / F.sum("n"),
                9,
            ).alias("fertility"),
            F.round(
                F.sum(F.col("n") * F.col("n_chars")).cast("double")
                / F.sum(F.col("n") * F.col("n_pieces")),
                9,
            ).alias("chars_per_piece"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q344 — Jensen-Shannon divergence between each source and the corpus:
# the SYMMETRIC, bounded complement of q157's KL drift — JS(P||Q) =
# (KL(P||M) + KL(Q||M)) / 2 with M the even mixture, all terms round-9
# gated and folded through exact decimal sums. Bounded in [0, 1] bits,
# so sources are directly comparable (KL is not symmetric and can
# blow up on unseen tokens; JS cannot — the reason drift dashboards
# prefer it).
# ---------------------------------------------------------------------------


def _q344_oracle() -> str:
    from ..functions.stats import sql_dsum

    t1 = (
        "(CASE WHEN p > 0 THEN p * ROUND(LOG2(p / m), 9) ELSE 0.0 END)"
    )
    t2 = (
        "(CASE WHEN q > 0 THEN q * ROUND(LOG2(q / m), 9) ELSE 0.0 END)"
    )
    return f"""
WITH t AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
sc AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
sn AS (SELECT source, SUM(c) AS n FROM sc GROUP BY 1),
cc AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY 1),
cn AS (SELECT SUM(c) AS n FROM cc),
terms AS (
  SELECT s.source,
         COALESCE(CAST(sc.c AS DOUBLE) / sn.n, 0.0) AS p,
         CAST(cc.c AS DOUBLE) / cn.n AS q,
         (COALESCE(CAST(sc.c AS DOUBLE) / sn.n, 0.0)
          + CAST(cc.c AS DOUBLE) / cn.n) / 2.0 AS m
  FROM cc
  CROSS JOIN cn
  CROSS JOIN (SELECT DISTINCT source FROM t) s
  JOIN sn ON sn.source = s.source
  LEFT JOIN sc ON sc.source = s.source AND sc.tok = cc.tok
)
SELECT source,
       ROUND(({sql_dsum(t1)} + {sql_dsum(t2)}) / 2.0, 9) AS js_bits
FROM terms GROUP BY 1 ORDER BY source
"""


@register("q344_js_divergence", _q344_oracle())
def q344_js_divergence(spark, sf_dir):
    from ..functions.stats import dsum

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    t = t.cache()  # source counts + corpus counts off one pass
    sc = t.groupBy("source", "tok").agg(F.count("*").alias("c"))
    sn = sc.groupBy("source").agg(F.sum("c").alias("n"))
    cc = t.groupBy("tok").agg(F.count("*").alias("cc_c"))
    cn = cc.agg(F.sum("cc_c").alias("cn_n"))
    srcs = t.select("source").distinct()
    terms = (
        cc.crossJoin(F.broadcast(cn))
        .crossJoin(F.broadcast(srcs))
        .join(F.broadcast(sn), "source")
        .join(
            sc.select(
                F.col("source").alias("ss"), F.col("tok").alias("st"), "c"
            ),
            (F.col("ss") == F.col("source")) & (F.col("st") == F.col("tok")),
            "left",
        )
        .select(
            "source",
            F.coalesce(F.col("c").cast("double") / F.col("n"), F.lit(0.0)).alias("p"),
            (F.col("cc_c").cast("double") / F.col("cn_n")).alias("q"),
            (
                (
                    F.coalesce(
                        F.col("c").cast("double") / F.col("n"), F.lit(0.0)
                    )
                    + F.col("cc_c").cast("double") / F.col("cn_n")
                )
                / 2.0
            ).alias("m"),
        )
    )
    t1 = F.expr("(CASE WHEN p > 0 THEN p * ROUND(LOG2(p / m), 9) ELSE 0.0 END)")
    t2 = F.expr("(CASE WHEN q > 0 THEN q * ROUND(LOG2(q / m), 9) ELSE 0.0 END)")
    return (
        terms.groupBy("source")
        .agg(
            F.round((dsum(t1) + dsum(t2)) / 2.0, 9).alias("js_bits")
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q346 — inter-judge agreement (Cohen 1960): kappa between two
# rule-based document judges (length >= 40 tokens; distinct-token
# ratio >= 0.5) — the chance-corrected agreement statistic an
# LLM-as-judge eval pipeline reports before trusting a single judge.
# Pure contingency counting; po/pe/kappa are one double expression.
# ---------------------------------------------------------------------------

_Q346_ORACLE = """
WITH j AS (
  SELECT doc_id,
         CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 40
              THEN 1 ELSE 0 END AS j1,
         CASE WHEN CAST(len(list_distinct(
                     regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE)
                   / len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 0.5
              THEN 1 ELSE 0 END AS j2
  FROM documents
),
c AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN j1 = 1 AND j2 = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN j1 = 1 AND j2 = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN j1 = 0 AND j2 = 1 THEN 1 ELSE 0 END) AS cc,
         SUM(CASE WHEN j1 = 0 AND j2 = 0 THEN 1 ELSE 0 END) AS d
  FROM j
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(a AS BIGINT) AS both_pass, CAST(d AS BIGINT) AS both_fail,
       CAST(b AS BIGINT) AS only_j1, CAST(cc AS BIGINT) AS only_j2,
       ROUND(CAST(a + d AS DOUBLE) / n, 9) AS po,
       ROUND((CAST(a + b AS DOUBLE) * (a + cc)
              + CAST(cc + d AS DOUBLE) * (b + d))
             / (CAST(n AS DOUBLE) * n), 9) AS pe,
       ROUND((CAST(a + d AS DOUBLE) / n
              - (CAST(a + b AS DOUBLE) * (a + cc)
                 + CAST(cc + d AS DOUBLE) * (b + d))
                / (CAST(n AS DOUBLE) * n))
             / (1.0 - (CAST(a + b AS DOUBLE) * (a + cc)
                       + CAST(cc + d AS DOUBLE) * (b + d))
                      / (CAST(n AS DOUBLE) * n)), 9) AS kappa
FROM c
"""


@register("q346_cohens_kappa", _Q346_ORACLE)
def q346_cohens_kappa(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
    j = docs.select(
        F.when(F.size(toks) >= 40, 1).otherwise(0).alias("j1"),
        F.when(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            >= 0.5,
            1,
        )
        .otherwise(0)
        .alias("j2"),
    )
    c = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when((F.col("j1") == 1) & (F.col("j2") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("j1") == 1) & (F.col("j2") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("j1") == 0) & (F.col("j2") == 1), 1).otherwise(0)).alias("cc"),
        F.sum(F.when((F.col("j1") == 0) & (F.col("j2") == 0), 1).otherwise(0)).alias("d"),
    )
    pe = (
        "(CAST(a + b AS DOUBLE) * (a + cc)"
        " + CAST(cc + d AS DOUBLE) * (b + d)) / (CAST(n AS DOUBLE) * n)"
    )
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("a").cast("long").alias("both_pass"),
        F.col("d").cast("long").alias("both_fail"),
        F.col("b").cast("long").alias("only_j1"),
        F.col("cc").cast("long").alias("only_j2"),
        F.expr("ROUND(CAST(a + d AS DOUBLE) / n, 9)").alias("po"),
        F.expr(f"ROUND({pe}, 9)").alias("pe"),
        F.expr(
            f"ROUND((CAST(a + d AS DOUBLE) / n - {pe})"
            f" / (1.0 - {pe}), 9)"
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# q349 — n-gram novelty (the memorization diagnostic of McCoy et al.
# 2023): what fraction of each "generated" document's 4-grams never
# occur in the "training" half (even doc_ids)? Low novelty = the
# generator is parroting its corpus. One gram build (the q293 window
# shape), one distinct train-gram table, a left-anti-style flag join;
# per-doc and corpus-level rates, all integer counting.
# ---------------------------------------------------------------------------

_Q349_N = 4


def _q349_oracle() -> str:
    n = _Q349_N
    lags = " || ' ' || ".join(
        ["w"] + [f"LEAD(w, {i}) OVER w2" for i in range(1, n)]
    )
    return f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS w
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
grams AS (
  SELECT doc_id, pos, {lags} AS g,
         LEAD(w, {n - 1}) OVER w2 IS NOT NULL AS ok
  FROM toks WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
),
g2 AS (SELECT doc_id, g FROM grams WHERE ok),
train AS (SELECT DISTINCT g FROM g2 WHERE doc_id % 2 = 0),
gen AS (
  SELECT g2.doc_id, g2.g,
         CASE WHEN t.g IS NULL THEN 1 ELSE 0 END AS novel
  FROM g2 LEFT JOIN train t ON t.g = g2.g
  WHERE g2.doc_id % 2 = 1
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 9) AS novelty
FROM gen GROUP BY 1 ORDER BY doc_id
"""


@register("q349_ngram_novelty", _q349_oracle())
def q349_ngram_novelty(spark, sf_dir):
    from pyspark.sql import Window

    n = _Q349_N
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "w"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w2) for i in range(1, n)]
    grams = toks.select(
        "doc_id",
        F.concat_ws(" ", *parts).alias("g"),
        F.lead("w", n - 1).over(w2).isNotNull().alias("ok"),
    ).filter("ok")
    grams = grams.cache()  # train set + generated side off one pass
    train = (
        grams.filter(F.col("doc_id") % 2 == 0).select("g").distinct()
    )
    gen = (
        grams.filter(F.col("doc_id") % 2 == 1)
        .join(
            train.withColumn("hit", F.lit(1)), "g", "left"
        )
        .select(
            "doc_id",
            F.when(F.col("hit").isNull(), 1).otherwise(0).alias("novel"),
        )
    )
    return (
        gen.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("novel").cast("long").alias("n_novel"),
            F.round(
                F.sum("novel").cast("double") / F.count("*"), 9
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q350 — overdispersion index per event type: variance-to-mean ratio
# of daily event counts with the chi-square-shaped dispersion
# statistic (n-1)*VMR — VMR >> 1 signals bursty (negative-binomial)
# traffic that a Poisson capacity model underestimates. Exact decimal
# moments over the dense daily grid.
# ---------------------------------------------------------------------------


def _q350_oracle() -> str:
    from ..functions.stats import sql_davg, sql_dstd

    return f"""
WITH ev AS (
  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS absday
  FROM events
),
bounds AS (SELECT MIN(absday) AS d0, MAX(absday) AS d1 FROM ev),
daily AS (
  SELECT t, absday - b.d0 AS day, CAST(COUNT(*) AS DOUBLE) AS c
  FROM ev CROSS JOIN bounds b GROUP BY 1, 2
),
grid AS (
  SELECT tt.t, g.day
  FROM (SELECT DISTINCT t FROM ev) tt CROSS JOIN bounds b
  CROSS JOIN LATERAL (SELECT unnest(range(0, b.d1 - b.d0 + 1)) AS day) g
),
dense AS (
  SELECT g.t, COALESCE(d.c, 0.0) AS c
  FROM grid g LEFT JOIN daily d ON d.t = g.t AND d.day = g.day
),
st AS (
  SELECT t, COUNT(*) AS n, {sql_davg('c')} AS mu, {sql_dstd('c')} AS sd
  FROM dense GROUP BY 1
)
SELECT t AS event_type, CAST(n AS BIGINT) AS n_days,
       ROUND(mu, 9) AS mean_daily,
       ROUND(sd * sd / mu, 9) AS vmr,
       ROUND((n - 1) * sd * sd / mu, 9) AS dispersion_stat
FROM st ORDER BY event_type
"""


@register("q350_overdispersion", _q350_oracle())
def q350_overdispersion(spark, sf_dir):
    from ..functions.stats import davg, dstd

    ev = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.expr("(ts div 1000) div 86400000000").alias("absday"),
    )
    ev = ev.cache()
    bounds = ev.agg(F.min("absday").alias("d0"), F.max("absday").alias("d1"))
    daily = (
        ev.crossJoin(F.broadcast(bounds))
        .select("t", (F.col("absday") - F.col("d0")).alias("day"))
        .groupBy("t", "day")
        .agg(F.count("*").cast("double").alias("c"))
    )
    grid = (
        ev.select("t")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "t",
            F.explode(F.sequence(F.lit(0), F.col("d1") - F.col("d0"))).alias(
                "day"
            ),
        )
    )
    dense = grid.join(daily, ["t", "day"], "left").select(
        "t", F.coalesce("c", F.lit(0.0)).alias("c")
    )
    st = dense.groupBy("t").agg(
        F.count("*").alias("n"), davg("c").alias("mu"), dstd("c").alias("sd")
    )
    return st.select(
        F.col("t").alias("event_type"),
        F.col("n").cast("long").alias("n_days"),
        F.round("mu", 9).alias("mean_daily"),
        F.round(F.col("sd") * F.col("sd") / F.col("mu"), 9).alias("vmr"),
        F.round(
            (F.col("n") - 1) * F.col("sd") * F.col("sd") / F.col("mu"), 9
        ).alias("dispersion_stat"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q361 — Unicode NFC canonicalization (functions/unicodenorm): corpus
# text is deterministically "de-normalized" (every 'e' becomes
# 'e' + U+0301 combining acute on doc_id % 3 == 0 rows — the classic
# decomposed-form pollution real crawls carry), then canonicalized with
# the Arrow unicodedata kernel. Output: per-source rows changed +
# codepoint counts before/after, proving the normalizer collapses
# combining sequences and touches nothing else. Oracle: DuckDB's
# nfc_normalize — an independent UAX #15 implementation — replays the
# same pollution + normalization bit-for-bit.
# ---------------------------------------------------------------------------

_Q361_ORACLE = """
WITH polluted AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 3 = 0
              THEN replace(text, 'e', 'e' || chr(769))
              ELSE text END AS raw
  FROM documents
),
normed AS (
  SELECT doc_id, source, raw, nfc_normalize(raw) AS canon FROM polluted
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN canon <> raw THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(SUM(length(raw)) AS BIGINT) AS cp_before,
       CAST(SUM(length(canon)) AS BIGINT) AS cp_after
FROM normed
GROUP BY source ORDER BY source
"""


@register("q361_unicode_nfc", _Q361_ORACLE)
def q361_unicode_nfc(spark, sf_dir):
    from ..functions.unicodenorm import unicode_normalize

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    polluted = docs.withColumn(
        "raw",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.regexp_replace("text", "e", "e\u0301"),  # e + combining acute
        ).otherwise(F.col("text")),
    )
    normed = polluted.withColumn("canon", unicode_normalize("raw", "NFC"))
    return (
        normed.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("canon") != F.col("raw")).cast("long"))
            .cast("bigint")
            .alias("n_changed"),
            F.sum(F.length("raw")).cast("bigint").alias("cp_before"),
            F.sum(F.length("canon")).cast("bigint").alias("cp_after"),
        )
        .orderBy("source")
    )
