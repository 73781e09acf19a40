"""Training-pipeline primitives: deterministic dataset splits and column
profiling.

q50_stratified_split — reproducible 80/10/10 train/val/test assignment by
    content hash (never by row order: stable under repartitioning,
    re-ingestion, and engine changes), audited per language.
q51_profile — the data-quality profile every ingest step runs: per column
    count/nulls/distinct/min/max in one pass (multi-column aggregate, no
    per-column scans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sampling import sql_hash_rank, sql_weighted_key
from .registry import load, register

# split by first 7 hex digits of md5(doc_id) — engine-portable (same trick
# as the affine MinHash), strictly content-keyed.
_BUCKET = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 10"

_Q50_ORACLE = f"""
WITH assigned AS (
  SELECT lang,
         CASE WHEN ({_BUCKET}) < 8 THEN 'train'
              WHEN ({_BUCKET}) < 9 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT lang, split, COUNT(*) AS n FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q50_stratified_split", _Q50_ORACLE)
def q50_stratified_split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "split")
    )


_Q51_ORACLE = """
SELECT
  COUNT(*) AS n_rows,
  COUNT(l_quantity) AS qty_nonnull,
  COUNT(DISTINCT l_quantity) AS qty_distinct,
  MIN(l_quantity) AS qty_min,
  MAX(l_quantity) AS qty_max,
  COUNT(DISTINCT l_returnflag) AS flag_distinct,
  MIN(l_returnflag) AS flag_min,
  MAX(l_returnflag) AS flag_max,
  COUNT(DISTINCT l_orderkey) AS orderkey_distinct
FROM lineitem
"""


@register("q51_profile", _Q51_ORACLE)
def q51_profile(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("qty_nonnull"),
        F.count_distinct("l_quantity").alias("qty_distinct"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.count_distinct("l_returnflag").alias("flag_distinct"),
        F.min("l_returnflag").alias("flag_min"),
        F.max("l_returnflag").alias("flag_max"),
        F.count_distinct("l_orderkey").alias("orderkey_distinct"),
    )


# q64 — deterministic exact-k per-group sampling (per-language corpus
# caps). Rank by md5(seed, doc_id) within each language, keep k smallest:
# a uniform k-subset (bottom-k construction) that is bit-stable across
# engines, reruns and layouts — so the whole sample, not just its size,
# hash-matches the oracle.

_Q64_RANK = "md5(concat_ws(chr(31), '42', CAST(doc_id AS VARCHAR)))"

_Q64_ORACLE = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY {_Q64_RANK}, doc_id) AS rk
  FROM documents
) WHERE rk <= 30 ORDER BY lang, doc_id
"""


@register("q64_deterministic_sample", _Q64_ORACLE)
def q64_deterministic_sample(spark, sf_dir):
    from ..operators.sampling import sample_exact_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sample_exact_per_group(
        docs, ["lang"], ["doc_id"], k=30, seed=42
    ).orderBy("lang", "doc_id")


# q66 — sequence packing via distributed prefix sum. The oracle replays
# the scan with a plain single-reducer OVER (ORDER BY); the Spark side
# produces the identical running totals from the two-phase bucketed scan
# (per-bucket windows + driver-scanned offsets — max sorted partition is
# n/64, never n).

_Q66_ORACLE = """
WITH sized AS (
  SELECT doc_id, len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
  FROM documents
),
scanned AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
  FROM sized
)
SELECT CAST(excl // 4096 AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM scanned GROUP BY 1 ORDER BY 1
"""


@register("q66_sequence_packing", _Q66_ORACLE)
def q66_sequence_packing(spark, sf_dir):
    from ..functions.text import n_tokens_ws
    from ..operators.prefix import pack_bins_cumsum

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", n_tokens_ws("text").alias("n_tok")
    )
    packed = pack_bins_cumsum(docs, "doc_id", "n_tok", budget=4096)
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("bin_id")
    )


# ---------------------------------------------------------------------------
# q88 — weighted sampling without replacement (Efraimidis-Spirakis top-k
# per language, weight = n_chars). The A-ES key is a pure function of
# (seed, doc_id, weight) built on the portable md5 rank, so the oracle
# replays the exact draw; ln() is rounded to 9 decimals so libm ulp
# differences cannot reorder ranks.
# ---------------------------------------------------------------------------

_WK = 5
_W_SEED = 7


@register(
    "q88_weighted_sample",
    f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         {sql_weighted_key(['doc_id'], 'n_chars', _W_SEED)} AS es_key,
         {sql_hash_rank(['doc_id'], _W_SEED)} AS tie
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, tie) AS rn
  FROM keyed
)
SELECT lang, CAST(rn AS INT) AS rn, doc_id, n_chars
FROM ranked WHERE rn <= {_WK} ORDER BY lang, rn
""",
)
def q88_weighted_sample(spark, sf_dir):
    from ..operators.sampling import weighted_sample_k

    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    out = weighted_sample_k(
        docs, k=_WK, weight_col="n_chars", id_cols=["doc_id"], seed=_W_SEED, by=["lang"]
    )
    return (
        out.select("lang", F.col("es_rank").cast("int").alias("rn"), "doc_id", "n_chars")
        .orderBy("lang", "rn")
    )


# ---------------------------------------------------------------------------
# q116 — deterministic corpus mixing (operators/mixing): mixture weights
# + row budget -> largest-remainder quotas -> exact per-source bottom-k
# draw by content hash -> global content-keyed shuffle order. src4's
# quota exceeds its corpus (under-delivery path). Identical md5 keys on
# both engines make the whole recipe SQL-replayable.
# ---------------------------------------------------------------------------

_Q116_WEIGHTS = {"src0": 5.0, "src1": 3.0, "src2": 2.0, "src3": 1.0, "src4": 20.0}
_Q116_TOTAL = 100


def _q116_oracle() -> str:
    from ..operators.mixing import sql_weighted_mix

    return sql_weighted_mix(
        "documents",
        "source",
        _Q116_WEIGHTS,
        _Q116_TOTAL,
        ["doc_id"],
        select="doc_id, source",
    )


@register("q116_corpus_mix", _q116_oracle())
def q116_corpus_mix(spark, sf_dir):
    from ..operators.mixing import weighted_mix

    docs = load(spark, sf_dir, "documents")
    out = weighted_mix(docs, "source", _Q116_WEIGHTS, _Q116_TOTAL, ["doc_id"])
    return out.select("doc_id", "source", "mix_key")


# ---------------------------------------------------------------------------
# q129 — rendezvous sharding (operators/sharding): stable shard
# assignment by highest-random-weight. The gate computes each doc's
# shard at S=7 AND S=8 and groups by the transition — every relocated
# key must land on the NEW shard 7 (the rendezvous stability law;
# modulo-hashing would scatter them), and the assignment replays
# bit-for-bit in SQL.
# ---------------------------------------------------------------------------


def _q129_oracle() -> str:
    from ..operators.sharding import sql_assign_shards

    s7 = sql_assign_shards(["doc_id"], 7)
    s8 = sql_assign_shards(["doc_id"], 8)
    return f"""
SELECT {s7} AS shard7, {s8} AS shard8, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("q129_rendezvous_shards", _q129_oracle())
def q129_rendezvous_shards(spark, sf_dir):
    from ..operators.sharding import assign_shards

    docs = load(spark, sf_dir, "documents")
    out = assign_shards(
        assign_shards(docs, ["doc_id"], 7, out="shard7"), ["doc_id"], 8, out="shard8"
    )
    return (
        out.groupBy("shard7", "shard8")
        .agg(F.count("*").alias("n"))
        .orderBy("shard7", "shard8")
    )


# ---------------------------------------------------------------------------
# q130 — cross-source quantile normalization (operators/qnorm): every
# source's n_chars distribution maps onto the pooled distribution (a row
# at its source's p-th percentile takes the pooled value at p). Pooled
# ranks ride the two-phase distributed_rank (no global window); the
# bracketing index and fraction are exact integer div/mod, and the one
# interpolation expression replays verbatim in the oracle's
# window-function formulation.
# ---------------------------------------------------------------------------

_Q130_ORACLE = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS ns
  FROM documents
),
pooled AS (
  SELECT n_chars AS pv,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS i
  FROM documents
),
pairs AS (
  SELECT p.i, p.pv, n.pv AS pv_next
  FROM pooled p LEFT JOIN pooled n ON n.i = p.i + 1
),
pos AS (
  SELECT doc_id, source, n_chars, rk, ns,
         CASE WHEN ns > 1
              THEN ((rk - 1) * ((SELECT COUNT(*) FROM documents) - 1)) // (ns - 1)
              ELSE 0 END AS lo0,
         CASE WHEN ns > 1
              THEN ((rk - 1) * ((SELECT COUNT(*) FROM documents) - 1)) % (ns - 1)
              ELSE 0 END AS rem
  FROM ranked
)
SELECT s.doc_id, s.source, s.n_chars,
       CASE WHEN s.rem = 0 THEN CAST(q.pv AS DOUBLE)
            ELSE CAST(q.pv AS DOUBLE)
                 + CAST(q.pv_next - q.pv AS DOUBLE)
                   * (CAST(s.rem AS DOUBLE) / CAST(s.ns - 1 AS DOUBLE))
       END AS norm_value
FROM pos s JOIN pairs q ON q.i = s.lo0 + 1
ORDER BY s.doc_id
"""


@register("q130_quantile_normalize", _Q130_ORACLE)
def q130_quantile_normalize(spark, sf_dir):
    from ..operators.qnorm import quantile_normalize

    docs = load(spark, sf_dir, "documents")
    out = quantile_normalize(docs, "source", "n_chars", ["doc_id"])
    return out.select("doc_id", "source", "n_chars", "norm_value").orderBy("doc_id")
