"""Deduplication + similarity-search queries on documents/embeddings
(training-data pipeline operators, first-class).

q18_exact_dedup   — hash-groupBy exact dedup.
q19_minhash_lsh   — MinHash(16) -> 4-band LSH candidate pairs.
q20_simhash       — 64-bit SimHash signatures (bit-vote).
q21_ngram_jaccard — exact bigram Jaccard on lang-blocked pairs.
q24_cosine_topk   — brute-force cosine top-k (exact ANN baseline).
q25_srp_lsh_topk  — SRP-LSH bucketed approximate top-k (no SQL oracle:
                    approximate by design; weak rows-only check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import sql_shingles, sql_words
from ..operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    sql_affine_minhash,
)
from ..operators.similarity import cosine_topk, lsh_bucket_topk
from .registry import load, register

# ---------------------------------------------------------------------------
# q18 — exact dedup
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT md5(text) AS digest, MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1
"""


@register("q18_exact_dedup", _Q18_ORACLE)
def q18_exact_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text").orderBy("digest")


# ---------------------------------------------------------------------------
# q19 — MinHash + LSH candidate pairs (16 hashes, 4 bands x 4 rows)
# ---------------------------------------------------------------------------

_N_HASHES, _N_BANDS = 16, 4
_SHINGLE_N = 3  # word trigrams: discriminative shingles, standard near-dup
_ROWS = _N_HASHES // _N_BANDS

_sig_cols = ",\n    ".join(
    f"min({sql_affine_minhash(i, 'shingle')}) AS h{i}" for i in range(_N_HASHES)
)
_band_cases = "\n      ".join(
    "WHEN {b} THEN md5(concat_ws('|', {cols}))".format(
        b=b, cols=", ".join(f"h{b*_ROWS+r}" for r in range(_ROWS))
    )
    for b in range(_N_BANDS)
)

_Q19_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({sql_shingles('text', _SHINGLE_N)}) AS shingle
  FROM documents
),
sig AS (
  SELECT doc_id,
    {_sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
    CASE b.band_id
      {_band_cases}
    END AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {_N_BANDS - 1})) AS band_id) b
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
ORDER BY 1, 2
"""


@register("q19_minhash_lsh", _Q19_ORACLE)
def q19_minhash_lsh(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, "doc_id", "text", n_hashes=_N_HASHES, shingle_n=_SHINGLE_N, mode="affine"
    )
    return lsh_candidate_pairs(sig, "doc_id", _N_HASHES, _N_BANDS).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# q20 — SimHash signatures
# ---------------------------------------------------------------------------

_Q20_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({sql_words('text')})) AS tok FROM documents
),
h AS (SELECT doc_id, md5(tok) AS h FROM tok),
d AS (
  SELECT doc_id, h, dd.dd
  FROM h, (SELECT unnest(generate_series(0, 15)) AS dd) dd
),
v AS (
  SELECT doc_id, dd,
         strpos('0123456789abcdef', substr(h, dd + 1, 1)) - 1 AS v
  FROM d
),
b AS (
  SELECT doc_id, dd * 4 + bb.bb AS pos,
         CAST(FLOOR(v / POW(2.0, bb.bb)) AS BIGINT) % 2 AS bit
  FROM v, (SELECT unnest(generate_series(0, 3)) AS bb) bb
),
votes AS (SELECT doc_id, pos, SUM(bit * 2 - 1) AS vote FROM b GROUP BY 1, 2)
SELECT doc_id,
       string_agg(CASE WHEN vote >= 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id
"""


@register("q20_simhash", _Q20_ORACLE)
def q20_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text").orderBy("doc_id")


# ---------------------------------------------------------------------------
# q21 — exact bigram Jaccard, blocked by lang, threshold 0.1
# ---------------------------------------------------------------------------

_Q21_ORACLE = f"""
WITH w AS (SELECT doc_id, lang, {sql_words('text')} AS ws FROM documents),
sh AS (
  SELECT doc_id, lang,
         unnest(list_distinct(
           list_transform(
             generate_series(0, GREATEST(len(ws) - 2, 0)),
             i -> array_to_string(ws[i + 1 : i + 2], ' ')
           )
         )) AS shingle
  FROM w
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.1
ORDER BY 1, 2
"""


@register("q21_ngram_jaccard", _Q21_ORACLE)
def q21_ngram_jaccard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return jaccard_pairs(
        docs, "doc_id", "text", block_col="lang", shingle_n=2, threshold=0.1
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q24 — brute-force cosine top-k (exact)
# ---------------------------------------------------------------------------

_K = 10

_Q24_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_dot_product(q.qv, e.v)
           / (SQRT(list_dot_product(q.qv, q.qv)) * SQRT(list_dot_product(e.v, e.v))),
           6
         ) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@register("q24_cosine_topk", _Q24_ORACLE)
def q24_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=_K).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# q25 — SRP-LSH approximate top-k. Approximate vs the true top-k, but
# EXACT as a function: integer-sign projections over literal planes make
# the bucketing deterministic arithmetic, so the oracle replays the whole
# chain — buckets, candidate set, cosine, ranks — bit-for-bit
# (VERDICT r2 item 6, the q117/q125 treatment applied to SRP).
# ---------------------------------------------------------------------------


def _srp_oracle_sig(vec_expr: str, n_planes: int, seed: int = 42, dim: int = 64):
    from ..operators.similarity import _srp_planes, sql_srp_bits

    return sql_srp_bits(vec_expr, _srp_planes(dim, n_planes, seed))


def _q25_oracle() -> str:
    bits = _srp_oracle_sig("v", 8)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sig AS (SELECT vec_id, v, {bits} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sig WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, s.vec_id,
         ROUND(
           list_dot_product(q.qv, s.v)
           / (SQRT(list_dot_product(q.qv, q.qv)) * SQRT(list_dot_product(s.v, s.v))),
           6
         ) AS cos
  FROM sig s JOIN q ON s.bucket = q.bucket AND s.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@register("q25_srp_lsh_topk", _q25_oracle())
def q25_srp_lsh_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_bucket_topk(
        emb, queries, "vec_id", "embedding", k=_K, n_planes=8, dim=64, seed=42,
        exact_buckets=True,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q40 — IVF-bucketed approximate top-k (scale path; no SQL oracle)
# ---------------------------------------------------------------------------


def _q52_oracle() -> str:
    """Replays Spark's xxhash64 MinHash chain bit-for-bit in DuckDB:
    the engine-specific hash is no longer a gate gap — XXH64 itself is
    evaluated in SQL (functions/xxh64sql: recursive-CTE stripe/word
    rounds, HUGEINT mod-2^64 multiplies), seeded per hash index with
    the hashInt(i, 42) fold constants, then min/band/pair exactly as
    q19's oracle."""
    from ..functions.xxh64sql import hash_int, sql_xxhash64_str

    seeds = [hash_int(i, 42) for i in range(_N_HASHES)]
    xxh_block = sql_xxhash64_str("(SELECT DISTINCT shingle AS s FROM sh)", seeds)
    sig_cols = ",\n    ".join(
        f"MIN(CASE WHEN x.hi = {i} THEN x.hv END) AS h{i}"
        for i in range(_N_HASHES)
    )
    return f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest({sql_shingles('text', _SHINGLE_N)}) AS shingle
  FROM documents
),
{xxh_block},
sig AS (
  SELECT sh.doc_id,
    {sig_cols}
  FROM sh JOIN xxh x ON sh.shingle = x.s
  GROUP BY sh.doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
    CASE b.band_id
      {_band_cases}
    END AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {_N_BANDS - 1})) AS band_id) b
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
ORDER BY 1, 2
"""


@register("q52_minhash_fast", _q52_oracle())
def q52_minhash_fast(spark, sf_dir):
    """The 100 TB MinHash path: xxhash64 mode (JVM-native hashing, no md5
    strings). Same topology as q19 — and since round 3, EXACT: the
    oracle replays XXH64 itself in DuckDB SQL (see _q52_oracle), so
    'engine-specific hashing' no longer exempts the fast mode from the
    bit-exact gate."""
    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, "doc_id", "text", n_hashes=_N_HASHES, shingle_n=_SHINGLE_N, mode="xxhash64"
    )
    return lsh_candidate_pairs(sig, "doc_id", _N_HASHES, _N_BANDS).orderBy(
        "id_a", "id_b"
    )


def _q40_oracle() -> str:
    """The serving path is exact-gateable: with the trained centroids
    FROZEN as literals (the production train-once/persist/serve shape),
    assignment, nprobe probing, cosine scoring and ranking are all
    deterministic functions the oracle replays — cell order by
    (dot DESC, cell DESC) mirrors the reversed ascending struct sort."""
    from ..operators._ivf_centroids import Q40_CENTROIDS

    cent_rows = ",\n    ".join(
        "({}, [{}])".format(i, ", ".join(repr(float(x)) for x in c))
        for i, c in enumerate(Q40_CENTROIDS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents(cell, cv) AS (VALUES
    {cent_rows}
),
scored_cells AS (
  SELECT e.vec_id, c.cell, list_dot_product(e.v, c.cv) AS s
  FROM e CROSS JOIN cents c
),
ranked_cells AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rk
  FROM scored_cells
),
corpus AS (
  SELECT rc.vec_id, rc.cell, e.v
  FROM ranked_cells rc JOIN e ON rc.vec_id = e.vec_id
  WHERE rc.rk = 1
),
probes AS (
  SELECT rc.vec_id AS query_id, rc.cell, e.v AS qv
  FROM ranked_cells rc JOIN e ON rc.vec_id = e.vec_id
  WHERE rc.vec_id < 5 AND rc.rk <= 4
),
cand AS (
  SELECT p.query_id, c.vec_id,
         ROUND(
           list_dot_product(p.qv, c.v)
           / (SQRT(list_dot_product(p.qv, p.qv)) * SQRT(list_dot_product(c.v, c.v))),
           6
         ) AS cos
  FROM probes p JOIN corpus c ON p.cell = c.cell AND c.vec_id <> p.query_id
),
rnk AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM cand
)
SELECT query_id, vec_id, cos, rank FROM rnk WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@register("q40_ivf_topk", _q40_oracle())
def q40_ivf_topk(spark, sf_dir):
    """IVF ANN serving from FROZEN trained centroids (train once,
    persist, serve — the production shape). EXACT since round 3: the
    literal-centroid chain replays end to end in the oracle; the live
    trainer's determinism stays unit-tested separately."""
    from ..operators._ivf_centroids import Q40_CENTROIDS
    from ..operators.similarity import ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(
        emb, queries, "vec_id", "embedding", k=_K, n_cells=16, nprobe=4,
        seed=42, centroids=Q40_CENTROIDS,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q57 — embedding-cosine near-duplicate pairs (exact mode; LSH mode is the
# scale path, recall-pinned against this in tests/test_similarity_skew.py)
# ---------------------------------------------------------------------------

_NEARDUP_T = 0.35

_Q57_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_dot_product(a.v, b.v)
         / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))),
         6
       ) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(
        list_dot_product(a.v, b.v)
        / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))),
        6
      ) >= {_NEARDUP_T}
ORDER BY id_a, id_b
"""


@register("q57_embedding_neardup", _Q57_ORACLE)
def q57_embedding_neardup(spark, sf_dir):
    from ..operators.similarity import embedding_neardup

    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup(
        emb, "vec_id", "embedding", threshold=_NEARDUP_T, mode="exact"
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q60 — embedding near-dup, LSH-banded scale mode (the 100 TB path).
# Upgraded from rows-only to EXACT (VERDICT r2 item 6): integer-sign
# bucketing over literal planes makes candidate generation itself
# deterministic arithmetic, and the oracle replays banding + exact
# scoring bit-for-bit. q233 runs the same chain at a low threshold
# where real pairs survive, so both the empty (no-false-positive) and
# the populated regimes are gated.
# ---------------------------------------------------------------------------


def _srp_neardup_oracle(
    threshold: float, n_bands: int = 8, band_planes: int = 8
) -> str:
    bits = _srp_oracle_sig("v", n_bands * band_planes)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sig AS (SELECT vec_id, v, {bits} AS bits FROM e),
tagged AS (
  SELECT vec_id, b.band_id,
         substr(bits, b.band_id * {band_planes} + 1, {band_planes}) AS bucket
  FROM sig, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band_id) b
),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM tagged a JOIN tagged b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         ROUND(
           list_dot_product(va.v, vb.v)
           / (SQRT(list_dot_product(va.v, va.v)) * SQRT(list_dot_product(vb.v, vb.v))),
           6
         ) AS cos
  FROM pairs JOIN e va ON pairs.id_a = va.vec_id
             JOIN e vb ON pairs.id_b = vb.vec_id
)
SELECT id_a, id_b, cos FROM scored WHERE cos >= {threshold} ORDER BY id_a, id_b
"""


@register("q60_neardup_lsh", _srp_neardup_oracle(0.9))
def q60_neardup_lsh(spark, sf_dir):
    """Near-dup regime (t=0.9, 8x8-bit bands): selective buckets, work =
    banding + candidate-bounded exact scoring. The synthetic embeddings
    contain no true near-dups (max pairwise cos ~= 0.51), so the correct
    output is EMPTY — and the oracle proves no false positive survives
    the exact scoring stage. q233 gates the populated regime."""
    from ..operators.similarity import embedding_neardup

    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup(
        emb,
        "vec_id",
        "embedding",
        threshold=0.9,
        mode="lsh",
        n_bands=8,
        band_planes=8,
        seed=42,
        exact_buckets=True,
    ).orderBy("id_a", "id_b")


@register("q233_neardup_lsh_low_t", _srp_neardup_oracle(0.35))
def q233_neardup_lsh_low_t(spark, sf_dir):
    """The populated-regime witness for q60's machinery: at t=0.35 the
    8x8-bit bands recall a real subset of q57's exact pairs, and the
    oracle replays buckets -> candidates -> exact cosines bit-for-bit."""
    from ..operators.similarity import embedding_neardup

    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup(
        emb,
        "vec_id",
        "embedding",
        threshold=_NEARDUP_T,
        mode="lsh",
        n_bands=8,
        band_planes=8,
        seed=42,
        exact_buckets=True,
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q67 — duplicate-cluster connected components over the q19 LSH pair
# graph. Spark runs iterative min-label propagation + pointer jumping;
# DuckDB recomputes the transitive closure with a recursive CTE — the
# (node, component) table must hash-match exactly.
# ---------------------------------------------------------------------------

_Q67_ORACLE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest({sql_shingles('text', _SHINGLE_N)}) AS shingle
  FROM documents
),
sig AS (
  SELECT doc_id,
    {_sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
    CASE b.band_id
      {_band_cases}
    END AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {_N_BANDS - 1})) AS band_id) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
)
SELECT src AS node, MIN(dst) AS comp FROM reach GROUP BY 1 ORDER BY 1
"""


@register("q67_dup_components", _Q67_ORACLE)
def q67_dup_components(spark, sf_dir):
    from ..operators.components import connected_components

    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, "doc_id", "text", n_hashes=_N_HASHES, shingle_n=_SHINGLE_N, mode="affine"
    )
    pairs = lsh_candidate_pairs(sig, "doc_id", _N_HASHES, _N_BANDS)
    return connected_components(pairs).orderBy("node")


# ---------------------------------------------------------------------------
# q71 — SemDeDup (semantic dedup): label-blocked exact gate. The oracle
# replays the full chain — within-block rounded-cosine edges, recursive-
# CTE transitive closure, component-min survivors — so the composition
# (pairs -> components -> canonical) is hash-checked end to end. The
# centroid-cell mode (the real path) is unit-tested; its blocking is
# approximate by design (cross-cell pairs are missed, per the paper).
# ---------------------------------------------------------------------------

_SEMDEDUP_T = 0.4

_Q71_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE ROUND(
          list_dot_product(a.v, b.v)
          / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))),
          6
        ) >= {_SEMDEDUP_T}
),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
),
comp AS (SELECT src AS node, MIN(dst) AS comp FROM reach GROUP BY 1)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN COALESCE(c.comp, e.vec_id) = e.vec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN COALESCE(c.comp, e.vec_id) <> e.vec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM e LEFT JOIN comp c ON e.vec_id = c.node
GROUP BY label ORDER BY label
"""


@register("q71_semdedup", _Q71_ORACLE)
def q71_semdedup(spark, sf_dir):
    from ..operators.semdedup import semdedup

    emb = load(spark, sf_dir, "embeddings")
    with_canon = semdedup(
        emb.select("vec_id", "label", "embedding"),
        "vec_id",
        "embedding",
        threshold=_SEMDEDUP_T,
        cell_col="label",
    )
    survives = (F.col("canonical_id") == F.col("vec_id")).cast("int")
    return (
        with_canon.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(survives).cast("bigint").alias("n_survivors"),
            F.sum(1 - survives).cast("bigint").alias("n_removed"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q73 — the Arrow-vectorized brute-force cosine top-k. Same oracle as
# q24: the numpy kernel reproduces the JVM fold's FP operation order
# exactly (sequential dims, separate mul/add, no FMA), so raw cosines are
# bit-identical and the final round/rank runs in the JVM either way.
# ---------------------------------------------------------------------------


@register("q73_cosine_topk_arrow", _Q24_ORACLE)
def q73_cosine_topk_arrow(spark, sf_dir):
    from ..operators.similarity import cosine_topk_arrow

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_arrow(emb, queries, "vec_id", "embedding", k=_K).orderBy(
        "query_id", "rank"
    )


# ---------------------------------------------------------------------------
# q92 — SemDeDup with nprobe=2 multi-assignment, exact-gated. Fixed
# block-indicator centroids (literals in BOTH plans) make the IVF
# assignment itself SQL-replayable: dot products against 0/1 vectors are
# bit-identical across engines (0.0*x terms are exact no-ops in the
# sequential fold), so the oracle reproduces argtop-2 cell probing, the
# deduped within-cell pair set, the recursive transitive closure, and
# the component-min survivors — the full multi-assignment chain.
# ---------------------------------------------------------------------------

_Q92_T = 0.4
_Q92_NPROBE = 2
_Q92_CENTS = [
    [1.0 if 16 * i <= j < 16 * (i + 1) else 0.0 for j in range(64)]
    for i in range(4)
]


def _q92_oracle() -> str:
    cells = ", ".join(
        f"({i}, {c!r})".replace("'", "") for i, c in enumerate(_Q92_CENTS)
    )
    return f"""
WITH RECURSIVE e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cells(cell, cv) AS (SELECT * FROM (VALUES {cells}) t(cell, cv)),
scored AS (
  SELECT e.vec_id, c.cell, list_dot_product(e.v, c.cv) AS s
  FROM e CROSS JOIN cells c
),
probed AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
    FROM scored) WHERE rn <= {_Q92_NPROBE}
),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM probed pa JOIN probed pb ON pa.cell = pb.cell AND pa.vec_id < pb.vec_id
  JOIN e a ON a.vec_id = pa.vec_id
  JOIN e b ON b.vec_id = pb.vec_id
  WHERE ROUND(
          list_dot_product(a.v, b.v)
          / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))),
          6
        ) >= {_Q92_T}
),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
),
comp AS (SELECT src AS node, MIN(dst) AS comp FROM reach GROUP BY 1)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN COALESCE(c.comp, e.vec_id) = e.vec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN COALESCE(c.comp, e.vec_id) <> e.vec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM e LEFT JOIN comp c ON e.vec_id = c.node
GROUP BY label ORDER BY label
"""


@register("q92_semdedup_nprobe", _q92_oracle())
def q92_semdedup_nprobe(spark, sf_dir):
    from ..operators.semdedup import semdedup

    emb = load(spark, sf_dir, "embeddings")
    with_canon = semdedup(
        emb.select("vec_id", "label", "embedding"),
        "vec_id",
        "embedding",
        threshold=_Q92_T,
        centroids=_Q92_CENTS,
        nprobe=_Q92_NPROBE,
    )
    survives = (F.col("canonical_id") == F.col("vec_id")).cast("int")
    return (
        with_canon.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(survives).cast("bigint").alias("n_survivors"),
            F.sum(1 - survives).cast("bigint").alias("n_removed"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q96 — exact set-similarity self-join (entity resolution) with prefix
# filtering (Vernica/Carey/Li 2010): customer-name trigram sets, Jaccard
# >= 9/10. The Spark plan never forms a cross join — candidates come
# from the rarest-token prefixes and an integer cross-multiplied verify
# decides — while the oracle IS the brute-force quadratic join, so the
# gate proves the filter is lossless end to end.
# ---------------------------------------------------------------------------

_Q96_NUM, _Q96_DEN = 9, 10


def _q96_oracle() -> str:
    from ..operators.simjoin import sql_trigrams

    return f"""
WITH t AS (
  SELECT c_custkey AS id, {sql_trigrams('c_name')} AS tg FROM customer
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(len(list_intersect(a.tg, b.tg)) AS INT) AS inter,
       CAST(len(a.tg) AS BIGINT) AS n_a,
       CAST(len(b.tg) AS BIGINT) AS n_b
FROM t a JOIN t b ON a.id < b.id
WHERE {_Q96_DEN} * len(list_intersect(a.tg, b.tg))
      >= {_Q96_NUM} * (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg)))
ORDER BY id_a, id_b
"""


@register("q96_similarity_join", _q96_oracle())
def q96_similarity_join(spark, sf_dir):
    from ..operators.simjoin import similarity_self_join, trigrams

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), trigrams("c_name").alias("tg")
    )
    out = similarity_self_join(cust, "id", "tg", _Q96_NUM, _Q96_DEN)
    return out.select(
        "id_a", "id_b", F.col("inter").cast("int").alias("inter"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q104 — Fellegi-Sunter record linkage (operators/linkage): equality-
# blocked candidate pairs over `part` (block = p_type, p_size; the pair
# blowup is block-squared, never corpus-squared), per-field agreement
# via JVM levenshtein / exact / numeric-tolerance predicates, and the
# summed log2 likelihood-ratio score. Weight literals are the same
# float64 in both engines (repr round-trip) and the score is a fixed
# left-fold of 3 doubles — bit-identical, no rounding needed. The
# oracle replays blocking, agreement, and CASE weights in SQL
# (DuckDB's levenshtein is the same classic edit distance as Spark's).
# ---------------------------------------------------------------------------


def _q104_fields():
    from ..operators.linkage import FieldSpec

    return [
        FieldSpec("p_name", "levenshtein", tol=3, m=0.9, u=0.05),
        FieldSpec("p_brand", "exact", m=0.85, u=0.04),
        FieldSpec("p_retailprice", "numeric", tol=0.5, m=0.9, u=0.02),
    ]


def _q104_oracle() -> str:
    from ..functions.stats import sql_dsum

    f_name, f_brand, f_price = _q104_fields()
    terms = []
    for f, agr in [
        (f_name, "levenshtein(a.p_name, b.p_name) <= 3"),
        (f_brand, "a.p_brand = b.p_brand"),
        (f_price, "abs(a.p_retailprice - b.p_retailprice) <= 0.5"),
    ]:
        terms.append(
            f"(CASE WHEN {agr} THEN CAST({f.agree_weight!r} AS DOUBLE)"
            f" ELSE CAST({f.disagree_weight!r} AS DOUBLE) END)"
        )
    score = f"((CAST(0.0 AS DOUBLE) + {terms[0]}) + {terms[1]}) + {terms[2]}"
    return f"""
WITH pairs AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, {score} AS score
  FROM part a JOIN part b
    ON a.p_type = b.p_type AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
),
classed AS (
  SELECT CASE WHEN score >= 4.0 THEN 'match'
              WHEN score <= 0.0 THEN 'non_match'
              ELSE 'possible' END AS link_class,
         score
  FROM pairs
)
SELECT link_class, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {sql_dsum('score')} AS total_score
FROM classed GROUP BY 1 ORDER BY 1
"""


@register("q104_record_linkage", _q104_oracle())
def q104_record_linkage(spark, sf_dir):
    from ..functions.stats import dsum
    from ..operators.linkage import link_records

    part = load(spark, sf_dir, "part")
    linked = link_records(
        part,
        "p_partkey",
        ["p_type", "p_size"],
        _q104_fields(),
        lower=0.0,
        upper=4.0,
    )
    return (
        linked.groupBy("link_class")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            dsum("score").alias("total_score"),
        )
        .orderBy("link_class")
    )


def _q105_oracle() -> str:
    """Winkler EM replayed EXACTLY by a recursive CTE: pattern counts
    pivot into one row (so the recursive member needs no aggregation),
    and each iteration is the identical left-folded chain of IEEE-exact
    ops (+ * / min max abs) the driver-side Python runs — absent
    patterns contribute literal +0.0 terms, which cannot change a bit.
    Every float literal is CAST to DOUBLE (bare literals are DECIMAL in
    DuckDB and would silently switch the arithmetic)."""
    P_INIT = "CAST(0.1 AS DOUBLE)"
    M_INIT = "CAST(0.9 AS DOUBLE)"
    U_INIT = "CAST(0.1 AS DOUBLE)"
    TOL, MAX_IT = 1e-10, 200
    CL_LO = "CAST(1e-6 AS DOUBLE)"
    CL_HI = f"CAST({(1.0 - 1e-6)!r} AS DOUBLE)"
    AGR = [
        "levenshtein(a.p_name, b.p_name) <= 3",
        "a.p_brand = b.p_brand",
        "abs(a.p_retailprice - b.p_retailprice) <= 0.5",
    ]

    def bits(j):
        return ((j >> 2) & 1, (j >> 1) & 1, j & 1)

    def w_expr(j):
        b = bits(j)
        pm, pu = "p.p", "(CAST(1.0 AS DOUBLE) - p.p)"
        for i, bi in enumerate(b):
            pm = f"({pm} * {'p.m%d' % i if bi else '(1.0 - p.m%d)' % i})"
            pu = f"({pu} * {'p.u%d' % i if bi else '(1.0 - p.u%d)' % i})"
        return f"(CASE WHEN {pm} + {pu} > 0 THEN {pm} / ({pm} + {pu}) ELSE 0.0 END)"

    def fold(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = f"({acc} + {t})"
        return acc

    def clamp(x):
        return f"LEAST(GREATEST({x}, {CL_LO}), {CL_HI})"

    wdefs = ", ".join(f"{w_expr(j)} AS w{j}" for j in range(8))
    wm = fold([f"(s.w{j} * s.n{j})" for j in range(8)])
    newp = clamp("(t.wm / t.tot)")
    newm, newu = [], []
    for i in range(3):
        js = [j for j in range(8) if bits(j)[i]]
        nm_sum = fold([f"(t.w{j} * t.n{j})" for j in js])
        nu_sum = fold([f"((1.0 - t.w{j}) * t.n{j})" for j in js])
        newm.append(
            f"CASE WHEN t.wm > 0 THEN {clamp(f'({nm_sum} / t.wm)')} ELSE t.m{i} END"
        )
        newu.append(
            f"CASE WHEN t.wn > 0 THEN {clamp(f'({nu_sum} / t.wn)')} ELSE t.u{i} END"
        )
    abs_terms = fold(
        [f"ABS(f.nm{i} - f.m{i})" for i in range(3)]
        + [f"ABS(f.nu{i} - f.u{i})" for i in range(3)]
    )
    delta = f"(ABS(f.np - f.p) + {abs_terms})"

    def pat_flags(j):
        return " AND ".join(
            (f"agr{i}" if bits(j)[i] else f"NOT agr{i}") for i in range(3)
        )

    counts_cols = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE {pat_flags(j)}) AS DOUBLE) AS n{j}"
        for j in range(8)
    )
    return f"""
WITH RECURSIVE pairs AS (
  SELECT {AGR[0]} AS agr0, {AGR[1]} AS agr1, {AGR[2]} AS agr2
  FROM part a JOIN part b
    ON a.p_type = b.p_type AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
),
counts AS (
  SELECT {counts_cols}, CAST(COUNT(*) AS DOUBLE) AS tot FROM pairs
),
em AS (
  SELECT 0 AS it, CAST(NULL AS DOUBLE) AS delta,
         {P_INIT} AS p,
         {M_INIT} AS m0, {M_INIT} AS m1, {M_INIT} AS m2,
         {U_INIT} AS u0, {U_INIT} AS u1, {U_INIT} AS u2,
         n0, n1, n2, n3, n4, n5, n6, n7, tot
  FROM counts
  UNION ALL
  SELECT f.it + 1, {delta},
         f.np, f.nm0, f.nm1, f.nm2, f.nu0, f.nu1, f.nu2,
         f.n0, f.n1, f.n2, f.n3, f.n4, f.n5, f.n6, f.n7, f.tot
  FROM (
    SELECT t.*, {newp} AS np,
           {newm[0]} AS nm0, {newm[1]} AS nm1, {newm[2]} AS nm2,
           {newu[0]} AS nu0, {newu[1]} AS nu1, {newu[2]} AS nu2
    FROM (
      SELECT s.*, {wm} AS wm, (s.tot - {wm}) AS wn
      FROM (
        SELECT p.*, {wdefs}
        FROM em p
        WHERE p.it < {MAX_IT} AND (p.delta IS NULL OR p.delta >= CAST({TOL!r} AS DOUBLE))
      ) s
    ) t
  ) f
)
SELECT ROUND(p, 6) AS prevalence,
       ROUND(m0, 6) AS m_name, ROUND(m1, 6) AS m_brand, ROUND(m2, 6) AS m_price,
       ROUND(u0, 6) AS u_name, ROUND(u1, 6) AS u_brand, ROUND(u2, 6) AS u_price
FROM em ORDER BY it DESC LIMIT 1
"""


@register("q105_linkage_em", _q105_oracle())
def q105_linkage_em(spark, sf_dir):
    """Unsupervised Fellegi-Sunter parameter estimation: Winkler EM on
    the agreement-pattern contingency table of q104's candidate pairs.
    One aggregation pass collapses the pairs to <= 2^3 pattern counts;
    the fixed-point iterates driver-side on those counts (cost
    independent of corpus size). No SQL oracle — EM is iterative — but
    the run is deterministic (fixed init, no RNG), so the rows-only
    check is stable; recovery accuracy is pinned in tests against
    synthetic pairs with known (p, m, u)."""
    from ..operators.linkage import blocked_pairs, estimate_mu_em

    part = load(spark, sf_dir, "part")
    fields = _q104_fields()
    pairs = blocked_pairs(
        part, "p_partkey", ["p_type", "p_size"], [f.col for f in fields]
    )
    p, fitted = estimate_mu_em(pairs, fields, p_init=0.1, m_init=0.9, u_init=0.1)
    row = [
        (
            round(p, 6),
            *[round(f.m, 6) for f in fitted],
            *[round(f.u, 6) for f in fitted],
        )
    ]
    return spark.createDataFrame(
        row,
        "prevalence double, m_name double, m_brand double, m_price double, "
        "u_name double, u_brand double, u_price double",
    )


# ---------------------------------------------------------------------------
# q107 — sorted-neighborhood blocking (Hernandez-Stolfo): rank parts by
# the unique composed key (price, partkey) — round(price*10)*1e6 +
# partkey, exact integer in both engines — and score each record
# against its w=4 successors. The rank comes from the distributed
# prefix-sum (no single-partition window); pairing is the rank-bucket
# equi-join (uniform by construction — ranks are a permutation). The
# oracle replays the neighborhood with a plain row_number window and
# rb - ra BETWEEN 1 AND w, then the same q104 weights.
# ---------------------------------------------------------------------------

_Q107_W = 4
_Q107_KEY = "CAST(ROUND(p_retailprice * 10, 0) AS BIGINT) * 1000000 + p_partkey"


def _q107_oracle() -> str:
    from ..functions.stats import sql_dsum

    f_name, f_brand, f_price = _q104_fields()
    terms = []
    for f, agr in [
        (f_name, "levenshtein(a.p_name, b.p_name) <= 3"),
        (f_brand, "a.p_brand = b.p_brand"),
        (f_price, "abs(a.p_retailprice - b.p_retailprice) <= 0.5"),
    ]:
        terms.append(
            f"(CASE WHEN {agr} THEN CAST({f.agree_weight!r} AS DOUBLE)"
            f" ELSE CAST({f.disagree_weight!r} AS DOUBLE) END)"
        )
    score = f"((CAST(0.0 AS DOUBLE) + {terms[0]}) + {terms[1]}) + {terms[2]}"
    return f"""
WITH ranked AS (
  SELECT p_partkey, p_name, p_brand, p_retailprice,
         row_number() OVER (ORDER BY {_Q107_KEY}) AS rnk
  FROM part
),
pairs AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, {score} AS score
  FROM ranked a JOIN ranked b
    ON b.rnk > a.rnk AND b.rnk <= a.rnk + {_Q107_W}
),
classed AS (
  SELECT CASE WHEN score >= 4.0 THEN 'match'
              WHEN score <= 0.0 THEN 'non_match'
              ELSE 'possible' END AS link_class,
         score
  FROM pairs
)
SELECT link_class, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {sql_dsum('score')} AS total_score
FROM classed GROUP BY 1 ORDER BY 1
"""


@register("q107_sorted_neighborhood", _q107_oracle())
def q107_sorted_neighborhood(spark, sf_dir):
    from ..functions.stats import dsum
    from ..operators.linkage import classify, score_pairs, sorted_neighborhood_pairs

    part = load(spark, sf_dir, "part").withColumn("_snkey", F.expr(_Q107_KEY))
    fields = _q104_fields()
    pairs = sorted_neighborhood_pairs(
        part, "p_partkey", "_snkey", _Q107_W, [f.col for f in fields]
    )
    linked = classify(score_pairs(pairs, fields), lower=0.0, upper=4.0)
    return (
        linked.groupBy("link_class")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            dsum("score").alias("total_score"),
        )
        .orderBy("link_class")
    )


# ---------------------------------------------------------------------------
# q109/q110 — exact substring-span dedup (Lee et al. n-gram relaxation):
# positioned 4-gram seeds duplicated across >= 2 docs, interval-union
# merged into maximal per-doc spans (operators/spandedup.py).
# ---------------------------------------------------------------------------

_SPAN_N = 4

_span_cte = f"""
WITH ws AS (
  SELECT doc_id, {sql_words('text')} AS w FROM documents
),
pos_sh AS (
  SELECT doc_id, u.pos AS pos, u.sh AS shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(0, len(w) - {_SPAN_N}),
        i -> struct_pack(pos := i, sh := array_to_string(w[i+1 : i+{_SPAN_N}], ' ')))) AS u
    FROM ws WHERE len(w) >= {_SPAN_N})
),
dup AS (
  SELECT shingle FROM pos_sh GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
),
starts AS (
  SELECT doc_id, pos FROM pos_sh WHERE shingle IN (SELECT shingle FROM dup)
),
marked AS (
  SELECT doc_id, pos,
         MAX(pos + {_SPAN_N - 1}) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM starts
),
runs AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM marked
),
spans AS (
  SELECT doc_id, span_id, MIN(pos) AS start, MAX(pos + {_SPAN_N - 1}) AS "end"
  FROM runs GROUP BY doc_id, span_id
)
"""

_Q109_ORACLE = _span_cte + """
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM("end" - start + 1) AS BIGINT) AS dup_tokens,
       CAST(len(ws.w) AS BIGINT) AS n_words,
       SUM("end" - start + 1) / len(ws.w) AS dup_frac
FROM spans s JOIN ws ON s.doc_id = ws.doc_id
GROUP BY s.doc_id, len(ws.w) ORDER BY s.doc_id
"""


@register("q109_span_dedup", _Q109_ORACLE)
def q109_span_dedup(spark, sf_dir):
    from ..operators.spandedup import span_stats

    docs = load(spark, sf_dir, "documents")
    out = span_stats(docs, "doc_id", "text", _SPAN_N, min_docs=2, hash_mode="text")
    return out.select(
        "doc_id",
        F.col("n_spans").cast("bigint"),
        F.col("dup_tokens").cast("bigint"),
        F.col("n_words").cast("bigint"),
        "dup_frac",
    ).orderBy("doc_id")


_Q110_ORACLE = _span_cte + """
, covered AS (
  SELECT doc_id, unnest(generate_series(start, "end")) AS pos FROM spans
),
toks AS (
  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
    SELECT doc_id, unnest(list_transform(generate_series(0, len(w) - 1),
        i -> struct_pack(pos := i, tok := w[i+1]))) AS u
    FROM ws)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM toks t
  ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
),
rebuilt AS (
  SELECT doc_id,
         array_to_string(list_transform(
             list_sort(list(struct_pack(p := pos, t := tok))), x -> x.t), ' ') AS clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r.clean, '') AS text,
       CAST(len(ws.w) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d
JOIN ws ON d.doc_id = ws.doc_id
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
ORDER BY d.doc_id
"""


@register("q110_span_clean", _Q110_ORACLE)
def q110_span_clean(spark, sf_dir):
    from ..operators.spandedup import remove_dup_spans

    docs = load(spark, sf_dir, "documents")
    out = remove_dup_spans(docs, "doc_id", "text", _SPAN_N, min_docs=2, hash_mode="text")
    return out.select(
        "doc_id", "text", F.col("n_removed").cast("bigint")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q114 — exact edit-distance similarity join (Ed-Join q-gram prefix
# filter, Xiao/Wang/Lin VLDB'08): all customer-name pairs within
# Levenshtein distance 1. The Spark plan indexes only each record's
# q·d+1 rarest positional q-grams (no cross join; hot grams never fan
# out) and a bounded levenshtein verifies; the oracle IS the quadratic
# brute-force join, so the gate proves the filter is lossless.
# ---------------------------------------------------------------------------

_Q114_D = 1

_Q114_ORACLE = f"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_Q114_D}
ORDER BY id_a, id_b
"""


@register("q114_editdist_join", _Q114_ORACLE)
def q114_editdist_join(spark, sf_dir):
    from ..operators.editdist import edit_distance_self_join

    cust = load(spark, sf_dir, "customer")
    return edit_distance_self_join(cust, "c_custkey", "c_name", d=_Q114_D).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# q117 — product quantization ANN (operators/pq): embeddings quantized to
# the integer grid, codes assigned against literal codebooks (argmin of
# integer squared-L2, ties to the lowest code), then ADC top-10 for three
# literal queries via per-query lookup tables. Every number is integer
# arithmetic over literals, so the ENTIRE index-build + scoring chain is
# SQL-replayable — the approximation is PQ's design, not the engine.
# ---------------------------------------------------------------------------

_Q117_DIM, _Q117_M, _Q117_K = 64, 4, 16
_Q117_TOPK = 10


def _q117_setup():
    import random as _r

    from ..operators.pq import random_codebooks

    books = random_codebooks(_Q117_M, _Q117_K, _Q117_DIM // _Q117_M, -530, 460, seed=117)
    rng = _r.Random(1170)
    queries = [
        (qid, [rng.randint(-530, 460) for _ in range(_Q117_DIM)]) for qid in range(3)
    ]
    return books, queries


def _q117_oracle() -> str:
    from ..operators.pq import sql_adc_topk, sql_assign_codes

    books, queries = _q117_setup()
    codes_cte = sql_assign_codes(
        "embeddings", "vec_id", "embedding", books, _Q117_DIM
    )
    return sql_adc_topk(codes_cte, queries, books, _Q117_TOPK)


@register("q117_pq_adc_topk", _q117_oracle())
def q117_pq_adc_topk(spark, sf_dir):
    from ..operators.pq import adc_topk, assign_codes

    books, queries = _q117_setup()
    emb = load(spark, sf_dir, "embeddings")
    codes = assign_codes(emb, "vec_id", "embedding", books, _Q117_DIM)
    return adc_topk(codes, queries, books, _Q117_TOPK).orderBy(
        "query_id", "adc_dist", "vec_id"
    )


# ---------------------------------------------------------------------------
# q118 — exact containment join (operators/simjoin.containment_join):
# directed near-subset pairs |A∩B| >= 0.9|A| over word-token sets — the
# quote/contained-document detector. Spark joins only each record's
# n - ceil(0.9 n) + 1 rarest tokens against the inverted index and
# verifies with integer array_intersect; the oracle is the quadratic
# brute force, proving the one-sided prefix filter lossless.
# ---------------------------------------------------------------------------

_Q118_NUM, _Q118_DEN = 9, 10

_Q118_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS inter,
       CAST(len(a.toks) AS BIGINT) AS n_a
FROM t a JOIN t b ON a.doc_id != b.doc_id
WHERE {_Q118_DEN} * len(list_intersect(a.toks, b.toks)) >= {_Q118_NUM} * len(a.toks)
ORDER BY id_a, id_b
"""


@register("q118_containment_join", _Q118_ORACLE)
def q118_containment_join(spark, sf_dir):
    from ..operators.simjoin import containment_join

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    out = containment_join(docs, "id", "toks", _Q118_NUM, _Q118_DEN)
    return out.select(
        F.col("id_a"), F.col("id_b"), F.col("inter").cast("int").alias("inter"),
        F.col("n_a").cast("bigint").alias("n_a"),
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q125 — IVF + PQ serving composition (the FAISS shape): a coarse
# quantizer (8 literal integer centroids — a PQ with m=1) prunes each
# query's scan to its nprobe=2 nearest cells; PQ codes answer with ADC.
# One scan serves the query batch. Centroids, codebooks, probe sets and
# LUTs are identical integer literals in both engines, so the chain —
# cell assignment, code assignment, pruning, scoring, tie order — is
# SQL-replayable end to end.
# ---------------------------------------------------------------------------

_Q125_NPROBE, _Q125_TOPK = 2, 10
_Q125_NCELLS = 8


def _q125_setup():
    import random as _r

    from ..operators.pq import random_codebooks

    books = random_codebooks(_Q125_M, _Q125_K, _Q117_DIM // _Q125_M, -530, 460, seed=125)
    cents = [
        [_r.Random(1250 + i).randint(-300, 300) for _ in range(_Q117_DIM)]
        for i in range(_Q125_NCELLS)
    ]
    rng = _r.Random(12500)
    queries = [
        (qid, [rng.randint(-530, 460) for _ in range(_Q117_DIM)]) for qid in range(3)
    ]
    return books, cents, queries


_Q125_M, _Q125_K = 4, 16


def _q125_oracle() -> str:
    from ..operators.pq import sql_codes_cte, sql_ivf_pq_topk

    books, cents, queries = _q125_setup()
    dsub = _Q117_DIM // _Q125_M
    groups = [("cell", 0, _Q117_DIM, cents)] + [
        (f"code_{j}", j * dsub, dsub, books[j]) for j in range(_Q125_M)
    ]
    cte = sql_codes_cte("embeddings", "vec_id", "embedding", groups, _Q117_DIM)
    return sql_ivf_pq_topk(cte, queries, books, cents, _Q125_NPROBE, _Q125_TOPK)


@register("q125_ivf_pq_topk", _q125_oracle())
def q125_ivf_pq_topk(spark, sf_dir):
    from ..operators.pq import assign_codes, ivf_pq_topk

    books, cents, queries = _q125_setup()
    emb = load(spark, sf_dir, "embeddings")
    codes = assign_codes(emb, "vec_id", "embedding", books, _Q117_DIM)
    cells = assign_codes(emb, "vec_id", "embedding", [cents], _Q117_DIM).withColumnRenamed(
        "code_0", "cell"
    )
    index = codes.join(cells, "vec_id")
    return ivf_pq_topk(
        index, queries, books, cents, _Q125_NPROBE, _Q125_TOPK
    ).orderBy("query_id", "adc_dist", "vec_id")


# ---------------------------------------------------------------------------
# q128 — exact longest common substring per candidate pair
# (operators/lcs): the precision refinement of span dedup. The Spark
# side is a numpy run-length DP in mapInPandas (the sanctioned Python
# path); the oracle does NOT trust it — it recomputes every pair's LCS
# as a recursive CTE walking diagonal character-match runs (each match
# visited exactly once), so the kernel's answer is proven, not assumed.
# Candidate pairs here: (doc_id d, d + 450) for d < 50.
# ---------------------------------------------------------------------------

_Q128_ORACLE = """
WITH RECURSIVE
pairs AS (
  SELECT d.doc_id AS id_a, d.doc_id + 450 AS id_b
  FROM documents d WHERE d.doc_id < 50
),
chars AS MATERIALIZED (
  SELECT doc_id, i, text[i:i] AS c
  FROM documents, LATERAL (SELECT unnest(range(1, len(text) + 1)) AS i)
  WHERE doc_id < 50 OR doc_id >= 450
),
matches AS MATERIALIZED (
  SELECT p.id_a, p.id_b, a.i AS i, b.i AS j
  FROM pairs p
  JOIN chars a ON a.doc_id = p.id_a
  JOIN chars b ON b.doc_id = p.id_b AND b.c = a.c
),
runs AS (
  SELECT m.id_a, m.id_b, m.i, m.j, 1 AS len
  FROM matches m
  WHERE NOT EXISTS (SELECT 1 FROM matches p
                    WHERE p.id_a = m.id_a AND p.id_b = m.id_b
                      AND p.i = m.i - 1 AND p.j = m.j - 1)
  UNION ALL
  SELECT r.id_a, r.id_b, m.i, m.j, r.len + 1
  FROM runs r JOIN matches m
    ON m.id_a = r.id_a AND m.id_b = r.id_b
   AND m.i = r.i + 1 AND m.j = r.j + 1
)
SELECT p.id_a, p.id_b, COALESCE(MAX(r.len), 0) AS lcs_len
FROM pairs p LEFT JOIN runs r ON r.id_a = p.id_a AND r.id_b = p.id_b
GROUP BY p.id_a, p.id_b
ORDER BY p.id_a
"""


@register("q128_lcs_pairs", _Q128_ORACLE)
def q128_lcs_pairs(spark, sf_dir):
    from ..operators.lcs import lcs_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = docs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 450).alias("id_b")
    )
    return lcs_pairs(pairs, docs, "doc_id", "text").orderBy("id_a")


# ---------------------------------------------------------------------------
# q145 — quality-based canonical selection: inside each MinHash duplicate
# component keep the HIGHEST-quality row (score = length(text); ties ->
# lowest id) instead of the arbitrary component minimum. The oracle
# replays the identical chain — LSH bands -> recursive reachability ->
# per-component argmax over the [score, -id] key — so curation's
# "keep-best survivor" policy is hash-checked end to end.
# ---------------------------------------------------------------------------

_Q145_ORACLE = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest({sql_shingles('text', _SHINGLE_N)}) AS shingle
  FROM documents
),
sig AS (
  SELECT doc_id,
    {_sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
    CASE b.band_id
      {_band_cases}
    END AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {_N_BANDS - 1})) AS band_id) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
),
comp AS (SELECT src AS node, MIN(dst) AS comp FROM reach GROUP BY 1),
scored AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS score FROM documents),
wc AS (
  SELECT s.doc_id, s.score, c.comp
  FROM scored s LEFT JOIN comp c ON s.doc_id = c.node
),
best AS (
  -- packed ordering key: score dominates, lower id wins ties
  -- (doc_id < 1e10 by contract of the synthetic ids)
  SELECT comp, arg_max(doc_id, score * 10000000000 - doc_id) AS best_id
  FROM wc WHERE comp IS NOT NULL GROUP BY comp
)
SELECT wc.doc_id,
       COALESCE(b.best_id, wc.doc_id) AS canonical_id,
       CAST(COALESCE(b.best_id, wc.doc_id) = wc.doc_id AS BOOLEAN) AS is_survivor
FROM wc LEFT JOIN best b ON wc.comp = b.comp
ORDER BY wc.doc_id
"""


@register("q145_canonical_by_quality", _Q145_ORACLE)
def q145_canonical_by_quality(spark, sf_dir):
    from ..operators.components import dedup_canonical_by

    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, "doc_id", "text", n_hashes=_N_HASHES, shingle_n=_SHINGLE_N, mode="affine"
    )
    pairs = lsh_candidate_pairs(sig, "doc_id", _N_HASHES, _N_BANDS)
    scored = docs.select(
        "doc_id", F.length("text").cast("long").alias("score")
    )
    out = dedup_canonical_by(scored, pairs, "doc_id", "score")
    return out.select(
        "doc_id",
        "canonical_id",
        (F.col("canonical_id") == F.col("doc_id")).alias("is_survivor"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q154 — rotated PQ (the OPQ family's random-rotation baseline): a
# seeded block-diagonal near-orthonormal rotation decorrelates the
# embedding before the integer-exact PQ chain. The rotation is shared
# EXPRESSION TEXT (left-folded c*x chains; +,* are IEEE-exact and
# left-assoc in both engines), so the rotated doubles — and therefore
# codes and ADC top-k — are bit-identical cross-engine: the whole
# rotate -> quantize -> assign -> ADC chain is hash-gated.
# ---------------------------------------------------------------------------

_Q154_DIM, _Q154_M, _Q154_K, _Q154_TOPK = 64, 4, 16, 10


def _q154_setup():
    import random as _r

    from ..operators.opq import rotation_blocks
    from ..operators.pq import random_codebooks

    blocks = rotation_blocks(_Q154_M, _Q154_DIM // _Q154_M, seed=154)
    books = random_codebooks(
        _Q154_M, _Q154_K, _Q154_DIM // _Q154_M, -530, 460, seed=1540
    )
    rng = _r.Random(15400)
    raw_queries = [
        (qid, [rng.uniform(-0.5, 0.5) for _ in range(_Q154_DIM)])
        for qid in range(3)
    ]
    return blocks, books, raw_queries


def _q154_rot_queries(blocks, raw_queries):
    import math as _m

    from ..operators.opq import rotate_query

    return [
        (qid, [int(_m.floor(v * 1000.0)) for v in rotate_query(q, blocks)])
        for qid, q in raw_queries
    ]


def _q154_oracle() -> str:
    from ..operators.opq import sql_rotated_list
    from ..operators.pq import sql_adc_topk, sql_assign_codes

    blocks, books, raw_queries = _q154_setup()
    rot_table = (
        f"(SELECT vec_id, {sql_rotated_list('embedding', blocks)} AS rvec"
        " FROM embeddings)"
    )
    codes_cte = sql_assign_codes(rot_table, "vec_id", "rvec", books, _Q154_DIM)
    return sql_adc_topk(
        codes_cte, _q154_rot_queries(blocks, raw_queries), books, _Q154_TOPK
    )


@register("q154_rotated_pq_topk", _q154_oracle())
def q154_rotated_pq_topk(spark, sf_dir):
    from ..operators.pq import adc_topk, assign_codes

    blocks, books, raw_queries = _q154_setup()
    # rotation fused into the Arrow kernel (opq.rotate_rows): same left
    # fold bit-for-bit, but the 1024 coefficients ride as task data —
    # the literal expression tree overflowed generated code and dropped
    # the scan stage to interpreted eval
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codes = assign_codes(
        emb, "vec_id", "embedding", books, _Q154_DIM, rotate_blocks=blocks
    )
    return adc_topk(
        codes, _q154_rot_queries(blocks, raw_queries), books, _Q154_TOPK
    ).orderBy("query_id", "adc_dist", "vec_id")


# ---------------------------------------------------------------------------
# q277 — SQ8 scalar quantization + integer top-k (operators/similarity.
# sq8_quantize/sq8_topk): per-dimension corpus min/max, floor-scaled
# int8 codes (floor, never round — no tie semantics), then top-10 by
# exact integer quantized dot product for 5 query vectors. The
# faiss/pgvector SQ8 serving path; the oracle replays stats, codes, and
# integer dots bit-for-bit.
# ---------------------------------------------------------------------------

_Q277_K = 10

_Q277_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
px AS (
  SELECT u.i AS pos, MIN(v[u.i]) AS mn, MAX(v[u.i]) AS mx
  FROM e CROSS JOIN generate_series(1, 64) u(i)
  GROUP BY 1
),
mnl AS (
  SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM px
),
q AS (
  SELECT e.vec_id,
         list_transform(generate_series(1, 64),
           i -> CASE WHEN m.mxs[i] = m.mns[i] THEN 0
                     ELSE LEAST(255, GREATEST(0,
                       CAST(FLOOR(255.0 * (e.v[i] - m.mns[i]) / (m.mxs[i] - m.mns[i])) AS INT)))
                END) AS qv
  FROM e CROSS JOIN mnl m
),
rec AS (
  SELECT q.vec_id,
         list_transform(generate_series(1, 64),
           i -> m.mns[i] + CAST(q.qv[i] AS DOUBLE) * (m.mxs[i] - m.mns[i]) / 255.0) AS rv
  FROM q CROSS JOIN mnl m
),
qs AS (SELECT vec_id AS query_id, rv AS qrv FROM rec WHERE vec_id < 5),
scored AS (
  SELECT qs.query_id, rec.vec_id,
         ROUND(list_dot_product(rec.rv, qs.qrv)
           / (SQRT(list_dot_product(rec.rv, rec.rv)) * SQRT(list_dot_product(qs.qrv, qs.qrv))), 6) AS cos
  FROM rec CROSS JOIN qs WHERE rec.vec_id <> qs.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_Q277_K}
ORDER BY query_id, rank
"""


@register("q277_sq8_quantized_topk", _Q277_ORACLE)
def q277_sq8_quantized_topk(spark, sf_dir):
    from ..operators.similarity import sq8_quantize, sq8_topk

    emb = load(spark, sf_dir, "embeddings")
    quantized, stats = sq8_quantize(emb)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id")
    )
    return sq8_topk(quantized, stats, queries, k=_Q277_K).select(
        "query_id", "vec_id", "cos", F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q278 — ANN quality readout: recall@10 of the SQ8 quantized ranking
# (q277) against the EXACT float cosine top-10 (q24's kernel) per
# query — the self-evaluation loop every vector-serving deployment
# runs before flipping traffic to a compressed index. Both rankings
# and the intersection replay in SQL.
# ---------------------------------------------------------------------------

_Q278_K = 10

_Q278_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
exact_scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_dot_product(q.qv, e.v)
           / (SQRT(list_dot_product(q.qv, q.qv)) * SQRT(list_dot_product(e.v, e.v))), 6) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
),
exact_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
    FROM exact_scored) WHERE rk <= {_Q278_K}
),
px AS (
  SELECT u.i AS pos, MIN(v[u.i]) AS mn, MAX(v[u.i]) AS mx
  FROM e CROSS JOIN generate_series(1, 64) u(i) GROUP BY 1
),
mnl AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM px),
qc AS (
  SELECT e.vec_id,
         list_transform(generate_series(1, 64),
           i -> CASE WHEN m.mxs[i] = m.mns[i] THEN 0
                     ELSE LEAST(255, GREATEST(0,
                       CAST(FLOOR(255.0 * (e.v[i] - m.mns[i]) / (m.mxs[i] - m.mns[i])) AS INT)))
                END) AS qv
  FROM e CROSS JOIN mnl m
),
rec AS (
  SELECT qc.vec_id,
         list_transform(generate_series(1, 64),
           i -> m.mns[i] + CAST(qc.qv[i] AS DOUBLE) * (m.mxs[i] - m.mns[i]) / 255.0) AS rv
  FROM qc CROSS JOIN mnl m
),
qqs AS (SELECT vec_id AS query_id, rv AS qrv FROM rec WHERE vec_id < 5),
sq_top AS (
  SELECT query_id, vec_id FROM (
    SELECT qqs.query_id, rec.vec_id,
           ROW_NUMBER() OVER (PARTITION BY qqs.query_id ORDER BY
             ROUND(list_dot_product(rec.rv, qqs.qrv)
               / (SQRT(list_dot_product(rec.rv, rec.rv)) * SQRT(list_dot_product(qqs.qrv, qqs.qrv))), 6)
             DESC, rec.vec_id) AS rk
    FROM rec CROSS JOIN qqs WHERE rec.vec_id <> qqs.query_id) WHERE rk <= {_Q278_K}
)
SELECT et.query_id,
       CAST(COUNT(st.vec_id) AS BIGINT) AS n_hit,
       ROUND(CAST(COUNT(st.vec_id) AS DOUBLE) / {_Q278_K}, 6) AS recall_at_k
FROM exact_top et
LEFT JOIN sq_top st ON st.query_id = et.query_id AND st.vec_id = et.vec_id
GROUP BY et.query_id
ORDER BY et.query_id
"""


@register("q278_sq8_recall", _Q278_ORACLE)
def q278_sq8_recall(spark, sf_dir):
    from ..operators.similarity import cosine_topk, sq8_quantize, sq8_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=_Q278_K).select(
        "query_id", "vec_id"
    )
    quantized, stats = sq8_quantize(emb)
    approx = sq8_topk(
        quantized, stats, queries.select(F.col("vec_id").alias("query_id")),
        k=_Q278_K,
    ).select("query_id", F.col("vec_id").alias("sq_vec"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["vec_id"] == approx["sq_vec"]),
        "left",
    ).select(exact["query_id"], "sq_vec")
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("sq_vec").cast("long").alias("n_hit"),
            F.round(
                F.count("sq_vec").cast("double") / F.lit(_Q278_K), 6
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q299 — perceptual-hash near-duplicate detection (pHash family): each
# 64-dim embedding is an 8x8 gray tile; a FIXED-POINT 2D DCT-II (integer
# basis literals, round(16384 * c_u * cos((2x+1)u*pi/16)) shared by both
# engines) produces 63 AC coefficients, the signature bit i is
# coeff_i > median(AC) (median = deterministic 32nd order statistic),
# and near-dups are found by 4x16-bit band blocking + hamming verify —
# the image-dedup shape of the LSH family (banding means candidates,
# never all-pairs). A twin corpus (ids + 100000, +1 on every third
# grid cell) provides the populated regime; everything is integer
# arithmetic, so the oracle replays it bit-for-bit.
# ---------------------------------------------------------------------------

_Q299_OFF = 100_000
_Q299_TWINS = 32
_Q299_HAM_T = 8


def _q299_basis_rows() -> str:
    import math

    rows = []
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            b = round(16384 * cu * math.cos((2 * x + 1) * u * math.pi / 16))
            rows.append((u, x, b))
    return ", ".join(f"({u}, {x}, {b})" for u, x, b in rows)


def _q299_oracle() -> str:
    return f"""
WITH base AS (
  SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS gq
  FROM embeddings
),
corpus AS (
  SELECT id, pos, gq FROM base
  UNION ALL
  SELECT id + {_Q299_OFF}, pos,
         gq + CASE WHEN pos % 3 = 0 THEN 1 ELSE 0 END
  FROM base WHERE id < {_Q299_TWINS}
),
cells AS (SELECT id, pos // 8 AS xr, pos % 8 AS yc, gq FROM corpus),
basis AS (SELECT * FROM (VALUES {_q299_basis_rows()}) AS t(u, x, b)),
t1 AS (
  SELECT c.id, bu.u, c.yc, SUM(bu.b * c.gq) AS t
  FROM cells c JOIN basis bu ON bu.x = c.xr GROUP BY 1, 2, 3
),
co AS (
  SELECT t1.id, t1.u, bv.u AS v, CAST(SUM(bv.b * t1.t) AS BIGINT) AS coeff
  FROM t1 JOIN basis bv ON bv.x = t1.yc GROUP BY 1, 2, 3
),
ac AS (
  SELECT id, u, v, coeff, u * 8 + v - 1 AS idx
  FROM co WHERE NOT (u = 0 AND v = 0)
),
med AS (
  SELECT id, coeff AS med FROM (
    SELECT id, coeff,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY coeff, u, v) AS rn
    FROM ac
  ) WHERE rn = 32
),
sig AS (
  SELECT a.id,
         SUM(CASE WHEN a.coeff > m.med
                  THEN (CAST(1 AS BIGINT) << a.idx) ELSE 0 END) AS sig
  FROM ac a JOIN med m ON m.id = a.id GROUP BY 1
),
bands AS (
  SELECT id, sig, g.j, (sig >> (16 * g.j)) & 65535 AS band
  FROM sig CROSS JOIN generate_series(0, 3) AS g(j)
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bands x JOIN bands y
    ON x.j = y.j AND x.band = y.band AND x.id < y.id
)
SELECT c.a, c.b,
       CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
FROM cand c
JOIN sig sa ON sa.id = c.a
JOIN sig sb ON sb.id = c.b
WHERE bit_count(xor(sa.sig, sb.sig)) <= {_Q299_HAM_T}
ORDER BY a, b
"""


@register("q299_phash_neardup", _q299_oracle())
def q299_phash_neardup(spark, sf_dir):
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "id",
        "pos",
        F.floor(F.col("val").cast("double") * 1000000.0)
        .cast("long")
        .alias("gq"),
    )
    # base feeds both the identity branch and the twin branch: one scan.
    base = base.cache()
    twins = base.filter(F.col("id") < _Q299_TWINS).select(
        (F.col("id") + _Q299_OFF).alias("id"),
        "pos",
        (
            F.col("gq")
            + F.when(F.col("pos") % 3 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("gq"),
    )
    corpus = base.unionByName(twins)
    cells = corpus.select(
        "id",
        F.expr("pos div 8").alias("xr"),
        (F.col("pos") % 8).alias("yc"),
        "gq",
    )
    basis = spark.range(1).selectExpr(
        f"inline(array({_q299_basis_struct_rows()}))"
    )
    t1 = (
        cells.join(F.broadcast(basis.select(F.col("u"), F.col("x"), F.col("b"))),
                   F.col("x") == F.col("xr"))
        .groupBy("id", "u", "yc")
        .agg(F.sum(F.col("b") * F.col("gq")).alias("t"))
    )
    co = (
        t1.join(
            F.broadcast(
                basis.select(
                    F.col("u").alias("v"), F.col("x").alias("bx"),
                    F.col("b").alias("bv"),
                )
            ),
            F.col("bx") == F.col("yc"),
        )
        .groupBy("id", "u", "v")
        .agg(F.sum(F.col("bv") * F.col("t")).cast("long").alias("coeff"))
    )
    ac = co.filter(~((F.col("u") == 0) & (F.col("v") == 0))).select(
        "id", "u", "v", "coeff", (F.col("u") * 8 + F.col("v") - 1).alias("idx")
    )
    win = Window.partitionBy("id").orderBy("coeff", "u", "v")
    med = (
        ac.select("id", "coeff", F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") == 32)
        .select(F.col("id").alias("mid"), F.col("coeff").alias("med"))
    )
    sig = (
        ac.join(med, F.col("mid") == F.col("id"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    F.col("coeff") > F.col("med"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), idx)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("sig")
        )
    )
    # sig feeds band explosion + two verify joins: one computation.
    sig = sig.cache()
    bands = sig.select(
        "id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
    ).select(
        "id",
        "j",
        F.expr("(sig >> (16 * j)) & 65535").alias("band"),
    )
    left = bands.select(
        F.col("id").alias("a"), F.col("j").alias("ja"), F.col("band").alias("ba")
    )
    right = bands.select(
        F.col("id").alias("b"), F.col("j").alias("jb"), F.col("band").alias("bb")
    )
    cand = (
        left.join(
            right,
            (F.col("ja") == F.col("jb"))
            & (F.col("ba") == F.col("bb"))
            & (F.col("a") < F.col("b")),
        )
        .select("a", "b")
        .distinct()
    )
    sa = sig.select(F.col("id").alias("a"), F.col("sig").alias("sa"))
    sb = sig.select(F.col("id").alias("b"), F.col("sig").alias("sb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.expr("CAST(bit_count(sa ^ sb) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _Q299_HAM_T)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    )


def _q299_basis_struct_rows() -> str:
    import math

    rows = []
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            b = round(16384 * cu * math.cos((2 * x + 1) * u * math.pi / 16))
            rows.append(f"struct({u} as u, {x} as x, {b} as b)")
    return ", ".join(rows)


# ---------------------------------------------------------------------------
# q300 — winnowing fingerprints (operators/winnowing — Schleimer et al.
# 2003, the MOSS algorithm): k-gram XXH64, per-window-of-w minimum with
# rightmost tiebreak, stop-fingerprint cap, shared-fingerprint doc
# pairs. The oracle replays XXH64 itself (functions/xxh64sql) and the
# window argmin, so the fast JVM hash path is bit-exact-gated like q52.
# ---------------------------------------------------------------------------

_Q300_K = 3
_Q300_W = 4


def _q300_oracle() -> str:
    from ..functions.xxh64sql import hash_int, sql_xxhash64_str

    xxh_block = sql_xxhash64_str(
        "(SELECT DISTINCT s FROM g2)", [hash_int(0, 42)]
    )
    w = _Q300_W
    return f"""
WITH RECURSIVE toks AS (
  SELECT id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS tok
  FROM (SELECT doc_id AS id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
grams AS (
  SELECT id, pos,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS s,
         LEAD(tok, 2) OVER w IS NOT NULL AS isfull
  FROM toks WINDOW w AS (PARTITION BY id ORDER BY pos)
),
g2 AS (SELECT id, pos, s FROM grams WHERE isfull),
{xxh_block},
hashed AS (SELECT g.id, g.pos, x.hv AS h FROM g2 g JOIN xxh x ON x.s = g.s),
m AS (SELECT id, COUNT(*) AS m FROM hashed GROUP BY 1),
expl AS (
  SELECT id, pos, h,
         unnest(generate_series(GREATEST(pos - {w - 1}, 0),
                                LEAST(pos, m - {w}))) AS ws
  FROM hashed JOIN m USING (id) WHERE m >= {w}
),
sel AS (
  SELECT id, pos, h,
         ROW_NUMBER() OVER (PARTITION BY id, ws ORDER BY h, pos DESC) AS rn
  FROM expl
),
fp AS (SELECT DISTINCT id, h FROM sel WHERE rn = 1),
dfc AS (SELECT h, COUNT(*) AS df FROM fp GROUP BY 1),
kept AS (SELECT f.id, f.h FROM fp f JOIN dfc USING (h) WHERE dfc.df <= 50)
SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.h = b.h AND a.id < b.id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY 1, 2
"""


@register("q300_winnowing", _q300_oracle())
def q300_winnowing(spark, sf_dir):
    from ..operators.winnowing import shared_fingerprint_pairs, winnow_fingerprints

    docs = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs, "doc_id", "text", k=_Q300_K, w=_Q300_W)
    return shared_fingerprint_pairs(fps, min_shared=2, max_df=50).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# q301 — content-defined chunking dedup (the rsync/LBFS idea at token
# granularity): a chunk boundary falls AFTER every token whose XXH64 is
# 0 mod D — boundaries depend only on content, so identical runs dedupe
# across documents regardless of offset (what fixed-size chunking
# misses). Chunks are order-stable token joins, fingerprinted with a
# second XXH64, and the output is every chunk shared by >= 2 docs.
# Both hash stages are replayed bit-for-bit by the oracle
# (functions/xxh64sql). Scale shape: per-doc window cumsum for chunk
# ids, one (id, cid) groupBy, one fingerprint groupBy — no all-pairs.
# ---------------------------------------------------------------------------

_Q301_D = 8  # ~D-token average chunks


def _q301_oracle() -> str:
    from ..functions.xxh64sql import hash_int, sql_xxhash64_str

    tok_xxh = sql_xxhash64_str(
        "(SELECT DISTINCT tok AS s FROM toks)",
        [hash_int(1, 42)],
        out_cte="txxh",
        prefix="tx",
    )
    chk_xxh = sql_xxhash64_str(
        "(SELECT DISTINCT chunk_text AS s FROM chunks)",
        [hash_int(2, 42)],
        out_cte="cxxh",
        prefix="cx",
    )
    d = _Q301_D
    return f"""
WITH RECURSIVE toks AS (
  SELECT id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS tok
  FROM (SELECT doc_id AS id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
        FROM documents)
),
{tok_xxh},
flags AS (
  SELECT t.id, t.pos, t.tok,
         CASE WHEN ((x.hv % {d}) + {d}) % {d} = 0 THEN 1 ELSE 0 END AS brk
  FROM toks t JOIN txxh x ON x.s = t.tok
),
cids AS (
  SELECT id, pos, tok,
         COALESCE(SUM(brk) OVER (PARTITION BY id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
  FROM flags
),
chunks AS (
  SELECT id, cid, COUNT(*) AS n_tok,
         string_agg(tok, ' ' ORDER BY pos) AS chunk_text
  FROM cids GROUP BY 1, 2
),
{chk_xxh}
SELECT c.hv AS fp, MIN(ch.n_tok) AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(COUNT(DISTINCT ch.id) AS BIGINT) AS n_docs
FROM chunks ch JOIN cxxh c ON c.s = ch.chunk_text
GROUP BY 1 HAVING COUNT(DISTINCT ch.id) >= 2
ORDER BY fp
"""


@register("q301_cdc_chunk_dedup", _q301_oracle())
def q301_cdc_chunk_dedup(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("pos", "tok"),
    )
    flags = toks.select(
        "id",
        "pos",
        "tok",
        F.when(
            F.pmod(F.xxhash64(F.lit(1), F.col("tok")), F.lit(_Q301_D)) == 0, 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cids = flags.select(
        "id",
        "pos",
        "tok",
        F.coalesce(F.sum("brk").over(win), F.lit(0)).alias("cid"),
    )
    chunks = cids.groupBy("id", "cid").agg(
        F.count("*").alias("n_tok"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk_text"),
    )
    return (
        chunks.select(
            "id",
            "n_tok",
            F.xxhash64(F.lit(2), F.col("chunk_text")).alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.min("n_tok").alias("n_tok"),
            F.count("*").cast("long").alias("n_occ"),
            F.countDistinct("id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("fp")
    )


# ---------------------------------------------------------------------------
# q310 — dedup-quality self-eval: the q19 MinHash-LSH candidate set is
# scored against the EXACT trigram-Jaccard >= 0.2 truth set (unblocked
# prefix-filter path — never all-pairs on the Spark side), producing
# the precision / recall / F1 a curation team reads before trusting a
# banding config. The oracle recomputes the truth naively (quadratic is
# fine for a gate) and replays the affine MinHash chain, so the scores
# themselves are bit-exact. The eval-harness pattern of q278 applied to
# the dedup family.
# ---------------------------------------------------------------------------

_Q310_T = 0.2


def _q310_oracle() -> str:
    m = (
        "ROUND(CAST(tp.c AS DOUBLE) / nc.c, 9) AS precision_,\n"
        "       ROUND(CAST(tp.c AS DOUBLE) / nt.c, 9) AS recall_,\n"
        "       ROUND(2.0 * (CAST(tp.c AS DOUBLE) / nc.c)"
        " * (CAST(tp.c AS DOUBLE) / nt.c)"
        " / ((CAST(tp.c AS DOUBLE) / nc.c) + (CAST(tp.c AS DOUBLE) / nt.c)),"
        " 9) AS f1"
    )
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({sql_shingles('text', _SHINGLE_N)}) AS shingle
  FROM documents
),
sig AS (
  SELECT doc_id,
    {_sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_id,
    CASE b.band_id
      {_band_cases}
    END AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, {_N_BANDS - 1})) AS band_id) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
ssets AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ssets GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM ssets a JOIN ssets b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = common.id_a
  JOIN sizes sb ON sb.doc_id = common.id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= {_Q310_T}
),
nc AS (SELECT COUNT(*) AS c FROM cand),
nt AS (SELECT COUNT(*) AS c FROM truth),
tp AS (SELECT COUNT(*) AS c FROM cand JOIN truth USING (id_a, id_b))
SELECT CAST(nc.c AS BIGINT) AS n_candidates,
       CAST(nt.c AS BIGINT) AS n_truth,
       CAST(tp.c AS BIGINT) AS n_true_positive,
       {m}
FROM nc CROSS JOIN nt CROSS JOIN tp
"""


@register("q310_minhash_quality", _q310_oracle())
def q310_minhash_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, "doc_id", "text",
        n_hashes=_N_HASHES, shingle_n=_SHINGLE_N, mode="affine",
    )
    cand = lsh_candidate_pairs(sig, "doc_id", _N_HASHES, _N_BANDS).select(
        "id_a", "id_b"
    )
    truth = (
        jaccard_pairs(
            docs, "doc_id", "text", shingle_n=_SHINGLE_N, threshold=_Q310_T
        )
        .filter(F.col("jaccard") >= _Q310_T)
        .select("id_a", "id_b")
    )
    cand = cand.cache()  # counted and intersected
    truth = truth.cache()
    nc = cand.agg(F.count("*").alias("nc"))
    nt = truth.agg(F.count("*").alias("nt"))
    tp = cand.join(truth, ["id_a", "id_b"]).agg(F.count("*").alias("tp"))
    return (
        nc.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(tp))
        .select(
            F.col("nc").cast("long").alias("n_candidates"),
            F.col("nt").cast("long").alias("n_truth"),
            F.col("tp").cast("long").alias("n_true_positive"),
            F.expr("ROUND(CAST(tp AS DOUBLE) / nc, 9)").alias("precision_"),
            F.expr("ROUND(CAST(tp AS DOUBLE) / nt, 9)").alias("recall_"),
            F.expr(
                "ROUND(2.0 * (CAST(tp AS DOUBLE) / nc)"
                " * (CAST(tp AS DOUBLE) / nt)"
                " / ((CAST(tp AS DOUBLE) / nc) + (CAST(tp AS DOUBLE) / nt)),"
                " 9)"
            ).alias("f1"),
        )
    )


# ---------------------------------------------------------------------------
# q326 — margin-based bitext mining (Artetxe & Schwenk 2019), the
# parallel-corpus miner behind CCMatrix-scale translation data: the
# embedding corpus splits into a "source" and "target" half, cross-side
# dot products live on an exact integer grid (floor-scaled coordinates,
# so both engines agree bit-for-bit), margin(x, y) = 2*dot /
# (avgtop4(x) + avgtop4(y)), and a pair is mined when x and y are
# MUTUAL cross-side argmaxes with margin above threshold.
#
# Since r5 the plan routes through operators/bitext.py, which has a REAL
# candidate stage (VERDICT r4 item 2): IVF cell blocking with nprobe
# probes (q354, the scale path) or banded integer-sign SRP (q353,
# exact-gated ANN). q326 runs the SAME code with nprobe=all cells —
# every pair is a candidate exactly once, so the result is bit-identical
# to exhaustive mining and the all-pairs DuckDB oracle still gates it.
# Dots are computed per-candidate with an int64 zip_with fold (no
# dimension explode/join).
# ---------------------------------------------------------------------------

_Q326_SPLIT = 250
_Q326_K = 4
_Q326_MARGIN = 1.05


def _q326_oracle() -> str:
    k, m = _Q326_K, _Q326_MARGIN
    return f"""
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS g
  FROM embeddings
),
src AS (SELECT * FROM e WHERE vec_id < {_Q326_SPLIT}),
tgt AS (SELECT * FROM e WHERE vec_id >= {_Q326_SPLIT}),
dots AS (
  SELECT s.vec_id AS x, t.vec_id AS y, SUM(s.g * t.g) AS dot
  FROM src s JOIN tgt t ON s.d = t.d
  GROUP BY 1, 2
),
ax AS (
  SELECT x, CAST(SUM(dot) AS DOUBLE) / {k} AS avg_x FROM (
    SELECT x, dot, ROW_NUMBER() OVER (PARTITION BY x ORDER BY dot DESC, y)
             AS rn
    FROM dots
  ) WHERE rn <= {k} GROUP BY 1
),
ay AS (
  SELECT y, CAST(SUM(dot) AS DOUBLE) / {k} AS avg_y FROM (
    SELECT y, dot, ROW_NUMBER() OVER (PARTITION BY y ORDER BY dot DESC, x)
             AS rn
    FROM dots
  ) WHERE rn <= {k} GROUP BY 1
),
bx AS (
  SELECT x, y FROM (
    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY dot DESC, y)
             AS rn
    FROM dots
  ) WHERE rn = 1
),
by_ AS (
  SELECT x, y FROM (
    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY y ORDER BY dot DESC, x)
             AS rn
    FROM dots
  ) WHERE rn = 1
)
SELECT d.x AS src_id, d.y AS tgt_id,
       ROUND(2.0 * CAST(d.dot AS DOUBLE) / (ax.avg_x + ay.avg_y), 9)
         AS margin
FROM dots d
JOIN bx ON bx.x = d.x AND bx.y = d.y
JOIN by_ ON by_.y = d.y AND by_.x = d.x
JOIN ax ON ax.x = d.x
JOIN ay ON ay.y = d.y
WHERE 2.0 * CAST(d.dot AS DOUBLE) / (ax.avg_x + ay.avg_y) >= {m}
ORDER BY src_id
"""


@register("q326_bitext_margin_mining", _q326_oracle())
def q326_bitext_margin_mining(spark, sf_dir):
    from ..operators.bitext import bitext_margin_mine

    e = load(spark, sf_dir, "embeddings")
    return bitext_margin_mine(
        e.filter(F.col("vec_id") < _Q326_SPLIT),
        e.filter(F.col("vec_id") >= _Q326_SPLIT),
        k=_Q326_K,
        margin_threshold=_Q326_MARGIN,
        method="ivf",
        n_cells=8,
        nprobe=None,  # exact gate: probe every cell = all pairs once
    )


# ---------------------------------------------------------------------------
# q353 — bitext margin mining, banded-SRP ANN mode, EXACT-gated: the
# candidate set (agree on >= 1 band of the integer-sign SRP signature)
# is deterministic arithmetic that DuckDB replays via sql_srp_bits, so
# the approximate miner itself gets a bit-exact hash gate — the q25/q233
# treatment applied to margin mining.
# ---------------------------------------------------------------------------

_Q353_PLANES = 16
_Q353_BANDS = 4


def _q353_oracle() -> str:
    k, m = _Q326_K, _Q326_MARGIN
    r = _Q353_PLANES // _Q353_BANDS
    bits = _srp_oracle_sig("v", _Q353_PLANES)
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS g
  FROM embeddings
),
sig AS (SELECT vec_id, g, {bits} AS bits FROM e),
src AS (SELECT * FROM sig WHERE vec_id < {_Q326_SPLIT}),
tgt AS (SELECT * FROM sig WHERE vec_id >= {_Q326_SPLIT}),
bn AS (SELECT unnest(generate_series(0, {_Q353_BANDS - 1})) AS band),
sb AS (
  SELECT s.vec_id AS x, bn.band, substr(s.bits, 1 + bn.band * {r}, {r}) AS bb
  FROM src s, bn
),
tb AS (
  SELECT t.vec_id AS y, bn.band, substr(t.bits, 1 + bn.band * {r}, {r}) AS bb
  FROM tgt t, bn
),
cand AS (
  SELECT DISTINCT sb.x, tb.y
  FROM sb JOIN tb ON sb.band = tb.band AND sb.bb = tb.bb
),
dots AS (
  SELECT c.x, c.y,
         CAST(list_sum(list_transform(generate_series(1, 64),
           i -> s.g[i] * t.g[i])) AS BIGINT) AS dot
  FROM cand c
  JOIN src s ON s.vec_id = c.x
  JOIN tgt t ON t.vec_id = c.y
),
ax AS (
  SELECT x, CAST(SUM(dot) AS DOUBLE) / {k} AS avg_x FROM (
    SELECT x, dot, ROW_NUMBER() OVER (PARTITION BY x ORDER BY dot DESC, y)
             AS rn
    FROM dots
  ) WHERE rn <= {k} GROUP BY 1
),
ay AS (
  SELECT y, CAST(SUM(dot) AS DOUBLE) / {k} AS avg_y FROM (
    SELECT y, dot, ROW_NUMBER() OVER (PARTITION BY y ORDER BY dot DESC, x)
             AS rn
    FROM dots
  ) WHERE rn <= {k} GROUP BY 1
),
bx AS (
  SELECT x, y FROM (
    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY dot DESC, y)
             AS rn
    FROM dots
  ) WHERE rn = 1
),
by_ AS (
  SELECT x, y FROM (
    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY y ORDER BY dot DESC, x)
             AS rn
    FROM dots
  ) WHERE rn = 1
)
SELECT d.x AS src_id, d.y AS tgt_id,
       ROUND(2.0 * CAST(d.dot AS DOUBLE) / (ax.avg_x + ay.avg_y), 9)
         AS margin
FROM dots d
JOIN bx ON bx.x = d.x AND bx.y = d.y
JOIN by_ ON by_.y = d.y AND by_.x = d.x
JOIN ax ON ax.x = d.x
JOIN ay ON ay.y = d.y
WHERE 2.0 * CAST(d.dot AS DOUBLE) / (ax.avg_x + ay.avg_y) >= {m}
ORDER BY src_id
"""


@register("q353_bitext_margin_srp", _q353_oracle())
def q353_bitext_margin_srp(spark, sf_dir):
    from ..operators.bitext import bitext_margin_mine

    e = load(spark, sf_dir, "embeddings")
    return bitext_margin_mine(
        e.filter(F.col("vec_id") < _Q326_SPLIT),
        e.filter(F.col("vec_id") >= _Q326_SPLIT),
        k=_Q326_K,
        margin_threshold=_Q326_MARGIN,
        method="srp",
        n_planes=_Q353_PLANES,
        n_bands=_Q353_BANDS,
    )


# ---------------------------------------------------------------------------
# q354 — bitext margin mining, IVF ANN mode: the 100 TB scale path.
# nprobe stays small, so candidate volume is O(N * nprobe * cell_size)
# — linear, not all-pairs. EXACT since round 6: centroids are FROZEN
# (trained once, persisted as literals — the q40 train-once/persist/
# serve pattern), so assignment (argmax cell by dot, tie -> higher
# cell: the reversed ascending struct sort), nprobe probing, the
# two-direction candidate union, and the margin algebra over candidate
# dots are ALL deterministic arithmetic DuckDB replays bit-for-bit.
# The in-query trainer path stays unit-tested; its determinism is not
# what this gate certifies.
# ---------------------------------------------------------------------------

_Q354_NPROBE = 2


def _q354_oracle() -> str:
    from ..operators._bitext_centroids import Q354_CENTROIDS

    k, m, np_ = _Q326_K, _Q326_MARGIN, _Q354_NPROBE
    cent_rows = ",\n    ".join(
        "({}, [{}])".format(i, ", ".join(repr(float(x)) for x in c))
        for i, c in enumerate(Q354_CENTROIDS)
    )
    return f"""
WITH spl AS (SELECT COUNT(*) // 2 AS s FROM embeddings),
ev AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents(cell, cv) AS (VALUES
    {cent_rows}
),
scored AS (
  SELECT ev.vec_id, c.cell, list_dot_product(ev.v, c.cv) AS sc
  FROM ev CROSS JOIN cents c
),
ranked_cells AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, cell DESC)
           AS rk
  FROM scored
),
x_assign AS (SELECT vec_id AS x, cell FROM ranked_cells, spl
             WHERE rk = 1 AND vec_id < spl.s),
x_probe  AS (SELECT vec_id AS x, cell FROM ranked_cells, spl
             WHERE rk <= {np_} AND vec_id < spl.s),
y_assign AS (SELECT vec_id AS y, cell FROM ranked_cells, spl
             WHERE rk = 1 AND vec_id >= spl.s),
y_probe  AS (SELECT vec_id AS y, cell FROM ranked_cells, spl
             WHERE rk <= {np_} AND vec_id >= spl.s),
cand AS (
  SELECT p.x, a.y FROM x_probe p JOIN y_assign a USING (cell)
  UNION
  SELECT a.x, p.y FROM x_assign a JOIN y_probe p USING (cell)
),
g AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS gg
  FROM embeddings
),
dots AS (
  SELECT c.x, c.y, SUM(sg.gg * tg.gg) AS dot
  FROM cand c
  JOIN g sg ON sg.vec_id = c.x
  JOIN g tg ON tg.vec_id = c.y AND tg.d = sg.d
  GROUP BY 1, 2
),
rnk AS (
  SELECT x, y, dot,
         ROW_NUMBER() OVER (PARTITION BY x ORDER BY dot DESC, y) AS rx,
         ROW_NUMBER() OVER (PARTITION BY y ORDER BY dot DESC, x) AS ry
  FROM dots
),
axs AS (SELECT x, CAST(SUM(dot) AS DOUBLE) / {k} AS avg_x
        FROM rnk WHERE rx <= {k} GROUP BY 1),
ays AS (SELECT y, CAST(SUM(dot) AS DOUBLE) / {k} AS avg_y
        FROM rnk WHERE ry <= {k} GROUP BY 1)
SELECT r.x AS src_id, r.y AS tgt_id,
       ROUND(2.0 * CAST(r.dot AS DOUBLE) / (axs.avg_x + ays.avg_y), 9)
         AS margin
FROM rnk r JOIN axs ON axs.x = r.x JOIN ays ON ays.y = r.y
WHERE r.rx = 1 AND r.ry = 1
  AND 2.0 * CAST(r.dot AS DOUBLE) / (axs.avg_x + ays.avg_y) >= {m}
ORDER BY src_id
"""


@register("q354_bitext_margin_ivf", _q354_oracle())
def q354_bitext_margin_ivf(spark, sf_dir):
    from ..operators._bitext_centroids import Q354_CENTROIDS
    from ..operators.bitext import bitext_margin_mine

    e = load(spark, sf_dir, "embeddings")
    n = e.count()  # one cheap metadata-only job; sizes the split
    return bitext_margin_mine(
        e.filter(F.col("vec_id") < F.lit(n // 2)),
        e.filter(F.col("vec_id") >= F.lit(n // 2)),
        k=_Q326_K,
        margin_threshold=_Q326_MARGIN,
        method="ivf",
        nprobe=_Q354_NPROBE,
        centroids=Q354_CENTROIDS,
    )


# ---------------------------------------------------------------------------
# q407 — binary-quantization (sign-bit) ANN: Hamming candidate stage over
# one packed BIGINT per vector + exact cosine rerank of the survivors.
# Deterministic end-to-end (bit packing, (hamming, id) candidate ties,
# rounded-cosine ranking), so the oracle replays the WHOLE chain — codes,
# candidate cut, rerank — bit-for-bit (the q25/q117/q125 treatment).
# ---------------------------------------------------------------------------

_Q407_OVERSAMPLE = 5


def _q407_oracle() -> str:
    from ..operators.similarity import sql_bq_bits

    bits = sql_bq_bits("v", 64)
    n_cand = _K * _Q407_OVERSAMPLE
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
b AS (SELECT vec_id, {bits} AS bits FROM e),
q AS (SELECT vec_id AS query_id, bits AS qbits FROM b WHERE vec_id < 5),
cand AS (
  SELECT q.query_id, b.vec_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY bit_count(xor(b.bits, q.qbits)), b.vec_id
         ) AS crank
  FROM b JOIN q ON b.vec_id <> q.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id,
         ROUND(
           list_dot_product(qe.v, e.v)
           / (SQRT(list_dot_product(qe.v, qe.v)) * SQRT(list_dot_product(e.v, e.v))),
           6
         ) AS cos
  FROM cand c
  JOIN e ON c.vec_id = e.vec_id
  JOIN e qe ON c.query_id = qe.vec_id
  WHERE c.crank <= {n_cand}
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@register("q407_bq_hamming_topk", _q407_oracle())
def q407_bq_hamming_topk(spark, sf_dir):
    from ..operators.similarity import bq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return bq_topk(
        emb, queries, "vec_id", "embedding", k=_K, dim=64,
        oversample=_Q407_OVERSAMPLE,
    ).orderBy("query_id", "rank")
