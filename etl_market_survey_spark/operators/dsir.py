"""DSIR-style data selection via hashed n-gram importance weights
(beyond reference — training-data curation).

Implements the public method of Xie et al., "Data Selection for
Language Models via Importance Resampling" (NeurIPS 2023,
arXiv:2302.03169), deterministically: documents are featurized as
hashed-bigram bucket counts; two bag-of-buckets models (target domain
vs raw pool) give each raw document an importance log-weight

    log w(d) = Σ_b  n_d[b] · ( log p̂_target[b] − log p̂_raw[b] )

with Laplace smoothing; selection takes the top-N by weight (the
deterministic counterpart of the paper's Gumbel resampling — same
ranking statistic, reproducible across engines and reruns).

Spark-first shape:
- featurize: one pass — ``doc_bigrams`` (JVM array ops) → portable md5
  bucket (same hex-prefix→int trick on both engines) → per-doc bucket
  counts. Shuffle keys are (doc, bucket).
- models: one aggregation over the featurized stream with conditional
  counts (target vs raw) — B rows of state, map-side combined.
- scoring: the B-row log-ratio table (round-9 gated, the libm
  discipline) broadcasts back onto the per-doc counts; the weight is an
  exact decimal sum. No corpus-scale shuffle beyond featurization.
- selection: global top-N rides TakeOrderedAndProject (per-partition
  heap, never a full sort).

The whole chain is SQL-replayable — q201 hash-gates it against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import dsum
from ..functions.text import doc_bigrams


def _bucket(col: Column, n_buckets: int) -> Column:
    # md5 hex prefix (60 bits) -> int -> mod B; DuckDB replays with
    # ('0x' || substr(md5(x),1,15))::BIGINT % B
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % n_buckets


def hashed_bigram_counts(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, n) hashed-bigram feature counts per document."""
    big = doc_bigrams(df, id_col, text_col)
    return (
        big.select(
            id_col,
            _bucket(F.concat_ws("\x1f", "w1", "w2"), n_buckets).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )


def dsir_logweights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = 1024,
    out: str = "logw",
) -> DataFrame:
    """Importance log-weight per document: (id, is_target, n_bigrams,
    logw). Documents with < 2 tokens have no features — logw 0.0."""
    flags = docs.select(F.col(id_col), is_target.alias("_t"))
    feats = hashed_bigram_counts(docs, id_col, text_col, n_buckets).join(
        flags, id_col
    )
    model = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), F.col("n")).otherwise(0)).alias("_ct"),
        F.sum(F.when(~F.col("_t"), F.col("n")).otherwise(0)).alias("_cr"),
    )
    tot = model.agg(
        F.sum("_ct").cast("double").alias("_T"),
        F.sum("_cr").cast("double").alias("_R"),
    )
    b = F.lit(float(n_buckets))
    ratio = model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("_ct").cast("double") + 1.0) / (F.col("_T") + b)
            )
            - F.log(
                (F.col("_cr").cast("double") + 1.0) / (F.col("_R") + b)
            ),
            9,
        ).alias("_lr"),
    )
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col, "_t")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            dsum(F.col("n").cast("double") * F.col("_lr")).alias(out),
        )
    )
    return (
        flags.join(scored.drop("_t"), id_col, "left")
        .select(
            id_col,
            F.col("_t").alias("is_target"),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(out, F.lit(0.0)).alias(out),
        )
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_select: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Top-``n_select`` raw (non-target) documents by importance weight,
    deterministic (logw desc, id tiebreak)."""
    w = dsir_logweights(docs, id_col, text_col, is_target, n_buckets)
    return (
        w.filter(~F.col("is_target"))
        .orderBy(F.col("logw").desc(), id_col)
        .limit(n_select)
        .select(id_col, "n_bigrams", "logw")
    )


def sql_dsir_select(
    table: str,
    id_col: str,
    text_expr: str,
    target_pred: str,
    n_select: int,
    n_buckets: int = 1024,
) -> str:
    """DuckDB mirror of :func:`dsir_select` — keep in lockstep."""
    from ..functions.stats import sql_dsum
    from ..functions.text import TOKEN_PATTERN

    lr = (
        f"ROUND(LN((CAST(_ct AS DOUBLE) + 1.0) / (_T + {float(n_buckets)}))"
        f" - LN((CAST(_cr AS DOUBLE) + 1.0) / (_R + {float(n_buckets)})), 9)"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, ({target_pred}) AS _t,
         regexp_extract_all(lower({text_expr}), '{TOKEN_PATTERN}') AS t
  FROM {table}
),
big AS (
  SELECT {id_col}, _t,
         ('0x' || substr(md5(t[i] || chr(31) || t[i + 1]), 1, 15))::BIGINT
           % {n_buckets} AS bucket
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
  WHERE len(t) >= 2
),
feats AS (
  SELECT {id_col}, _t, bucket, COUNT(*) AS n FROM big GROUP BY 1, 2, 3
),
model AS (
  SELECT bucket,
         SUM(CASE WHEN _t THEN n ELSE 0 END) AS _ct,
         SUM(CASE WHEN NOT _t THEN n ELSE 0 END) AS _cr
  FROM feats GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(_ct) AS DOUBLE) AS _T, CAST(SUM(_cr) AS DOUBLE) AS _R
  FROM model
),
ratio AS (SELECT bucket, {lr} AS _lr FROM model, tot),
scored AS (
  SELECT f.{id_col},
         CAST(SUM(f.n) AS BIGINT) AS n_bigrams,
         {sql_dsum("CAST(f.n AS DOUBLE) * r._lr")} AS logw
  FROM feats f JOIN ratio r ON f.bucket = r.bucket
  WHERE NOT f._t
  GROUP BY 1
),
raws AS (SELECT {id_col} FROM toks WHERE NOT _t)
SELECT r.{id_col},
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       COALESCE(s.logw, 0.0) AS logw
FROM raws r LEFT JOIN scored s ON r.{id_col} = s.{id_col}
ORDER BY logw DESC, r.{id_col}
LIMIT {n_select}
"""
