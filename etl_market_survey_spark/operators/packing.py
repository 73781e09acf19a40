"""Sequence packing (beyond reference — LLM training-data prep).

Training consumes fixed-length token sequences; documents don't come in
fixed lengths. The standard GPT-style packing is concat-and-chunk:
deterministically order the corpus, concatenate token streams, slice at
``capacity`` boundaries (documents may span a boundary). This operator
computes, for every document, exactly which training sequences its
tokens land in — without materializing tokens at all, pure integer
interval arithmetic on cumulative lengths.

Shape and scale:

1. shard by seeded content hash (md5 — the repo's engine-portable hash,
   same construction as operators/sampling) — packing is independent
   per shard, so state is bounded and the window sort below is
   per-shard, never global;
2. within a shard, order by (hash, id) — deterministic and engine-
   portable — and take the running token total (one window);
3. each doc occupies global token interval [cum - len, cum); training
   sequence k covers [k*capacity, (k+1)*capacity). Explode the doc into
   the sequences it overlaps (the interval-apportion shape of
   operators/intervals), emitting the token sub-range per sequence.

Invariants (unit-tested): every token lands in exactly one (seq, slot);
every sequence except a shard's last is exactly full; the layout is a
pure function of (ids, lengths, seed, capacity, n_shards).

All integer arithmetic (`div`, nonnegative operands), so the DuckDB
mirror (:func:`sql_pack_sequences`) replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash62(id_col: str, seed: int) -> F.Column:
    """Engine-portable 60-bit integer from the md5 rank hash."""
    h = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string")))
    return h


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """One row per (document, overlapped training sequence):
    ``(id, shard, seq_id, doc_lo, doc_hi, seq_off)`` — tokens
    ``[doc_lo, doc_hi)`` of the document fill the sequence starting at
    in-sequence offset ``seq_off``. Zero-length documents are dropped
    (they occupy no tokens)."""
    cap = int(capacity)
    if cap <= 0:
        raise ValueError("capacity must be positive")
    d = (
        df.select(
            F.col(id_col).alias("_id"), F.col(len_col).cast("long").alias("_len")
        )
        .filter(F.col("_len") > 0)
        .withColumn("_h", _hash62("_id", seed))
    )
    d = d.withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("_h", 1, 15), 16, 10).cast("long"), F.lit(n_shards)
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("_h", "_id")
    d = (
        d.withColumn("_cum", F.sum("_len").over(w))
        .withColumn("_start", F.col("_cum") - F.col("_len"))
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"_start div {cap}"), F.expr(f"(_cum - 1) div {cap}")
                )
            ),
        )
    )
    s_lo = F.col("seq_id") * cap
    return d.select(
        F.col("_id").alias(id_col),
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        (F.greatest(s_lo, F.col("_start")) - F.col("_start")).alias("doc_lo"),
        (F.least(s_lo + cap, F.col("_cum")) - F.col("_start")).alias("doc_hi"),
        F.pmod(F.greatest(s_lo, F.col("_start")), F.lit(cap)).alias("seq_off"),
    )


def sql_pack_sequences(
    table: str,
    id_expr: str,
    len_expr: str,
    capacity: int,
    n_shards: int = 8,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`pack_sequences` — same hash, same shards,
    same order, same intervals. Output column ``{id_expr}`` is aliased
    ``doc_id`` style by the caller's expression name, so pass a bare
    column name."""
    cap = int(capacity)
    return f"""
WITH d AS (
  SELECT {id_expr} AS _id, CAST({len_expr} AS BIGINT) AS _len,
         md5(concat_ws(chr(31), '{seed}', CAST({id_expr} AS VARCHAR))) AS _h
  FROM {table}
  WHERE CAST({len_expr} AS BIGINT) > 0
),
s AS (
  SELECT *,
         CAST(CAST(concat('0x', substr(_h, 1, 15)) AS BIGINT) % {n_shards} AS INTEGER) AS shard
  FROM d
),
c AS (
  SELECT _id, _len, shard,
         CAST(SUM(_len) OVER (PARTITION BY shard ORDER BY _h, _id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum
  FROM s
),
e AS (
  SELECT _id, shard, _cum, _cum - _len AS _start,
         unnest(generate_series((_cum - _len) // {cap}, (_cum - 1) // {cap})) AS seq_id
  FROM c
)
SELECT _id AS {id_expr}, shard, CAST(seq_id AS BIGINT) AS seq_id,
       GREATEST(seq_id * {cap}, _start) - _start AS doc_lo,
       LEAST((seq_id + 1) * {cap}, _cum) - _start AS doc_hi,
       GREATEST(seq_id * {cap}, _start) % {cap} AS seq_off
FROM e
"""


def chunk_spans(
    df: DataFrame,
    id_col: str,
    len_col: str,
    chunk: int,
    overlap: int = 0,
) -> DataFrame:
    """RAG-style overlapping chunk spans: ``(id, chunk_idx, lo, hi)``
    with stride ``chunk - overlap``; the last chunk may be short, every
    position is covered, consecutive chunks share ``overlap`` positions.
    Zero-length inputs produce no chunks. Pure integer math (the DuckDB
    mirror :func:`sql_chunk_spans` replays it bit-for-bit)."""
    chunk, overlap = int(chunk), int(overlap)
    if chunk <= 0 or not (0 <= overlap < chunk):
        raise ValueError("need chunk > 0 and 0 <= overlap < chunk")
    stride = chunk - overlap
    d = df.select(
        F.col(id_col).alias("_id"), F.col(len_col).cast("long").alias("_len")
    ).filter(F.col("_len") > 0)
    # number of chunks: 1 + ceil(max(0, len - chunk) / stride)
    n_chunks = F.lit(1) + F.expr(
        f"(greatest(_len - {chunk}, 0L) + {stride} - 1) div {stride}"
    )
    d = d.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    )
    lo = F.col("chunk_idx") * stride
    return d.select(
        F.col("_id").alias(id_col),
        "chunk_idx",
        lo.alias("lo"),
        F.least(lo + chunk, F.col("_len")).alias("hi"),
    )


def sql_chunk_spans(
    table: str, id_expr: str, len_expr: str, chunk: int, overlap: int = 0
) -> str:
    """DuckDB mirror of :func:`chunk_spans`."""
    chunk, overlap = int(chunk), int(overlap)
    stride = chunk - overlap
    return f"""
WITH d AS (
  SELECT {id_expr} AS _id, CAST({len_expr} AS BIGINT) AS _len
  FROM {table} WHERE CAST({len_expr} AS BIGINT) > 0
),
e AS (
  SELECT _id, _len,
         unnest(generate_series(CAST(0 AS BIGINT),
                 (GREATEST(_len - {chunk}, 0) + {stride} - 1) // {stride})) AS chunk_idx
  FROM d
)
SELECT _id AS {id_expr}, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       chunk_idx * {stride} AS lo,
       LEAST(chunk_idx * {stride} + {chunk}, _len) AS hi
FROM e
"""


def pack_bins_nosplit(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Boundary-respecting packing (next-fit): documents are NEVER split;
    in per-shard hash order each doc goes into the current bin if it
    fits, else opens the next bin. Docs longer than ``capacity`` get a
    bin of their own (callers chunk them first via :func:`chunk_spans`
    if that is not acceptable). Output: ``(id, shard, bin_id, bin_used)``
    where ``bin_used`` is the bin's fill AFTER placing the doc.

    Next-fit is a true sequential recurrence (each placement depends on
    the previous remainder), so it runs as ``applyInPandas`` per shard —
    state is one integer per shard, rows stream through Arrow in hash
    order. The DuckDB oracle replays the identical recurrence as a
    recursive CTE, making even this stateful operator exact-gated."""
    import pandas as pd

    cap = int(capacity)
    if cap <= 0:
        raise ValueError("capacity must be positive")
    d = (
        df.select(
            F.col(id_col).alias("_id"), F.col(len_col).cast("long").alias("_len")
        )
        .filter(F.col("_len") > 0)
        .withColumn("_h", _hash62("_id", seed))
        .withColumn(
            "shard",
            F.pmod(
                F.conv(F.substring("_h", 1, 15), 16, 10).cast("long"),
                F.lit(n_shards),
            ).cast("int"),
        )
    )
    id_field = [f for f in df.schema.fields if f.name == id_col][0]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, shard int, "
        "bin_id long, bin_used long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "_id"], kind="mergesort")
        bins, used_out = [], []
        bin_id, used = 0, 0
        first = True
        for ln in pdf["_len"]:
            ln = int(ln)
            if first:
                bin_id, used, first = 0, ln, False
            elif used + ln <= cap:
                used += ln
            else:
                bin_id += 1
                used = ln
            bins.append(bin_id)
            used_out.append(used)
        return pd.DataFrame(
            {
                id_col: pdf["_id"].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bins,
                "bin_used": used_out,
            }
        )

    return d.groupBy("shard").applyInPandas(pack, out_schema)


def sql_pack_bins_nosplit(
    table: str,
    id_expr: str,
    len_expr: str,
    capacity: int,
    n_shards: int = 8,
    seed: int = 42,
) -> str:
    """DuckDB mirror of :func:`pack_bins_nosplit` — the next-fit
    recurrence as a recursive CTE over per-shard row numbers."""
    cap = int(capacity)
    return f"""
WITH RECURSIVE d AS (
  SELECT {id_expr} AS _id, CAST({len_expr} AS BIGINT) AS _len,
         md5(concat_ws(chr(31), '{seed}', CAST({id_expr} AS VARCHAR))) AS _h
  FROM {table}
  WHERE CAST({len_expr} AS BIGINT) > 0
),
s AS (
  SELECT _id, _len, _h,
         CAST(CAST(concat('0x', substr(_h, 1, 15)) AS BIGINT) % {n_shards} AS INTEGER) AS shard
  FROM d
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY _h, _id) AS _rn FROM s
),
p AS (
  SELECT _id, shard, _rn, _len,
         CAST(0 AS BIGINT) AS bin_id, _len AS bin_used
  FROM r WHERE _rn = 1
  UNION ALL
  SELECT r._id, r.shard, r._rn, r._len,
         CASE WHEN p.bin_used + r._len <= {cap} THEN p.bin_id ELSE p.bin_id + 1 END,
         CASE WHEN p.bin_used + r._len <= {cap} THEN p.bin_used + r._len ELSE r._len END
  FROM r JOIN p ON r.shard = p.shard AND r._rn = p._rn + 1
)
SELECT _id AS {id_expr}, shard, bin_id, bin_used FROM p
"""
