"""Exact substring-span deduplication: find the maximal token spans of a
document that also occur (as an exact word n-gram) in other documents.

The training-data hygiene step popularized by "Deduplicating Training
Data Makes Language Models Better" (Lee et al., 2022): document-level
near-dup (MinHash, SimHash — operators/dedup.py) misses *partial*
duplication — boilerplate headers, license blocks, quoted passages —
which suffix-array tooling removes span-by-span. This is the relational
formulation of that step over positioned word n-grams:

1. **Positioned shingles** — one row per (doc, token position) with the
   word n-gram starting there (NOT distinct; position matters).
2. **Duplicated seeds** — n-grams occurring in >= ``min_docs`` distinct
   documents, via groupBy(shingle).countDistinct(doc).
3. **Coverage spans** — per doc, a token position is *duplicated* when
   covered by >= 1 duplicated n-gram; maximal runs of duplicated
   positions are the output spans (classic interval-union with a
   running-max window, no UDF).

Semantics vs the suffix-array original: a merged span is the union of
overlapping duplicated n-grams, so every token in it is part of SOME
cross-document duplicate of length >= n, but the span as a whole need
not occur verbatim elsewhere. That is the standard n-gram relaxation
(same contract as bloom-filter span dedup in public corpus pipelines);
it never misses a duplicated substring of length >= n.

Scale architecture (100 TB): the only corpus-wide shuffle is the
shingle-count aggregate, which partial-aggregates map-side and shuffles
``hash_mode='xxhash64'`` 8-byte keys rather than shingle text (~10x
smaller exchange). The duplicated-seed set is usually tiny relative to
the corpus, so the join back to positions is an AQE-eligible
broadcast; the span merge is a per-document window after a shuffle on
doc id — bounded state, no skew beyond document length. No collects,
no Python in the hot path.

Reference analogue: none (beyond-reference operator, training-data
pipeline family per BASELINE.json north star); the span-merge window
mirrors the gap-sessionize shape of operators/asof.sessionize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import words


def positioned_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, hash_mode: str = "text"
) -> DataFrame:
    """One row per n-gram start: (id_col, pos, shingle). ``pos`` is the
    0-based token index; docs shorter than ``n`` tokens emit nothing.
    ``hash_mode='xxhash64'`` replaces shingle text with an 8-byte hash
    (scale path; 'text' keeps strings so DuckDB can replay values)."""
    ws = df.withColumn("_ws", words(text_col)).filter(F.size("_ws") >= n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_ws") - n),
        lambda i: F.array_join(F.slice("_ws", i + 1, n), " "),
    )
    out = ws.select(F.col(id_col), F.posexplode(grams).alias("pos", "shingle"))
    if hash_mode == "xxhash64":
        return out.withColumn("shingle", F.xxhash64("shingle"))
    if hash_mode != "text":
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")
    return out


def duplicated_starts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int = 2,
    hash_mode: str = "text",
) -> DataFrame:
    """(id_col, pos) rows where the n-gram starting at ``pos`` occurs in
    >= ``min_docs`` distinct documents. Within-doc repeats alone do not
    qualify (countDistinct is over documents, matching the cross-doc
    contamination notion of Lee et al.)."""
    sh = positioned_shingles(df, id_col, text_col, n, hash_mode)
    dup_keys = (
        sh.groupBy("shingle")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("shingle")
    )
    return sh.join(dup_keys, "shingle", "left_semi").select(id_col, "pos")


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int = 2,
    hash_mode: str = "text",
) -> DataFrame:
    """Maximal duplicated spans per document:
    (id_col, span_id, start, end) with token-index bounds inclusive.
    Spans are disjoint and non-adjacent by construction (interval union
    of [pos, pos+n-1] covers, merged while touching or overlapping)."""
    starts = duplicated_starts(df, id_col, text_col, n, min_docs, hash_mode)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    return (
        starts.withColumn("span_id", F.sum(new_span).over(w))
        .groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("start"),
            F.max(F.col("pos") + (n - 1)).alias("end"),
        )
    )


def span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int = 2,
    hash_mode: str = "text",
) -> DataFrame:
    """Per document with >= 1 duplicated span: n_spans, dup_tokens
    (token positions covered), n_words, dup_frac. Docs with no span are
    omitted (their stats are trivially 0)."""
    spans = dup_spans(df, id_col, text_col, n, min_docs, hash_mode)
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("end") - F.col("start") + 1).alias("dup_tokens"),
    )
    lens = df.select(F.col(id_col), F.size(words(text_col)).alias("n_words"))
    return per_doc.join(lens, id_col).select(
        id_col,
        "n_spans",
        "dup_tokens",
        "n_words",
        (F.col("dup_tokens") / F.col("n_words")).alias("dup_frac"),
    )


def remove_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_docs: int = 2,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Rewrite each document with duplicated spans dropped: tokens at
    covered positions are removed, survivors re-joined by single
    spaces (tokenized text — original whitespace is not preserved,
    same contract as normalize_text). Returns (id_col, text_col,
    n_removed). Documents without spans pass through with n_removed=0.

    Distributed shape: covered positions explode from the span table
    ([start..end] sequences — bounded by document length), anti-join
    against positioned tokens, then a per-doc sort-merge re-assembly
    via array_sort(collect_list(struct(pos, token))). One shuffle per
    stage, all JVM expressions."""
    spans = dup_spans(df, id_col, text_col, n, min_docs, hash_mode)
    covered = spans.select(
        F.col(id_col),
        F.explode(F.sequence("start", "end")).alias("pos"),
    )
    tokens = df.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("pos", "tok")
    )
    kept = tokens.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("_clean"),
        F.count("*").alias("_n_kept"),
    )
    base = df.select(
        F.col(id_col), F.col(text_col), F.size(words(text_col)).alias("_n_words")
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_clean", F.lit("")).alias(text_col),
            (F.col("_n_words") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
