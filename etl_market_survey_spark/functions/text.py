"""Text analysis for training-data pipelines (beyond-reference, first-class:
language ID, quality scoring, token counting, fingerprinting).

All pure JVM expressions (split/regexp/md5/array ops) — no Python UDFs, so
they run inside whole-stage codegen and scale linearly with executors.
Regex patterns are restricted to syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB) so oracles can mirror them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists (public, standard function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "für", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "dans", "pour", "que"],
}

TOKEN_PATTERN = "[A-Za-z]+|[0-9]+"  # BPE-ish word/number split, engine-portable


def words(c: str | Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.lower(F.trim(col)), "\\s+")


def n_tokens_ws(c: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(words(c))


def n_tokens_re(c: str | Column) -> Column:
    """Regex token count (letters runs + digit runs)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def stopword_hits(c: str | Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(words(c), sw))


def detect_language(c: str | Column) -> Column:
    """Language-ID heuristic: argmax of per-language stopword hits,
    deterministic tie-break on language code; 'und' when nothing hits."""
    col = F.col(c) if isinstance(c, str) else c
    pairs = F.array(
        *[
            F.struct(
                stopword_hits(col, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(
        F.transform(
            pairs,
            lambda s: F.struct(
                s["hits"].alias("hits"),
                # invert lang for tie-break: max picks lexicographically
                # smallest language among equal hit counts
                F.lit(None).cast("string").alias("_pad"),
                s["lang"].alias("lang"),
            ),
        )
    )
    # array_max on structs orders lexicographically by fields: hits, then
    # _pad (all null), then lang -> ties resolve to LARGEST lang; flip by
    # explicit filter instead for a well-defined smallest-lang tiebreak.
    max_hits = F.array_max(F.transform(pairs, lambda s: s["hits"]))
    winners = F.filter(pairs, lambda s: s["hits"] == max_hits)
    first = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return F.when(max_hits > 0, first).otherwise(F.lit("und"))


def quality_score(c: str | Column) -> Column:
    """Heuristic quality in [0,1] from mean word length, alpha ratio and
    stopword ratio — integer counts + one double expression, so the same
    formula is reproducible in any engine."""
    col = F.col(c) if isinstance(c, str) else c
    n_ws = n_tokens_ws(col).cast("double")
    n_alpha = F.size(F.regexp_extract_all(col, F.lit("[A-Za-z]+"), F.lit(0))).cast("double")
    chars = F.length(col).cast("double")
    mean_word_len = chars / F.greatest(n_ws, F.lit(1.0))
    alpha_ratio = n_alpha / F.greatest(n_ws, F.lit(1.0))
    sw_en = stopword_hits(col, "en").cast("double") / F.greatest(n_ws, F.lit(1.0))
    # clamp each component to [0,1] and average
    c1 = F.least(mean_word_len / F.lit(8.0), F.lit(1.0))
    c2 = F.least(alpha_ratio, F.lit(1.0))
    c3 = F.least(sw_en * F.lit(5.0), F.lit(1.0))
    return (c1 + c2 + c3) / F.lit(3.0)


def fingerprint(c: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    lowercased token list (the classic shingle-set fingerprint)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words(col))), " "))


# ---------------------------------------------------------------------------
# matching DuckDB SQL fragments (keep in lockstep)
# ---------------------------------------------------------------------------

def sql_words(expr: str) -> str:
    return f"string_split_regex(lower(trim({expr})), '\\s+')"


def sql_n_tokens_ws(expr: str) -> str:
    return f"len({sql_words(expr)})"


def sql_n_tokens_re(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_PATTERN}'))"


def sql_stopword_hits(expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect({sql_words(expr)}, [{lst}]))"


def sql_fingerprint(expr: str) -> str:
    return f"md5(array_to_string(list_sort(list_distinct({sql_words(expr)})), ' '))"


def sql_shingles(expr: str, n: int) -> str:
    """DuckDB mirror of operators.dedup._shingles (distinct word n-grams)."""
    ws = sql_words(expr)
    if n == 1:
        return f"list_distinct({ws})"
    return (
        f"list_distinct(list_transform("
        f"generate_series(0, GREATEST(len({ws}) - {n}, 0)), "
        f"i -> array_to_string(({ws})[i + 1 : i + {n}], ' ')))"
    )


def doc_bigrams(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, w1, w2) bigram stream from regex tokens, order preserved.

    All JVM array ops (slice + zip + explode) — the token stream never
    leaves codegen until the bigram rows exist.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), F.lit(0)
    )
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.expr("slice(_t, 1, size(_t) - 1)").alias("w1"),
                    F.expr("slice(_t, 2, size(_t) - 1)").alias("w2"),
                )
            ).alias("_b"),
        )
        .select(id_col, F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )


def bigram_fluency(df, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-trained bigram LM score per document, in exact integers.

    The model is the corpus itself: c2(w1,w2) bigram counts and c1(w1)
    prev counts (two map-side-combined aggregations, shuffle =
    vocabulary). Each document bigram scores floor(1e6 * c2 / c1) — the
    maximum-likelihood P(w2|w1) on a 1e-6 integer grid, summed per doc.
    Integer floor-division keeps the whole chain bit-portable (no libm
    log whose last ulp differs across engines), which is what lets the
    oracle hash-match the scores, not just the row counts.

    At 100 TB the model side is vocabulary-sized: broadcast it when it
    fits (bigram vocab of ~1e8 won't — then the join shuffles on w1/w2,
    both map-combined first); the scoring join is the only corpus-scale
    shuffle.
    """
    big = doc_bigrams(df, id_col, text_col)
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("_c2"))
    # prev counts roll up from the bigram model (vocab-sized input), not
    # from a third pass over the corpus-scale bigram stream
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.expr("(1000000 * _c2) div _c1")).cast("bigint").alias("fluency"),
        )
    )


def normalize_text(c: str | Column) -> Column:
    """Canonical text normalization for dedup/fingerprint robustness:
    lowercase, digit runs -> '<num>' (cheap PII/number redaction),
    whitespace squashed, trimmed. Pure JVM expressions."""
    col = F.col(c) if isinstance(c, str) else c
    x = F.regexp_replace(F.lower(col), "[0-9]+", "<num>")
    return F.trim(F.regexp_replace(x, "\\s+", " "))


def sql_normalize_text(expr: str) -> str:
    """DuckDB mirror of normalize_text (the 'g' flag = replace-all,
    Spark's default)."""
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[0-9]+', '<num>', 'g'),"
        f" '\\s+', ' ', 'g'))"
    )


# --- PII redaction ----------------------------------------------------------
# Ordered (pattern, tag) rules: emails first (their digits must not
# half-match later rules), then IPs, then contiguous 13-19-digit card
# numbers BEFORE the looser phone rule (which would otherwise swallow
# them), phones last. Each is a single regexp_replace — the whole scrub
# is a map-only JVM expression chain, no UDF; the SQL mirror applies the
# identical rules in the identical order with RE2-compatible patterns
# ('g' = replace-all, Spark's default).

PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<ip>"),
    (r"\b\d{13,19}\b", "<card>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<phone>"),
]


def redact_pii(c: str | Column) -> Column:
    """Replace emails, IPv4s, phone-like digit runs, and long card-like
    numbers with typed tags, in that order."""
    col = F.col(c) if isinstance(c, str) else c
    for pat, tag in PII_RULES:
        col = F.regexp_replace(col, pat, tag)
    return col


def sql_redact_pii(expr: str) -> str:
    """DuckDB mirror of redact_pii (same rules, same order)."""
    out = expr
    for pat, tag in PII_RULES:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{tag}', 'g')"
    return out
