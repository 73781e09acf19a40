"""Exact edit-distance similarity join (Ed-Join-style q-gram prefix filter).

Entity resolution's other half (next to the Jaccard prefix-filter join in
``operators/simjoin``): all pairs of strings within Levenshtein distance
``d`` — exactly, with no cross join. The distributed shape follows
Ed-Join (Xiao, Wang & Lin, VLDB 2008 "Ed-Join: an efficient algorithm
for similarity joins with edit distance constraints"):

1. **Positional q-grams.** Each string of length L yields L-q+1
   (gram, pos) tokens. One edit operation destroys at most q of them, so
   two strings within distance d share at least
   ``max(La, Lb) - q + 1 - q*d`` grams, each surviving gram shifting
   position by at most d.
2. **Prefix filter.** Order every record's grams by ascending global
   gram frequency (rarest first). Since d edits destroy at most ``q*d``
   grams, any true pair must share at least one gram among each side's
   first ``q*d + 1`` grams in that order — so the candidate join only
   indexes those, and the hottest grams (think ``"00"`` in zero-padded
   ids) never fan out beyond the few records where they are rare-est.
3. **Filters only prune, never decide.** Candidates pass a length filter
   (``|La - Lb| <= d``), then the exact ``levenshtein`` verifies — Spark
   and the DuckDB oracle both implement unit-cost Levenshtein, so the
   decision is integer-exact cross-engine. Spark's 3.5+ bounded
   ``levenshtein(l, r, threshold)`` keeps verification O(d·min(L))
   instead of O(La·Lb).

Completeness edge: a string with at most ``q*d`` grams (length <=
``q*d + q - 1``) can have ALL its grams destroyed, so the gram index can
miss it. Those "shorts" are joined by brute force against every record
within the length filter — at scale that set is tiny and broadcast.

Scale shape: one shuffle for gram frequencies, one groupBy per record,
one equi-join on prefix grams, verification by id join. No cross join,
no quadratic stage; skew-hostile grams are excluded by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def positional_qgrams(s: Column, q: int) -> Column:
    """``array<struct<gram,pos>>`` of the string's positional q-grams
    (empty below length q). 1-based positions, mirrored by
    :func:`sql_positional_qgrams`."""
    return F.when(
        F.length(s) >= q,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - (q - 1)),
            lambda i: F.struct(s.substr(i, F.lit(q)).alias("gram"), i.alias("pos")),
        ),
    ).otherwise(F.array().cast("array<struct<gram:string,pos:int>>"))


def _deletion_variants(s: Column, d: int) -> Column:
    """Distinct deletion neighborhood del_{<=d}(s) including ``s`` itself
    (FastSS signatures; d in {1, 2})."""
    def del1(x: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(x)),
            lambda i: F.concat(x.substr(F.lit(1), i - 1), x.substr(i + 1, F.length(x))),
        )

    base = F.array(s)
    lvl1 = del1(s)
    out = F.array_union(base, lvl1)
    if d >= 2:
        lvl2 = F.flatten(F.transform(lvl1, del1))
        out = F.array_union(out, lvl2)
    return out


def _editdist_fastss(
    df: DataFrame, id_col: str, text_col: str, d: int
) -> DataFrame:
    """Deletion-neighborhood self-join (FastSS, Bocek et al. 2007):
    ``ed(a, b) <= d`` implies ``del_{<=d}(a) ∩ del_{<=d}(b) != ∅``, so an
    equi-join on deletion variants is a COMPLETE candidate generator —
    and a far more selective one than q-gram prefixes when ``d`` is
    small relative to string length (the variant keeps all but ``d``
    characters of context; a q-gram keeps ``q``). O(L^d) variants per
    record bounds this to small d; the caller dispatches.
    Filters prune, bounded ``levenshtein`` decides — same contract as
    the Ed-Join path, same output."""
    recs = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"),
    )
    vars_ = recs.select(
        "_id", "_txt", "_len",
        F.explode(_deletion_variants(F.col("_txt"), d)).alias("_v"),
    )
    pairs = (
        vars_.select(
            F.col("_id").alias("id_a"), F.col("_len").alias("len_a"),
            F.col("_txt").alias("_txt_a"), "_v",
        )
        .join(
            vars_.select(
                F.col("_id").alias("id_b"), F.col("_len").alias("len_b"),
                F.col("_txt").alias("_txt_b"), "_v",
            ),
            "_v",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= d)
        )
        # candidates repeat once per shared variant: dedup BEFORE the
        # verify (texts ride along, so no re-join) — shared-variant
        # multiplicity is high exactly when strings are near-equal
        .select("id_a", "id_b", "_txt_a", "_txt_b")
        .distinct()
        .withColumn("dist", F.levenshtein("_txt_a", "_txt_b", d))
        .filter(F.col("dist") >= 0)
    )
    return pairs.select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))


#: FastSS generates L+1 (d=1) / O(L^2) (d=2) variants per record, each
#: carrying the text — selective on short keys, an O(L^d+1) shuffle
#: blow-up on documents. Auto-dispatch probes max length (one cheap
#: single-column scan) and only takes FastSS below these bounds.
_FASTSS_MAX_LEN = {1: 512, 2: 64}


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    d: int,
    q: int = 2,
    algo: str = "auto",
) -> DataFrame:
    """All pairs ``id_a < id_b`` with ``levenshtein(text_a, text_b) <= d``
    — exactly. Output: ``(id_a, id_b, dist)``.

    Dispatch (``algo='auto'``): for ``0 < d <= 2`` AND short strings
    (max length probed with a one-column scan, bounds in
    ``_FASTSS_MAX_LEN``) the FastSS deletion-neighborhood join —
    complete and far more selective on entity-resolution keys; otherwise
    the Ed-Join q-gram prefix index, whose per-record index cost is a
    few grams regardless of string length. ``algo='fastss'``/``'edjoin'``
    forces a path. Either way filters only prune and the exact
    ``levenshtein`` decides. Strings too short for the gram guarantee
    fall back to a broadcast length-window join (complete by
    construction).
    """
    if d < 0:
        raise ValueError("edit-distance threshold must be >= 0")
    if algo not in ("auto", "fastss", "edjoin"):
        raise ValueError(f"unknown algo {algo!r}")
    if algo == "fastss" and not (0 < d <= 2):
        raise ValueError("fastss path requires 0 < d <= 2")
    if algo == "auto" and 0 < d <= 2:
        max_len = df.agg(F.max(F.length(text_col))).first()[0] or 0
        if max_len <= _FASTSS_MAX_LEN[d]:
            algo = "fastss"
    if algo == "fastss":
        return _editdist_fastss(df, id_col, text_col, d)
    if d == 0:
        # degenerate: exact-duplicate pairs
        recs = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
        a, b = recs.alias("a"), recs.alias("b")
        return (
            a.join(b, F.col("a._txt") == F.col("b._txt"))
            .filter(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.lit(0).cast("long").alias("dist"),
            )
        )
    prefix_len = q * d + 1
    min_safe_len = q * d + q  # > q*d grams survive the worst case

    recs = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"),
    )

    grams = recs.select(
        "_id", "_len", "_txt",
        F.explode(positional_qgrams(F.col("_txt"), q)).alias("g"),
    ).select(
        "_id", "_len", "_txt", F.col("g.gram").alias("gram"), F.col("g.pos").alias("pos")
    )

    # Global gram frequencies -> per-record rarity order -> q*d+1 prefix.
    freq = grams.groupBy("gram").agg(F.count("*").alias("freq"))
    prefixes = (
        grams.join(freq, "gram")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("freq", "gram", "pos")
            ),
        )
        .filter(F.col("_rk") <= prefix_len)
        .select("_id", "_len", "_txt", "gram")
    )

    # Verify-before-dedup: the strings ride the prefix index (short by
    # the nature of edit-distance workloads), so every candidate row
    # already holds both texts and the bounded levenshtein (early exit at
    # d+1, O(d*len)) runs INLINE on the join output — cheaper than the
    # alternative of distinct-ing ~10^7 near-unique candidate pairs and
    # re-joining ids back to texts twice (measured 4x on zero-padded
    # ids, where prefix grams are weakly selective). The final distinct
    # runs on the small verified set only.
    long_pairs = (
        prefixes.select(
            F.col("_id").alias("id_a"), F.col("_len").alias("len_a"),
            F.col("_txt").alias("_txt_a"), "gram",
        )
        .join(
            prefixes.select(
                F.col("_id").alias("id_b"), F.col("_len").alias("len_b"),
                F.col("_txt").alias("_txt_b"), "gram",
            ),
            "gram",
        )
        # NOTE: no positional filter — the prefix-intersection lemma
        # guarantees shared gram CONTENT in the prefixes, not that this
        # particular occurrence pair is the alignment-surviving one, so a
        # |pos_a - pos_b| <= d cut could drop a true pair. Length filter
        # only; levenshtein decides.
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= d)
        )
        .withColumn("dist", F.levenshtein("_txt_a", "_txt_b", d))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )

    # Shorts: gram guarantee void -> brute candidates within the length
    # filter (broadcast; the short set is bounded by construction).
    shorts = recs.filter(F.col("_len") < min_safe_len)
    short_pairs = (
        F.broadcast(
            shorts.select(
                F.col("_id").alias("id_s"), F.col("_len").alias("len_s"),
                F.col("_txt").alias("_txt_s"),
            )
        )
        .crossJoin(recs)
        .filter(
            (F.col("id_s") != F.col("_id"))
            & (F.abs(F.col("len_s") - F.col("_len")) <= d)
        )
        .withColumn("dist", F.levenshtein("_txt_s", "_txt", d))
        .filter(F.col("dist") >= 0)
        .select(
            F.least("id_s", "_id").alias("id_a"),
            F.greatest("id_s", "_id").alias("id_b"),
            "dist",
        )
    )

    return (
        long_pairs.unionByName(short_pairs)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
        .distinct()
    )
