"""Exact set-similarity join with prefix filtering (entity resolution).

The distributed AllPairs/PPJoin formulation of Vernica, Carey & Li
(SIGMOD 2010, "Efficient parallel set-similarity joins using
MapReduce"): order every record's token set by ascending global token
frequency; a pair with Jaccard >= t = num/den MUST share at least one
token inside each record's first ``n - ceil(t*n) + 1`` tokens in that
order (the "prefix"), because J >= t implies overlap >= ceil(t*n) on
each side. Joining only on prefix tokens therefore yields a candidate
SUPERSET — the rarest-token prefixes keep it small — and an exact
verification (integer cross-multiplied Jaccard, no floats anywhere in
the decision) makes the final answer identical to the brute-force
quadratic join. The filter only prunes, never decides — same contract
as the CMS and bloom stages here.

Scale shape: no cross join anywhere. One shuffle to count token
frequencies, one groupBy to sort each record's tokens by rarity, one
equi-join on prefix tokens (bounded: each record contributes only its
~(1-t)·n rarest tokens, so hot common tokens never enter the index),
then verification joins on record ids. Threshold is a rational
(num, den) so the accept test ``den*inter >= num*union`` is exact
integer arithmetic, bit-identical on any engine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SET = "_sim_tokens"

# ~rows of candidate-pair state a single verify task should hold; with
# ~100 B/candidate (two ids + two short token arrays) this keeps task
# memory in the low hundreds of MB — far from spill at executor defaults.
_CAND_ROWS_PER_PARTITION = 2_000_000
_MAX_VERIFY_PARTITIONS = 8192


def _size_verify_partitions(prefixes: DataFrame, key: str = "token"):
    """Size the verify-stage shuffle to CANDIDATE volume, not input rows
    (VERDICT r3 item 4: q96's residual 1.7x at sf1 was the verify
    shuffle spilling at 32 static partitions).

    The candidate count is exactly ``sum over prefix tokens of
    C(freq_in_prefix_index, 2)`` — computable from the prefix index
    itself with one cheap aggregate. The index is persisted first (the
    verify join needs it twice anyway), the histogram job runs over the
    cache, and the index is hash-repartitioned on the join key to
    ``ceil(candidates / _CAND_ROWS_PER_PARTITION)`` partitions (never
    fewer than the session's shuffle default — AQE coalesces small ones
    back). Returns the (persisted, possibly repartitioned) index."""
    prefixes = prefixes.persist()
    row = (
        prefixes.groupBy(key)
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(
                (F.col("c").cast("decimal(38,0)") * (F.col("c") - 1)) / 2
            ).alias("cand")
        )
        .collect()[0]
    )
    n_cand = int(row["cand"] or 0)
    spark = prefixes.sparkSession
    default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n = max(default, math.ceil(n_cand / _CAND_ROWS_PER_PARTITION))
    n = min(n, _MAX_VERIFY_PARTITIONS)
    # ALWAYS pin the partitioning explicitly (user repartition — AQE
    # honors the count): with canChangeCachedPlanOutputPartitioning on,
    # a cached index left on its natural partitioning gets coalesced by
    # CACHE bytes, but the verify join EXPLODES candidates far past its
    # input bytes — q96 measured 1.8x slower when the verify ran on the
    # coalesced handful of partitions. The sizing here exists precisely
    # because candidate volume, not input bytes, is the right signal.
    return prefixes.repartition(n, key)


def trigrams(c: str | Column) -> Column:
    """Distinct character trigrams of a string (empty below length 3).
    Mirrored in SQL by ``sql_trigrams``."""
    s = F.col(c) if isinstance(c, str) else c
    return F.when(
        F.length(s) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 2),
                lambda i: s.substr(i, F.lit(3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_trigrams(expr: str) -> str:
    """DuckDB mirror of :func:`trigrams` (1-based inclusive slicing)."""
    return (
        f"CASE WHEN len({expr}) >= 3 THEN "
        f"list_distinct(list_transform(generate_series(1, len({expr}) - 2), "
        f"i -> ({expr})[i:i+2])) ELSE [] END"
    )


def _prefix_len(n: Column, t_num: int, t_den: int) -> Column:
    # n - ceil(t*n) + 1, all integer: ceil(num*n/den) = (num*n + den - 1) div den
    return n - ((F.lit(t_num) * n + F.lit(t_den - 1)) / F.lit(t_den)).cast("long") + 1


def _sets_and_prefixes(
    df: DataFrame, id_col: str, token_col: str, freq: DataFrame, t_num: int, t_den: int
):
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.col(token_col))).alias("token"),
    )
    by_rarity = (
        toks.join(freq, "token")
        .groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("freq", "token"))).alias("_st"),
            F.count("*").alias("n"),
        )
        .withColumn("tokens", F.transform("_st", lambda x: x["token"]))
        .withColumn("p", _prefix_len(F.col("n"), t_num, t_den))
    )
    sets = by_rarity.select("_id", "tokens", "n")
    # the full rarity-sorted token array rides the prefix index: candidate
    # pairs then verify INLINE on the join output instead of distinct-ing
    # ~10^5-10^7 near-unique id pairs and re-joining both sides' sets
    # (the same measured win as the edit-distance join; payload is one
    # small array per row)
    # posexplode keeps each prefix token's 0-based rank in the global
    # rarity order — the PPJoin positional filter needs it
    prefixes = by_rarity.select(
        "_id", "tokens", "n",
        F.posexplode(F.slice("tokens", 1, F.col("p").cast("int"))).alias(
            "ppos", "token"
        ),
    )
    return sets, prefixes


def containment_join(
    df: DataFrame,
    id_col: str,
    token_col: str,
    t_num: int,
    t_den: int,
    size_verify: bool = True,
) -> DataFrame:
    """Directed containment pairs: all ``(id_a, id_b)``, ``a != b``, with
    ``|tokens_a ∩ tokens_b| >= (t_num/t_den) * |tokens_a|`` — exactly.
    The quote/subset detector: a is (nearly) contained in b.

    One-sided prefix filter: overlap >= ceil(t*n_a) forces at least one
    of a's ``n_a - ceil(t*n_a) + 1`` rarest tokens to appear in b (if
    none did, overlap <= ceil(t*n_a) - 1). So only a's prefix joins the
    full inverted index of b — at t=1 that is a SINGLE token per record.
    The filter prunes; an exact integer array_intersect verify decides.
    Output: ``(id_a, id_b, inter, n_a)``.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    toks_all = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.col(token_col))).alias("token"),
    )
    freq = toks_all.groupBy("token").agg(F.count("*").alias("freq"))
    by_rarity = (
        toks_all.join(freq, "token")
        .groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("freq", "token"))).alias("_st"),
            F.count("*").alias("n"),
        )
        .withColumn("tokens", F.transform("_st", lambda x: x["token"]))
        # prefix for containment: n - ceil(t*n) + 1 over n_a only
        .withColumn("p", _prefix_len(F.col("n"), t_num, t_den))
    )
    sets = by_rarity.select("_id", "tokens", "n")
    a_prefix = by_rarity.select(
        F.col("_id").alias("id_a"),
        F.explode(F.slice("tokens", 1, F.col("p").cast("int"))).alias("token"),
    )
    index_b = toks_all.select(F.col("_id").alias("id_b"), "token")
    if size_verify:
        # candidate volume here is sum_token |a_prefix(token)| * |index(token)|
        # — the asymmetric analogue of the self-join's C(freq, 2)
        a_prefix = a_prefix.persist()
        index_b = index_b.persist()
        ha = a_prefix.groupBy("token").agg(F.count("*").alias("ca"))
        hb = index_b.groupBy("token").agg(F.count("*").alias("cb"))
        row = (
            ha.join(hb, "token")
            .agg(
                F.sum(
                    F.col("ca").cast("decimal(38,0)") * F.col("cb")
                ).alias("cand")
            )
            .collect()[0]
        )
        n_cand = int(row["cand"] or 0)
        spark = df.sparkSession
        default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        n = min(
            max(default, math.ceil(n_cand / _CAND_ROWS_PER_PARTITION)),
            _MAX_VERIFY_PARTITIONS,
        )
        if n > default:
            a_prefix = a_prefix.repartition(n, "token")
            index_b = index_b.repartition(n, "token")
    cand = (
        a_prefix.join(index_b, "token")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sets.select(
        F.col("_id").alias("id_a"), F.col("tokens").alias("_ta"), F.col("n").alias("n_a")
    )
    b = sets.select(F.col("_id").alias("id_b"), F.col("tokens").alias("_tb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("_ta", "_tb")))
        .filter(F.lit(t_den) * F.col("inter") >= F.lit(t_num) * F.col("n_a"))
        .select("id_a", "id_b", "inter", "n_a")
    )


def similarity_self_join(
    df: DataFrame,
    id_col: str,
    token_col: str,
    t_num: int,
    t_den: int,
    size_verify: bool = True,
    salt: int = 1,
    hot_token_threshold: int = 10_000,
) -> DataFrame:
    """All pairs ``id_a < id_b`` with Jaccard(tokens_a, tokens_b) >=
    t_num/t_den — exactly (prefix filter prunes, integer verify decides).
    Output: ``(id_a, id_b, inter, n_a, n_b)``.

    ``size_verify`` (default on) persists the prefix index, counts the
    exact candidate-pair volume from its token histogram, and sizes the
    verify-stage shuffle to it — the partition count a static
    ``spark.sql.shuffle.partitions`` cannot know. Costs one bounded
    aggregate job over the cached index; turn off for tiny ad-hoc runs.

    ``salt > 1`` additionally salts prefix tokens hotter than
    ``hot_token_threshold`` (VERDICT r4 item 8): rarity ordering keeps
    common tokens OUT of prefixes, but near-duplicate-heavy corpora can
    still concentrate one prefix token; salting spreads that token's
    C(f, 2) candidates over ``salt`` partitions (:mod:`.salting`),
    pair-identical to the unsalted join. Combining it with
    ``size_verify`` costs one extra exchange (the sized repartition is
    on ``token`` alone, the salted join re-shuffles on ``(token,
    _salt)``) — on corpora skewed enough to need salt, prefer salt and
    let AQE size the rest."""
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    toks = df.select(
        F.explode(F.array_distinct(F.col(token_col))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("freq"))
    sets, prefixes = _sets_and_prefixes(df, id_col, token_col, freq, t_num, t_den)
    if size_verify:
        prefixes = _size_verify_partitions(prefixes)

    # Cheap integer pre-filters before the array_intersect verify (both
    # sound because for any qualifying pair the row of its FIRST shared
    # token — which the prefix lemma puts inside both prefixes — passes):
    #   length:     jacc >= t  =>  t * max(n) <= min(n)
    #   positional: inter <= 1 + min(n_a - pa - 1, n_b - pb - 1) + ... =
    #     min(n_a - pa, n_b - pb) for 0-based prefix ranks pa/pb, since
    #     no shared token precedes the first one on either side (PPJoin,
    #     Xiao-Wang-Lin-Yu 2008). jacc >= t <=> inter*(t_num+t_den) >=
    #     t_num*(n_a+n_b), so prune when the bound can't reach it.
    ub = F.least(F.col("n_a") - F.col("_pa"), F.col("n_b") - F.col("_pb"))
    probe = prefixes.select(
        F.col("_id").alias("id_a"), F.col("tokens").alias("_ta"),
        F.col("n").alias("n_a"), F.col("ppos").alias("_pa"), "token",
    )
    build = prefixes.select(
        F.col("_id").alias("id_b"), F.col("tokens").alias("_tb"),
        F.col("n").alias("n_b"), F.col("ppos").alias("_pb"), "token",
    )
    if salt > 1:
        from .salting import hot_keys, salted_join

        if not size_verify:
            prefixes = prefixes.persist()  # histogram + two join sides
        hot = hot_keys(prefixes, "token", hot_token_threshold)
        joined = salted_join(
            probe, build, "token", F.col("id_a"), hot=hot, n_salt=salt
        )
    else:
        joined = probe.join(build, "token")
    verified = (
        joined
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.lit(t_den) * F.least("n_a", "n_b")
            >= F.lit(t_num) * F.greatest("n_a", "n_b")
        )
        .filter(
            ub * F.lit(t_num + t_den)
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b"))
        )
        .withColumn("inter", F.size(F.array_intersect("_ta", "_tb")))
        .filter(
            F.lit(t_den) * F.col("inter")
            >= F.lit(t_num) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
    )
    return verified.select("id_a", "id_b", "inter", "n_a", "n_b").distinct()
