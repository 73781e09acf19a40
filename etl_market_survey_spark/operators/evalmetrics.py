"""Offline model-evaluation metrics (beyond reference — the eval side
of a training-data pipeline).

All three classics as exact distributed aggregations:

- **AUC** via the Mann-Whitney rank statistic with tie-averaged ranks
  kept as 2x-scaled integers (the q150 Spearman trick): per distinct
  score, integer cumulative counts give the doubled average rank; the
  only float op is the final division. One aggregation on (group,
  score) + one tiny per-group window — never a per-pair comparison
  (the naive AUC is O(n_pos * n_neg)).
- **Brier / reliability bins**: exact decimal sums of (p - y)^2 and
  per-bin pooled fractions.
- **Confusion matrix @ threshold** with precision/recall/F1 as single
  double divisions of exact integer counts.

Each has a SQL mirror; q209-q211 hash-gate them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stats import dsum


def auc_mann_whitney(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str | Column,
    label_col: str | Column,
) -> DataFrame:
    """Per group: n, n_pos, and the exact rank-statistic AUC of
    ``score_col`` predicting binary ``label_col`` (ties averaged)."""
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    label = (F.col(label_col) if isinstance(label_col, str) else label_col).cast(
        "long"
    )
    sc = df.groupBy(*group_cols, score.alias("_s")).agg(
        F.sum(label).alias("_np_at"), F.count("*").alias("_n_at")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # doubled average rank of every row tied at this score:
    # 2*(rows strictly below) + (rows tied) + 1
    r2 = 2 * F.coalesce(F.sum("_n_at").over(w), F.lit(0)) + F.col("_n_at") + 1
    agg = (
        sc.withColumn("_r2", r2)
        .groupBy(*group_cols)
        .agg(
            F.sum("_n_at").alias("n"),
            F.sum("_np_at").alias("n_pos"),
            F.sum(F.col("_np_at") * F.col("_r2")).alias("_s2"),
        )
    )
    npos, n = F.col("n_pos"), F.col("n")
    den = (2 * npos * (n - npos)).cast("double")
    # single-class groups have no pair ordering to score: NULL, never a
    # fabricated number (ANSI division would otherwise throw)
    auc = F.when(
        den > 0, (F.col("_s2") - npos * (npos + 1)).cast("double") / den
    )
    return agg.select(
        *group_cols,
        n.cast("long").alias("n"),
        npos.cast("long").alias("n_pos"),
        auc.alias("auc"),
    )


def sql_auc_mann_whitney(
    table: str, group_expr: str, score_expr: str, label_expr: str
) -> str:
    """DuckDB mirror of :func:`auc_mann_whitney` — keep in lockstep."""
    return f"""
WITH sc AS (
  SELECT {group_expr} AS g, {score_expr} AS s,
         SUM(CAST({label_expr} AS BIGINT)) AS np_at, COUNT(*) AS n_at
  FROM {table} GROUP BY 1, 2
),
rk AS (
  SELECT g, s, np_at, n_at,
         2 * COALESCE(SUM(n_at) OVER (
           PARTITION BY g ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) + n_at + 1 AS r2
  FROM sc
),
agg AS (
  SELECT g, SUM(n_at) AS n, SUM(np_at) AS n_pos, SUM(np_at * r2) AS s2
  FROM rk GROUP BY 1
)
SELECT g, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CASE WHEN 2 * n_pos * (n - n_pos) > 0
            THEN (CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                  / CAST(2 * n_pos * (n - n_pos) AS DOUBLE))
       END AS auc
FROM agg
"""


def reliability_bins(
    df: DataFrame,
    prob_col: str | Column,
    label_col: str | Column,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration table: per probability bin, n, mean predicted p
    (exact decimal) and observed positive fraction — plus the pooled
    Brier score repeated per row is left to callers; see q210."""
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("long")
    b = F.least(F.floor(p * n_bins).cast("long"), F.lit(n_bins - 1))
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            (dsum(p) / F.count("*")).alias("mean_p"),
            (F.sum(y).cast("double") / F.count("*")).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def sql_reliability_bins(
    table: str, prob_expr: str, label_expr: str, n_bins: int = 10
) -> str:
    from ..functions.stats import sql_dsum

    return f"""
SELECT LEAST(CAST(FLOOR(({prob_expr}) * {n_bins}) AS BIGINT), {n_bins - 1}) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ({sql_dsum(prob_expr)} / COUNT(*)) AS mean_p,
       (CAST(SUM(CAST({label_expr} AS BIGINT)) AS DOUBLE) / COUNT(*)) AS frac_pos
FROM {table}
GROUP BY 1 ORDER BY 1
"""


def confusion_at_threshold(
    df: DataFrame,
    prob_col: str | Column,
    label_col: str | Column,
    threshold: float = 0.5,
) -> DataFrame:
    """One row: tp/fp/fn/tn + precision/recall/f1 (exact integer counts,
    single double divisions)."""
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    y = (F.col(label_col) if isinstance(label_col, str) else label_col).cast("long")
    pred = (p >= F.lit(threshold)).cast("long")
    agg = df.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * y).alias("fn"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    # empty prediction/label classes yield NULL (ANSI-safe), not 0/0
    prec = F.when((tp + fp) > 0, tp.cast("double") / (tp + fp).cast("double"))
    rec = F.when((tp + fn) > 0, tp.cast("double") / (tp + fn).cast("double"))
    return agg.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (2 * tp + fp + fn) > 0,
            (2 * tp).cast("double") / (2 * tp + fp + fn).cast("double"),
        ).alias("f1"),
    )


def sql_confusion_at_threshold(
    table: str, prob_expr: str, label_expr: str, threshold: float = 0.5
) -> str:
    pred = f"CAST(({prob_expr}) >= {threshold!r} AS BIGINT)"
    y = f"CAST({label_expr} AS BIGINT)"
    return f"""
WITH c AS (
  SELECT SUM({pred} * {y}) AS tp,
         SUM({pred} * (1 - {y})) AS fp,
         SUM((1 - {pred}) * {y}) AS fn,
         SUM((1 - {pred}) * (1 - {y})) AS tn
  FROM {table}
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0 THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
FROM c
"""


def bcubed(
    df: DataFrame,
    cluster_col: str,
    label_col: str,
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998) — the
    standard extrinsic score for dedup/entity clusters against gold
    labels: per-element precision |C(e) ∩ L(e)| / |C(e)| and recall
    |C(e) ∩ L(e)| / |L(e)|, averaged over elements. Computed from the
    cluster-label contingency table only (never per element):
    P = (1/N) * sum_cells n_cl^2 / n_c, R with n_l. One row out:
    ``(bcubed_precision, bcubed_recall, bcubed_f1, n)``.

    Exactness: integer contingency counts; each cell term is one double
    division rounded to 9, summed as exact decimals; single final
    divisions — the DuckDB oracle replays bit-for-bit (q242)."""
    cells = df.groupBy(
        F.col(cluster_col).alias("_c"), F.col(label_col).alias("_l")
    ).agg(F.count("*").alias("_ncl"))
    nc = cells.groupBy("_c").agg(F.sum("_ncl").alias("_nc"))
    nl = cells.groupBy("_l").agg(F.sum("_ncl").alias("_nl"))
    joined = cells.join(nc, "_c").join(nl, "_l")
    term_p = F.round(
        (F.col("_ncl") * F.col("_ncl")).cast("double") / F.col("_nc"), 9
    )
    term_r = F.round(
        (F.col("_ncl") * F.col("_ncl")).cast("double") / F.col("_nl"), 9
    )
    agg = joined.agg(
        dsum(term_p).alias("_sp"),
        dsum(term_r).alias("_sr"),
        F.sum("_ncl").cast("double").alias("_n"),
    )
    p = F.col("_sp") / F.col("_n")
    r = F.col("_sr") / F.col("_n")
    return agg.select(
        p.alias("bcubed_precision"),
        r.alias("bcubed_recall"),
        (F.lit(2.0) * (p * r) / (p + r)).alias("bcubed_f1"),
        F.col("_n").cast("long").alias("n"),
    )


def sql_bcubed(pairs_cte: str) -> str:
    """DuckDB mirror over a CTE exposing ``(c, l)`` per element — keep
    in lockstep. Emits ``bc_out``."""
    return f"""
bc_cells AS (
  SELECT c, l, COUNT(*) AS ncl FROM {pairs_cte} GROUP BY 1, 2
),
bc_nc AS (SELECT c, SUM(ncl) AS nc FROM bc_cells GROUP BY 1),
bc_nl AS (SELECT l, SUM(ncl) AS nl FROM bc_cells GROUP BY 1),
bc_terms AS (
  SELECT ce.ncl,
         ROUND(CAST(ce.ncl * ce.ncl AS DOUBLE) / nc.nc, 9) AS tp,
         ROUND(CAST(ce.ncl * ce.ncl AS DOUBLE) / nl.nl, 9) AS tr
  FROM bc_cells ce JOIN bc_nc nc ON ce.c = nc.c JOIN bc_nl nl ON ce.l = nl.l
),
bc_agg AS (
  SELECT
    CAST(SUM(CAST(FLOOR(tp * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sp,
    CAST(SUM(CAST(FLOOR(tr * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sr,
    CAST(SUM(ncl) AS DOUBLE) AS n
  FROM bc_terms
),
bc_out AS (
  SELECT sp / n AS bcubed_precision,
         sr / n AS bcubed_recall,
         2.0 * ((sp / n) * (sr / n)) / ((sp / n) + (sr / n)) AS bcubed_f1,
         CAST(n AS BIGINT) AS n
  FROM bc_agg
)"""


def bh_fdr(
    df: DataFrame,
    p_col: str,
    q: float = 0.05,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Benjamini-Hochberg (1995) step-up FDR correction over a RESULTS table
    (one row per hypothesis — bounded by contract, so the global
    ordering window is a deliberate small-frame window): adds
    ``bh_rank``, ``p_adj`` (monotone step-up, capped at 1, round-9) and
    ``reject`` at level ``q``. Ties order deterministically through
    ``tiebreak_cols``."""
    order = [F.col(p_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.orderBy(*order)
    wm = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wtail = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ranked = (
        df.withColumn("bh_rank", F.row_number().over(w))
        .withColumn("_m", F.count("*").over(wm))
        .withColumn(
            "_raw",
            F.col(p_col) * F.col("_m").cast("double") / F.col("bh_rank"),
        )
    )
    return (
        ranked.withColumn(
            "p_adj",
            F.round(F.least(F.lit(1.0), F.min("_raw").over(wtail)), 9),
        )
        .withColumn("reject", F.col("p_adj") <= F.lit(float(q)))
        .drop("_m", "_raw")
    )


def sql_bh_fdr(
    results_cte: str,
    p_expr: str,
    q: float,
    tiebreak_exprs: Sequence[str] = (),
) -> str:
    """DuckDB mirror of :func:`bh_fdr` — keep in lockstep. Emits
    ``bh_out`` = ``results_cte`` columns + (bh_rank, p_adj, reject)."""
    ob = ", ".join([p_expr, *tiebreak_exprs])
    return f"""
bh_r AS (
  SELECT *,
         row_number() OVER (ORDER BY {ob}) AS bh_rank,
         COUNT(*) OVER () AS _m
  FROM {results_cte}
),
bh_out AS (
  SELECT * EXCLUDE (_m, _raw),
         ROUND(LEAST(1.0, MIN(_raw) OVER (
           ORDER BY {ob}
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 9) AS p_adj,
         ROUND(LEAST(1.0, MIN(_raw) OVER (
           ORDER BY {ob}
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 9) <= {q!r}
           AS reject
  FROM (SELECT *, ({p_expr}) * CAST(_m AS DOUBLE) / bh_rank AS _raw FROM bh_r)
)"""


def simplified_silhouette(
    pts: DataFrame,
    id_col: str,
    cluster_col: str,
    vec_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Simplified silhouette (centroid form, squared-distance variant)
    per point — the O(n*k) clustering-quality score (vs the O(n^2)
    full silhouette): a(i) = d^2(x_i, centroid(own)), b(i) = min over
    other clusters of d^2(x_i, centroid_k), s(i) = (b-a)/max(a,b)
    (0 for singleton clusters, the classic convention; 0 when both
    distances vanish or no other cluster exists).

    Exactness: vectors are integer-scaled (``floor(x * scale)`` — floor
    of an identical double product, engine-identical with no tie
    semantics), centroids stay RATIONAL (sum vector s_k, count n_k; the
    mean is never materialized): d^2(x, s/n) = ||n*x - s||^2 / n^2 with
    an integer numerator summed in decimal (order-independent), one
    deterministic double division at the end. Output doubles rounded to
    6 (the q24 final-guard convention).

    Scale shape: one posexplode + (cluster, pos) groupBy for the sum
    vectors (map-side combined), the centroid table is k rows and
    broadcast, one map stage scores every point against all k — no
    point-to-point pairs anywhere.
    """
    xi = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    p = pts.select(
        F.col(id_col).alias("_id"),
        F.col(cluster_col).alias("_own"),
        xi.alias("_xi"),
    )
    sums = (
        p.select("_own", F.posexplode("_xi").alias("_pos", "_v"))
        .groupBy("_own", "_pos")
        .agg(F.sum("_v").alias("_s"))
        .groupBy("_own")
        .agg(
            F.count("*").alias("_dim"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
                lambda z: z["_s"],
            ).alias("_sv"),
        )
        .drop("_dim")
    )
    counts = p.groupBy("_own").agg(F.count("*").alias("_n"))
    clusters = sums.join(counts, "_own").select(
        F.col("_own").alias("_cl"), "_n", "_sv"
    )
    diff = F.zip_with(
        F.col("_xi"), F.col("_sv"), lambda x, s: F.col("_n") * x - s
    )
    num = F.aggregate(
        diff,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, v: acc + (v.cast("decimal(19,0)") * v.cast("decimal(19,0)")).cast(
            "decimal(38,0)"
        ),
    )
    scored = (
        p.crossJoin(F.broadcast(clusters))  # k rows by contract
        .withColumn(
            "_val",
            num.cast("double") / (F.col("_n") * F.col("_n")).cast("double"),
        )
    )
    sil = scored.groupBy("_id", "_own").agg(
        F.max(F.when(F.col("_cl") == F.col("_own"), F.col("_val"))).alias("a"),
        F.min(F.when(F.col("_cl") != F.col("_own"), F.col("_val"))).alias("b"),
        F.max(F.when(F.col("_cl") == F.col("_own"), F.col("_n"))).alias("_n_own"),
    )
    s = (
        F.when(F.col("_n_own") == 1, F.lit(0.0))
        .when(F.col("b").isNull(), F.lit(0.0))
        .when(F.greatest("a", "b") == 0.0, F.lit(0.0))
        .otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
    )
    return sil.select(
        F.col("_id").alias(id_col),
        F.col("_own").alias(cluster_col),
        F.round("a", 6).alias("a_sq"),
        F.round("b", 6).alias("b_sq"),
        F.round(s, 6).alias("silhouette"),
    )


def ndcg_mrr_at_k(
    runs: DataFrame,
    gold: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """NDCG@k and MRR@k per query — the retrieval-eval pair missing
    between AUC (classification) and RRF (fusion).

    ``runs``: (query, doc, rank 1..k); ``gold``: (query, doc,
    integer graded relevance >= 0; absent pairs = 0).

    Exactness: DCG is evaluated as a FIXED left-to-right expression
    tree over rank-pivoted gain columns — ``g1/log2(2) + g2/log2(3) +
    ...`` with literal double denominators — not a SUM aggregate, so
    the float addition order is pinned and identical on any engine
    (SUM over grouped doubles is partition-order-dependent; this
    matters because q273 hash-compares the values). IDCG uses the same
    tree over desc-sorted gains (ties broken by doc id). Gain =
    2^rel - 1 (the burges formulation), integer until the division.
    MRR = 1/min rank with rel > 0 (0 when none). NDCG = 0 for queries
    with no relevant documents.

    Scale shape: one join runs⋈gold on (query, doc), one groupBy query
    with k pivot cells each — state per query is 2k cells.
    """
    import math

    if k < 1 or k > 64:
        raise ValueError("k must be in [1, 64]")
    joined = (
        runs.select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            F.col(rank_col).alias("_rk"),
        )
        .filter(F.col("_rk") <= k)
        .join(
            gold.select(
                F.col(query_col).alias("_q"),
                F.col(doc_col).alias("_d"),
                F.col(rel_col).alias("_rel"),
            ),
            ["_q", "_d"],
            "left",
        )
        .withColumn("_g", F.expr("shiftleft(1L, coalesce(_rel, 0)) - 1L"))
    )
    # ideal rank: gains desc, doc id asc for ties
    iw = Window.partitionBy("_q").orderBy(F.col("_g").desc(), F.col("_d"))
    joined = joined.withColumn("_irk", F.row_number().over(iw))
    aggs = [
        F.max(F.when(F.col("_rk") == i, F.col("_g"))).alias(f"g{i}")
        for i in range(1, k + 1)
    ] + [
        F.max(F.when(F.col("_irk") == i, F.col("_g"))).alias(f"ig{i}")
        for i in range(1, k + 1)
    ] + [
        F.min(F.when(F.col("_g") > 0, F.col("_rk"))).alias("_first_rel")
    ]
    cells = joined.groupBy("_q").agg(*aggs)

    def tree(prefix: str):
        expr = None
        for i in range(1, k + 1):
            term = F.coalesce(F.col(f"{prefix}{i}"), F.lit(0)).cast(
                "double"
            ) / F.lit(math.log2(i + 1))
            expr = term if expr is None else expr + term
        return expr

    dcg = tree("g")
    idcg = tree("ig")
    out = cells.select(
        F.col("_q").alias(query_col),
        F.round(dcg, 9).alias("dcg"),
        F.round(
            F.when(idcg > 0.0, dcg / idcg).otherwise(F.lit(0.0)), 9
        ).alias("ndcg"),
        F.round(
            F.when(
                F.col("_first_rel").isNotNull(),
                F.lit(1.0) / F.col("_first_rel").cast("double"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("mrr"),
    )
    return out


def cuped_adjusted_means(
    df: DataFrame,
    variant_col: str,
    metric_col: str,
    covariate_col: str,
    scale: int = 1,
) -> DataFrame:
    """CUPED (Deng et al., WSDM 2013) — the experimentation-platform
    staple: reduce metric variance with a pre-experiment covariate,
    ``y_adj = y - theta (x - mean(x))`` with ``theta = cov(x,y)/var(x)``
    estimated on the POOLED sample. Per variant: n, mean(y),
    mean(y_adj), plus the global theta and the variance-reduction
    factor ``1 - corr(x,y)^2``.

    Exactness: metric/covariate are integers (caller pre-scales by
    ``scale``); every moment is an exact decimal integer sum, and the
    handful of final divisions follow one pinned expression order —
    the q84 deterministic-covariance kernel extended to the CUPED
    readout. One groupBy for moments, one tiny broadcast join.
    """
    x = F.col(covariate_col).cast("decimal(38,0)")
    y = F.col(metric_col).cast("decimal(38,0)")
    g = df.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    cov_num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_num = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_num = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    gl = g.select(
        (cov_num / varx_num).alias("theta"),
        (F.lit(1.0) - (cov_num * cov_num) / (varx_num * vary_num)).alias(
            "var_reduction_factor"
        ),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("mean_x"),
    )
    per = df.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count("*").alias("n_units"),
        F.sum(y).alias("vsy"),
        F.sum(x).alias("vsx"),
    )
    out = per.crossJoin(F.broadcast(gl)).select(
        "variant",
        F.col("n_units").cast("long").alias("n_units"),
        F.round(
            F.col("vsy").cast("double") / F.col("n_units").cast("double") / F.lit(float(scale)),
            9,
        ).alias("mean_y"),
        F.round(
            (
                F.col("vsy").cast("double") / F.col("n_units").cast("double")
                - F.col("theta")
                * (
                    F.col("vsx").cast("double") / F.col("n_units").cast("double")
                    - F.col("mean_x")
                )
            )
            / F.lit(float(scale)),
            9,
        ).alias("mean_y_adj"),
        F.round("theta", 9).alias("theta"),
        F.round("var_reduction_factor", 9).alias("var_reduction_factor"),
    )
    return out
