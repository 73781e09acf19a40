"""Histogram binning (SURVEY A6/A7; reference clean_beta_scan.py:60-75,
330-350 and time_resolution_beta_scan.py:177-183).

Faithful numpy ``bins='auto'`` policy: nbins = max(Sturges, Freedman-
Diaconis), computed from one aggregate pass (count/min/max/IQR). Bin
assignment is ``floor((x - min)/width)`` with the last edge right-
inclusive, exactly like ``np.histogram``.

Two Spark passes, both trivial at scale: (1) a scalar stats aggregate,
(2) a groupBy on the bin index (map-side combinable). The one-row stats
frame rides along as a broadcast cross join — never collected when used
inside a larger plan; ``auto_bin_params`` offers the collected variant for
driver-side consumers (plot sinks).

Exact percentiles for IQR: Spark ``percentile`` and DuckDB/numpy
``quantile_cont`` all use the same linear interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantile_of_sorted(arr, n, q: float):
    """Linear-interpolation quantile from a sorted array column — the
    numpy/duckdb 'linear' formula, written out explicitly so the Spark
    side and the SQL oracle share the exact float expression (engine
    quantile built-ins differ in their interpolation arithmetic)."""
    pos = (n.cast("double") - F.lit(1.0)) * F.lit(q)
    lo = F.floor(pos).cast("int") + F.lit(1)  # 1-based
    hi = F.least(lo + F.lit(1), n.cast("int"))
    frac = pos - F.floor(pos)
    a_lo = F.element_at(arr, lo)
    return a_lo + frac * (F.element_at(arr, hi) - a_lo)


def _stats(df: DataFrame, col: str) -> DataFrame:
    c = F.col(col)
    # Single aggregate: one sorted value array yields count/min/max and
    # both quartiles (Spark's exact `percentile` is ~6x slower than one
    # array_sort at these sizes). Array is materialized as a column
    # before element access (see stats.mad_of_sorted warning).
    base = df.agg(F.array_sort(F.collect_list(c)).alias("_a"))
    n = F.size("_a")
    return base.select(
        n.cast("long").alias("_n"),
        F.element_at("_a", 1).alias("_min"),
        F.element_at("_a", n).alias("_max"),
        _quantile_of_sorted(F.col("_a"), n, 0.25).alias("_q25"),
        _quantile_of_sorted(F.col("_a"), n, 0.75).alias("_q75"),
    )


def _nbins_expr():
    """numpy 'auto': max of Sturges and Freedman-Diaconis bin counts."""
    n = F.col("_n").cast("double")
    span = F.col("_max") - F.col("_min")
    sturges = F.ceil(F.log2(n)) + F.lit(1)
    fd_h = F.lit(2.0) * (F.col("_q75") - F.col("_q25")) / F.pow(n, F.lit(1.0 / 3.0))
    fd = F.when(fd_h > 0, F.ceil(span / fd_h)).otherwise(F.lit(1))
    return F.greatest(sturges, fd).cast("int")


def histogram(
    df: DataFrame, col: str, nbins: int | None = None, stats_impl: str = "sorted"
) -> DataFrame:
    """1D histogram: ``(bin int, lo double, hi double, count long)``.

    ``nbins=None`` -> numpy-'auto' policy. Empty input -> empty result.
    ``stats_impl='sorted'`` computes the auto-policy quartiles via one
    sorted array (fastest to ~1e8 rows); ``'distributed'`` uses the
    recursive bucket-selection path (``_stats_distributed``) — same bits,
    no single-reducer sort, the default choice beyond ~1e8 rows.
    """
    c = F.col(col)
    stats_fn = _stats if stats_impl == "sorted" else _stats_distributed
    stats = stats_fn(df.filter(c.isNotNull() & ~F.isnan(c)), col)
    if nbins is None:
        stats = stats.withColumn("_nbins", _nbins_expr())
    else:
        stats = stats.withColumn("_nbins", F.lit(int(nbins)))
    stats = stats.filter(F.col("_n") > 0)
    width = (F.col("_max") - F.col("_min")) / F.col("_nbins").cast("double")
    binned = (
        df.filter(c.isNotNull() & ~F.isnan(c))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "bin",
            F.least(
                F.floor((c - F.col("_min")) / width).cast("int"),
                F.col("_nbins") - F.lit(1),  # right-inclusive last bin
            ),
        )
    )
    return (
        binned.groupBy("bin", "_min", "_nbins", "_max")
        .agg(F.count("*").alias("count"))
        .select(
            "bin",
            (F.col("_min") + F.col("bin") * (F.col("_max") - F.col("_min")) / F.col("_nbins")).alias("lo"),
            (F.col("_min") + (F.col("bin") + 1) * (F.col("_max") - F.col("_min")) / F.col("_nbins")).alias("hi"),
            "count",
        )
    )


def _sql_quantile_of_sorted(arr: str, n: str, q: float) -> str:
    """DuckDB mirror of ``_quantile_of_sorted`` — keep in lockstep."""
    pos = f"((CAST({n} AS DOUBLE) - 1.0) * {q})"
    lo = f"(CAST(FLOOR({pos}) AS INT) + 1)"
    hi = f"LEAST({lo} + 1, CAST({n} AS INT))"
    frac = f"({pos} - FLOOR({pos}))"
    return f"({arr}[{lo}] + {frac} * ({arr}[{hi}] - {arr}[{lo}]))"


def sql_histogram_auto(table: str, col: str) -> str:
    """DuckDB oracle text for ``histogram(df, col)`` with the auto policy."""
    q25 = _sql_quantile_of_sorted("a", "n", 0.25)
    q75 = _sql_quantile_of_sorted("a", "n", 0.75)
    return f"""
WITH arr AS (
  SELECT list_sort(list({col})) AS a, COUNT({col}) AS n
  FROM {table} WHERE {col} IS NOT NULL
), st AS (
  SELECT n, a[1] AS mn, a[CAST(n AS INT)] AS mx,
         {q75} AS q75, {q25} AS q25
  FROM arr
), nb AS (
  SELECT *,
    CAST(GREATEST(
      CEIL(LOG2(CAST(n AS DOUBLE))) + 1,
      CASE WHEN (2.0 * (q75 - q25) / POW(CAST(n AS DOUBLE), 1.0/3.0)) > 0
           THEN CEIL((mx - mn) / (2.0 * (q75 - q25) / POW(CAST(n AS DOUBLE), 1.0/3.0)))
           ELSE 1 END) AS INT) AS nbins
  FROM st WHERE n > 0
)
SELECT
  CAST(LEAST(CAST(FLOOR(({col} - nb.mn) / ((nb.mx - nb.mn) / CAST(nb.nbins AS DOUBLE))) AS INT), nb.nbins - 1) AS INT) AS bin,
  nb.mn + CAST(LEAST(CAST(FLOOR(({col} - nb.mn) / ((nb.mx - nb.mn) / CAST(nb.nbins AS DOUBLE))) AS INT), nb.nbins - 1) AS INT) * (nb.mx - nb.mn) / nb.nbins AS lo,
  nb.mn + (CAST(LEAST(CAST(FLOOR(({col} - nb.mn) / ((nb.mx - nb.mn) / CAST(nb.nbins AS DOUBLE))) AS INT), nb.nbins - 1) AS INT) + 1) * (nb.mx - nb.mn) / nb.nbins AS hi,
  COUNT(*) AS count
FROM {table}, nb
WHERE {col} IS NOT NULL
GROUP BY 1, 2, 3, nb.mn, nb.mx, nb.nbins
ORDER BY 1
"""


def histogram2d(
    df: DataFrame,
    xcol: str,
    ycol: str,
    nx: int,
    ny: int,
) -> DataFrame:
    """2D histogram (A7): fixed nx x ny grid over the data range.

    Output: ``(bx int, by int, count long)`` — the waveform (Time,
    Amplitude) density map of clean_beta_scan.py:330-350.
    """
    x, y = F.col(xcol), F.col(ycol)
    valid = df.filter(x.isNotNull() & y.isNotNull() & ~F.isnan(x) & ~F.isnan(y))
    stats = valid.agg(
        F.min(x).alias("_xmin"), F.max(x).alias("_xmax"),
        F.min(y).alias("_ymin"), F.max(y).alias("_ymax"),
    )
    wx = (F.col("_xmax") - F.col("_xmin")) / F.lit(float(nx))
    wy = (F.col("_ymax") - F.col("_ymin")) / F.lit(float(ny))
    return (
        valid.crossJoin(F.broadcast(stats))
        .withColumn("bx", F.least(F.floor((x - F.col("_xmin")) / wx).cast("int"), F.lit(nx - 1)))
        .withColumn("by", F.least(F.floor((y - F.col("_ymin")) / wy).cast("int"), F.lit(ny - 1)))
        .groupBy("bx", "by")
        .agg(F.count("*").alias("count"))
    )


# ---------------------------------------------------------------------------
# Distributed exact quantiles (the >1e8-row path; see ROADMAP #2)
# ---------------------------------------------------------------------------


def _bucket_expr(x, lo, hi, n_buckets: int):
    """Bucket index of x over [lo, hi] — monotone in x (floor of a
    monotone float map), last edge clipped into the top bucket, width-0
    ranges collapse to bucket 0."""
    w = (hi - lo) / F.lit(float(n_buckets))
    raw = F.floor((x.cast("double") - lo) / w).cast("int")
    return F.when(
        hi > lo,
        F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)),
    ).otherwise(F.lit(0))


def _stats_distributed(
    df: DataFrame, col: str, n_buckets: int = 1024, levels: int = 2
) -> DataFrame:
    """Drop-in for ``_stats`` with no single-reducer sort: distributed
    exact order-statistic selection by recursive bucket counting.

    Pass 1 — scalar agg (count/min/max). Pass 2 — bucket counts over a
    uniform grid on [min, max]; a cumulative sum over the <= ``n_buckets``
    count rows (tiny single-partition window) locates, for each needed
    rank (lo/hi neighbours of q25 and q75), the bucket holding it and the
    rank's offset within that bucket. Each further level re-buckets only
    the candidate rows (expected n/n_buckets per rank, exact even under
    duplicate pileups since equal values share a bucket). The final
    within-bucket selection sorts ~n/n_buckets^(levels-1) values per rank.

    Exactness: bucket routing only partitions the order — selection is by
    exact counted rank, and the final interpolation is the same float
    expression as ``_quantile_of_sorted``, so results are bit-identical
    to the sorted-array path (asserted in tests/test_text_histogram.py).

    At 100 TB: every full-data pass is a scan + map-side-combinable
    groupBy on <= n_buckets keys; nothing large ever sits on one node.
    """
    c = F.col(col)
    vals = df.select(c.alias("_x"))
    s = vals.agg(
        F.count("_x").cast("long").alias("_n"),
        F.min("_x").alias("_min"),
        F.max("_x").alias("_max"),
    )

    def lo_rank(q: float):
        pos = (F.col("_n").cast("double") - F.lit(1.0)) * F.lit(q)
        return F.floor(pos).cast("long") + F.lit(1).cast("long")

    def hi_rank(q: float):
        return F.least(lo_rank(q) + F.lit(1).cast("long"), F.col("_n"))

    ranks = s.select(
        F.explode(
            F.array(
                F.struct(F.lit("q25_lo").alias("rank_id"), lo_rank(0.25).alias("rank")),
                F.struct(F.lit("q25_hi").alias("rank_id"), hi_rank(0.25).alias("rank")),
                F.struct(F.lit("q75_lo").alias("rank_id"), lo_rank(0.75).alias("rank")),
                F.struct(F.lit("q75_hi").alias("rank_id"), hi_rank(0.75).alias("rank")),
            )
        ).alias("_r"),
        F.col("_min").cast("double").alias("lo_edge"),
        F.col("_max").cast("double").alias("hi_edge"),
    ).select("_r.rank_id", F.col("_r.rank").alias("offset"), "lo_edge", "hi_edge")

    from pyspark.sql.window import Window

    # Level 0: one shared bucket-count pass over the global range.
    counts0 = (
        vals.crossJoin(F.broadcast(s))
        .select(
            _bucket_expr(
                F.col("_x"), F.col("_min").cast("double"), F.col("_max").cast("double"), n_buckets
            ).alias("_b")
        )
        .groupBy("_b")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_cum",
            F.sum("_cnt").over(
                Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    hit = (F.col("offset") > F.col("_cum") - F.col("_cnt")) & (
        F.col("offset") <= F.col("_cum")
    )
    width0 = (F.col("hi_edge") - F.col("lo_edge")) / F.lit(float(n_buckets))
    state = (
        F.broadcast(ranks)
        .join(counts0, hit)
        .select(
            "rank_id",
            (F.col("offset") - (F.col("_cum") - F.col("_cnt"))).alias("_offset"),
            F.col("_b").alias("_tb"),
            (F.col("lo_edge") + F.col("_b") * width0).alias("_new_lo"),
            (F.col("lo_edge") + (F.col("_b") + 1) * width0).alias("_new_hi"),
        )
    )
    cand = (
        vals.crossJoin(F.broadcast(s))
        .withColumn(
            "_b",
            _bucket_expr(
                F.col("_x"), F.col("_min").cast("double"), F.col("_max").cast("double"), n_buckets
            ),
        )
        .join(F.broadcast(state), on=F.col("_b") == F.col("_tb"))
        .select(
            "_x",
            "rank_id",
            F.col("_offset").alias("offset"),
            F.col("_new_lo").alias("lo_edge"),
            F.col("_new_hi").alias("hi_edge"),
        )
    )

    # Levels 1..: per-rank refinement on the (shrinking) candidate sets.
    for _ in range(1, levels):
        counts = (
            cand.withColumn(
                "_b", _bucket_expr(F.col("_x"), F.col("lo_edge"), F.col("hi_edge"), n_buckets)
            )
            .groupBy("rank_id", "offset", "lo_edge", "hi_edge", "_b")
            .agg(F.count("*").alias("_cnt"))
            .withColumn(
                "_cum",
                F.sum("_cnt").over(
                    Window.partitionBy("rank_id").orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                ),
            )
        )
        width = (F.col("hi_edge") - F.col("lo_edge")) / F.lit(float(n_buckets))
        state = counts.filter(hit).select(
            F.col("rank_id").alias("_rid"),
            F.col("_b").alias("_tb"),
            (F.col("offset") - (F.col("_cum") - F.col("_cnt"))).alias("_offset"),
            (F.col("lo_edge") + F.col("_b") * width).alias("_new_lo"),
            (F.col("lo_edge") + (F.col("_b") + 1) * width).alias("_new_hi"),
        )
        cand = (
            cand.withColumn(
                "_b", _bucket_expr(F.col("_x"), F.col("lo_edge"), F.col("hi_edge"), n_buckets)
            )
            .join(
                F.broadcast(state),
                on=(F.col("rank_id") == F.col("_rid")) & (F.col("_b") == F.col("_tb")),
            )
            .select(
                "_x",
                "rank_id",
                F.col("_offset").alias("offset"),
                F.col("_new_lo").alias("lo_edge"),
                F.col("_new_hi").alias("hi_edge"),
            )
        )

    picked = (
        cand.groupBy("rank_id", "offset")
        .agg(F.array_sort(F.collect_list("_x")).alias("_a"))
        .select(
            "rank_id", F.element_at("_a", F.col("offset").cast("int")).alias("_v")
        )
    )
    wide = picked.groupBy().pivot(
        "rank_id", ["q25_lo", "q25_hi", "q75_lo", "q75_hi"]
    ).agg(F.first("_v"))

    def interp(lo_name: str, hi_name: str, q: float):
        pos = (F.col("_n").cast("double") - F.lit(1.0)) * F.lit(q)
        frac = pos - F.floor(pos)
        return F.col(lo_name) + frac * (F.col(hi_name) - F.col(lo_name))

    return s.join(wide).select(
        "_n",
        "_min",
        "_max",
        interp("q25_lo", "q25_hi", 0.25).alias("_q25"),
        interp("q75_lo", "q75_hi", 0.75).alias("_q75"),
    )
