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


def histogram(df: DataFrame, col: str, nbins: int | None = None) -> DataFrame:
    """1D histogram: ``(bin int, lo double, hi double, count long)``.

    ``nbins=None`` -> numpy-'auto' policy. Empty input -> empty result.
    """
    c = F.col(col)
    stats = _stats(df.filter(c.isNotNull() & ~F.isnan(c)), col)
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
