"""Multi-statistic aggregation kernel.

Re-expresses the reference's ``mean_std`` multi-stat group aggregation
(reference: utils.py:118-146 — per group, per value column: mean, std,
median, MAD_std = 1.4826 x median absolute deviation) and its scalar
variants (reference: measurements.py:180-185) as pure Spark built-in
expressions — no Python UDFs anywhere in this module.

Cross-engine determinism
------------------------
Floating-point SUM/AVG over shuffled partitions is order-dependent, so a
Spark double sum and a DuckDB double sum of the same 60k values can differ
in the last bits. Where results must hash-match a DuckDB oracle we make the
sum EXACT and order-free: scale by 1e6, ``floor`` (both engines floor the
identical double identically), sum as exact decimal integers, then divide
back in double. The truncation at 1e-6 is a *defined* semantic of these
deterministic aggregates (error bound: n * 1e-6), the payoff is a
bit-identical scalar on any engine and any partitioning.
``dsum``/``davg``/``dstd`` implement that; the matching SQL text for the
oracle side is produced by ``sql_dsum``/``sql_davg``/``sql_dstd`` so the two
sides cannot drift apart. (A plain decimal CAST is not enough: Spark
rounds HALF_UP, DuckDB half-even, and computed doubles do land on ties.)

MAD needs an exact median of ``abs(x - median(x))``: a two-phase aggregate
(median per group, broadcast-join back, median of absolute deviations).
Spark's ``median`` is the exact interpolating percentile, same as DuckDB's
``median``/``quantile_cont(0.5)``.

Scale note: the two-phase MAD is two shuffles on the *group keys* — at
100 TB the second pass runs over an already-aggregated frame joined back to
the fact via broadcast (group-key cardinality is small in every use), so
the extra cost is one broadcast, not a second full shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MAD -> sigma for normal data (reference: utils.py:7)
K_MAD_TO_STD = 1.4826

_SCALE = 1_000_000.0  # 1e-6 truncation grid for deterministic sums


# ---------------------------------------------------------------------------
# deterministic aggregate builders (Spark side)
# ---------------------------------------------------------------------------

def dsum(c: str | Column) -> Column:
    """Order-independent SUM of a double column.

    floor(x * 1e6) is the same double on every engine; summing those as
    exact decimal integers removes float-order dependence entirely.

    DOMAIN: magnitudes well above the 1e-6 truncation grid. Values at or
    below ~1e-6 (e.g. picosecond physics quantities) truncate to zero —
    rescale to natural units first, or use plain ``F.sum``/``F.stddev``
    when cross-engine bit-exactness is not required.

    UPPER BOUND: |x| must stay below ~9.2e12 — Spark's ``floor(double)``
    returns LONG, so ``x * 1e6`` beyond int64 saturates (silently in
    non-ANSI mode) while DuckDB floors in double; the engines then
    diverge. Squared-residual sums are the classic trap: rescale to
    units where the square fits (q302 evaluates in dollars, not cents).
    """
    col = F.col(c) if isinstance(c, str) else c
    scaled = F.floor(col * F.lit(_SCALE)).cast("decimal(38,0)")
    return (F.sum(scaled).cast("double") / F.lit(_SCALE))


def davg(c: str | Column) -> Column:
    """Order-independent AVG: exact scaled sum / count, divided in double."""
    col = F.col(c) if isinstance(c, str) else c
    return dsum(col) / F.count(col)


def dstd(c: str | Column) -> Column:
    """Order-independent sample stddev via exact scaled sum & sum-of-squares.

    sqrt(max(0, (ssq - s^2/n) / (n-1))) computed in double from exact
    scalars; identical expression emitted for the oracle by ``sql_dstd``.
    """
    col = F.col(c) if isinstance(c, str) else c
    n = F.count(col).cast("double")
    s = dsum(col)
    ssq = dsum(col * col)
    var = F.greatest(F.lit(0.0), (ssq - s * s / n) / (n - F.lit(1.0)))
    return F.when(n > 1, F.sqrt(var)).otherwise(F.lit(None).cast("double"))


# ---------------------------------------------------------------------------
# matching SQL text (DuckDB-oracle side) — keep in lockstep with the above
# ---------------------------------------------------------------------------

def sql_dsum(expr: str) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)"
        f" / 1000000.0)"
    )


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def sql_dstd(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s = sql_dsum(expr)
    ssq = sql_dsum(f"({expr}) * ({expr})")
    var = f"GREATEST(0.0, ({ssq} - {s} * {s} / {n}) / ({n} - 1.0))"
    return f"(CASE WHEN {n} > 1 THEN SQRT({var}) ELSE NULL END)"


# ---------------------------------------------------------------------------
# grouped median / MAD (two-phase, built-ins only)
# ---------------------------------------------------------------------------

def group_median(df: DataFrame, keys: Sequence[str], col: str, out: str) -> DataFrame:
    """Per-group exact median (keys may be empty -> global scalar frame)."""
    return df.groupBy(*keys).agg(F.median(F.col(col)).alias(out))


def median_of_sorted(arr: Column) -> Column:
    """Exact interpolating median of an ``array_sort``-ed array column.

    Same semantics as Spark ``median`` / DuckDB ``quantile_cont(0.5)``:
    average of the two middle elements for even counts.
    """
    n = F.size(arr)
    lo = F.floor((n + 1) / 2).cast("int")  # 1-based middles (equal when odd)
    hi = (F.floor(n / 2) + 1).cast("int")
    return F.when(
        n > 0, (F.element_at(arr, lo) + F.element_at(arr, hi)) / 2.0
    )


def mad_of_sorted(arr: Column, scaled: bool = True, med: Column | None = None) -> Column:
    """Exact MAD from a sorted array column — median of |x - median|,
    computed as array expressions (no second shuffle).

    IMPORTANT: pass a *materialized column reference* (not a bare
    aggregate expression) as ``arr`` — the inner ``transform`` lambda
    evaluates its captured expressions per element, so an inlined
    ``array_sort(collect_list(...))`` would re-sort per element (O(n^2)).
    Passing ``med`` precomputed avoids even the per-element element_at.
    """
    if med is None:
        med = median_of_sorted(arr)
    devs = F.array_sort(F.transform(arr, lambda v: F.abs(v - med)))
    mad = median_of_sorted(devs)
    return mad * F.lit(K_MAD_TO_STD) if scaled else mad


def group_mad(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    out: str,
    scaled: bool = True,
    strategy: str = "array",
) -> DataFrame:
    """Per-group median absolute deviation (x K_MAD_TO_STD if ``scaled``).
    Matches DuckDB ``mad(x)`` (x 1.4826 when scaled) exactly.

    strategy='array' (default): ONE shuffle — ``array_sort(collect_list)``
    per group, median and MAD as array expressions. The group's values
    materialize in executor memory (8 bytes/row), fine up to tens of
    millions of rows per group; far past that, use 'twophase'.

    strategy='twophase': median agg -> broadcast join back -> deviation
    median agg. Two shuffles but never materializes a group.
    """
    keys = list(keys)
    if strategy == "array":
        arr = F.array_sort(
            F.collect_list(F.when(~F.isnan(F.col(col)), F.col(col)))
        )
        # Materialize every intermediate array/scalar as a column: a column
        # reference is evaluated once per row, while an inlined expression
        # re-evaluates per use (the final projection reads the deviation
        # array 4x — size twice + element_at twice).
        g = (
            df.groupBy(*keys)
            .agg(arr.alias("_sorted"))
            .withColumn("_med", median_of_sorted(F.col("_sorted")))
            .withColumn(
                "_devs",
                F.array_sort(
                    F.transform(F.col("_sorted"), lambda v: F.abs(v - F.col("_med")))
                ),
            )
        )
        mad = median_of_sorted(F.col("_devs"))
        if scaled:
            mad = mad * F.lit(K_MAD_TO_STD)
        return g.select(*keys, mad.alias(out))
    med = group_median(df, keys, col, "_med")
    if keys:
        dev = df.join(F.broadcast(med), keys)
    else:
        dev = df.crossJoin(F.broadcast(med))
    dev = dev.withColumn("_absdev", F.abs(F.col(col) - F.col("_med")))
    mad = F.median(F.col("_absdev"))
    if scaled:
        mad = mad * F.lit(K_MAD_TO_STD)
    return dev.groupBy(*keys).agg(mad.alias(out))


def mean_std(
    df: DataFrame,
    by: Sequence[str],
    cols: Sequence[str] | None = None,
    deterministic: bool = True,
) -> DataFrame:
    """The reference's flagship multi-stat aggregation (utils.py:118-146).

    Groups by ``by`` and, for every value column, emits
    ``"{col} {stat}"`` for stat in (mean, std, median, MAD_std).
    ``deterministic=True`` routes mean/std through exact decimal sums so a
    DuckDB oracle hash-matches; ``False`` uses plain avg/stddev (faster,
    float-order-dependent in the last bits).
    """
    by = list(by)
    if cols is None:
        cols = [c for c, t in df.dtypes if c not in by and t in ("double", "float")]
    # Single shuffle: deterministic moment aggregates + one sorted value
    # array per column; median and MAD are post-agg array expressions.
    aggs: list[Column] = []
    for c in cols:
        mean_expr = davg(c) if deterministic else F.avg(F.col(c))
        std_expr = dstd(c) if deterministic else F.stddev(F.col(c))
        aggs += [
            mean_expr.alias(f"{c} mean"),
            std_expr.alias(f"{c} std"),
            F.array_sort(
                F.collect_list(F.when(~F.isnan(F.col(c)), F.col(c)))
            ).alias(f"_sorted_{c}"),
        ]
    base = df.groupBy(*by).agg(*aggs)
    # Materialize medians, then deviation arrays, as columns — column refs
    # evaluate once; inlined array expressions re-evaluate per use.
    def _devs_expr(col_name: str):
        # real closure: transform() treats a 2-arity lambda as (elem, idx),
        # so a `lambda v, c=c:` default-arg binding would receive the index
        med_col = F.col(f"{col_name} median")
        return F.array_sort(
            F.transform(F.col(f"_sorted_{col_name}"), lambda v: F.abs(v - med_col))
        )

    base = base.withColumns(
        {f"{c} median": median_of_sorted(F.col(f"_sorted_{c}")) for c in cols}
    ).withColumns({f"_devs_{c}": _devs_expr(c) for c in cols})
    proj = list(by)
    for c in cols:
        proj += [
            F.col(f"{c} mean"),
            F.col(f"{c} std"),
            F.col(f"{c} median"),
            (median_of_sorted(F.col(f"_devs_{c}")) * F.lit(K_MAD_TO_STD)).alias(
                f"{c} MAD_std"
            ),
        ]
    return base.select(*proj)


# ---------------------------------------------------------------------------
# ECDF (reference: clean_beta_scan.py:212-220 — statsmodels ECDF per device)
# ---------------------------------------------------------------------------

def ecdf(df: DataFrame, partition: Sequence[str], col: str, out: str = "ecdf") -> DataFrame:
    """Empirical CDF per partition: ``(# rows with value <= v) / n``.

    Scale-safe formulation (not ``cume_dist`` over a window partitioned
    by the group key): a bounded-cardinality partition key — q08's
    3-value ``event_type`` — would make each window partition a
    single-task sort of n/k rows. Instead the cumulative count is
    computed on the DISTINCT-value table (one map-side-combined groupBy,
    then operators/globalindex.grouped_sort_index's cum_cols running sum
    over that much smaller relation) and joined back on (group, value) —
    a high-cardinality, parallel shuffle. Values are identical bit for
    bit: cume_dist(v) = (tie-group max rank)/n = (# <= v)/n regardless
    of tie order, and the closing division is the same long/long IEEE
    divide."""
    from pyspark.sql.window import Window

    if not partition:
        # ungrouped ECDF: nothing to mis-partition on; callers are
        # bounded-size by contract
        w = Window.orderBy(F.col(col))
        return df.withColumn(out, F.cume_dist().over(w))

    from ..operators.globalindex import grouped_sort_index

    parts = list(partition)
    g = df.groupBy(*parts, col).agg(F.count("*").alias("_tc"))
    g = grouped_sort_index(
        g, parts, [col], index_col="_ri", cum_cols={"_cum": "_tc"}
    ).drop("_ri", "_tc")
    totals = df.groupBy(*parts).agg(F.count("*").alias("_n"))
    return (
        df.join(g, parts + [col])
        .join(F.broadcast(totals), parts)
        .withColumn(out, F.col("_cum") / F.col("_n"))
        .drop("_cum", "_n")
    )
