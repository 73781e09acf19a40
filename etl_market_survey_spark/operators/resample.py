"""Time-series resampling to a regular grid with linear interpolation.

The sensor-pipeline staple the reference's physics data implies but
never needed (its waveform grids arrive regular): place each key's
irregular observations onto a fixed step grid, linearly interpolating
between the bracketing events. Interpolation only — grid points outside
a key's observed span are not emitted (no extrapolation).

One-shuffle shape: grid markers (from each key's span, integer
arithmetic) union with the events; ONE hash exchange on the key then two
window passes over the same partitioning (forward fill = last event at
or before the grid point, backward fill = first at or after). No joins,
no per-grid-point probes — the classic union-and-fill formulation
(same trick as operators/asof).

Exactness discipline: timestamps are epoch-nano longs — deltas are
computed in int64 BEFORE any double cast (an epoch-ns double cast loses
~256 ns of ulp), and the interpolation ``v_prev + (v_next - v_prev) *
(dg / dt)`` is a fixed single-rounding expression replayed verbatim by
the DuckDB oracle. An event exactly on a grid point brackets itself
(dg = 0) and reproduces its value bit-for-bit.

Tie rule (pinned by units): equal-timestamp events order by the
``seq_col``; the forward fill takes the LAST such event, the backward
fill the FIRST — deterministic on any layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_ns: int,
    seq_col: str | None = None,
) -> DataFrame:
    """``(key, ts_grid, value)`` on the step grid covering each key's
    observed span, linearly interpolated. ``ts_col`` must be epoch-nano
    long; ``seq_col`` breaks equal-timestamp ties (defaults to the
    value itself)."""
    seq = F.col(seq_col) if seq_col else F.col(value_col)
    ev = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
        seq.cast("long").alias("_seq"),
        F.lit(0).alias("_is_grid"),
    )
    bounds = ev.groupBy("_k").agg(F.min("_ts").alias("_lo"), F.max("_ts").alias("_hi"))
    step = F.lit(int(step_ns))
    # ceil/floor to the grid in pure int64 — never `/` (long/long is a
    # DOUBLE divide in Spark; epoch-ns longs exceed double's 2^53 integer
    # range), and via pmod rather than `div` so negative (pre-1970)
    # timestamps floor like DuckDB's `//` instead of truncating toward
    # zero. A span containing no grid point yields start > stop, where
    # Spark's sequence() throws — guard to an empty array (the
    # no-extrapolation contract; DuckDB's range() is empty natively).
    g_start = F.expr(f"_lo + pmod(-_lo, {int(step_ns)}L)")
    g_stop = F.expr(f"_hi - pmod(_hi, {int(step_ns)}L)")
    grid = bounds.select(
        "_k",
        F.explode(
            F.when(g_start <= g_stop, F.sequence(g_start, g_stop, step)).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("_ts"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(None).cast("long").alias("_seq"),
        F.lit(1).alias("_is_grid"),
    )
    u = ev.unionByName(grid.select(ev.columns))

    # events sort BEFORE the grid marker at the same ts (_is_grid asc) so
    # an exact hit brackets itself on both sides
    asc = Window.partitionBy("_k").orderBy("_ts", "_is_grid", "_seq").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # is_grid stays ASCENDING in the desc pass too: an event at the same
    # ts must traverse BEFORE the grid marker (be in its prefix) for an
    # exact hit to bracket itself on the next side as well
    desc = Window.partitionBy("_k").orderBy(
        F.col("_ts").desc(), F.col("_is_grid").asc(), F.col("_seq").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    ev_ts = F.when(F.col("_is_grid") == 0, F.col("_ts"))
    filled = (
        u.withColumn("_t_prev", F.last(ev_ts, ignorenulls=True).over(asc))
        .withColumn("_v_prev", F.last(F.when(F.col("_is_grid") == 0, F.col("_v")), ignorenulls=True).over(asc))
        .withColumn("_t_next", F.last(ev_ts, ignorenulls=True).over(desc))
        .withColumn("_v_next", F.last(F.when(F.col("_is_grid") == 0, F.col("_v")), ignorenulls=True).over(desc))
    )
    dg = (F.col("_ts") - F.col("_t_prev")).cast("double")
    dt = (F.col("_t_next") - F.col("_t_prev")).cast("double")
    interp = F.when(F.col("_t_next") == F.col("_t_prev"), F.col("_v_prev")).otherwise(
        F.col("_v_prev") + (F.col("_v_next") - F.col("_v_prev")) * (dg / dt)
    )
    return (
        filled.filter(
            (F.col("_is_grid") == 1)
            & F.col("_t_prev").isNotNull()
            & F.col("_t_next").isNotNull()
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("_ts").alias("ts_grid"),
            interp.alias("value"),
        )
    )


def sql_resample_linear(
    table: str,
    key: str,
    ts_ns_expr: str,
    value: str,
    step_ns: int,
    seq: str,
) -> str:
    """DuckDB mirror — identical fills, identical single-rounding
    interpolation expression."""
    return f"""
WITH ev AS (
  SELECT {key} AS k, {ts_ns_expr} AS ts, CAST({value} AS DOUBLE) AS v,
         CAST({seq} AS BIGINT) AS seq, 0 AS is_grid
  FROM {table}
),
bounds AS (
  SELECT k, MIN(ts) AS lo, MAX(ts) AS hi FROM ev GROUP BY k
),
grid AS (
  SELECT k,
         unnest(range(((lo + {step_ns} - 1) // {step_ns}) * {step_ns},
                      (hi // {step_ns}) * {step_ns} + 1,
                      {step_ns})) AS ts,
         CAST(NULL AS DOUBLE) AS v, CAST(NULL AS BIGINT) AS seq,
         1 AS is_grid
  FROM bounds
),
u AS (SELECT * FROM ev UNION ALL SELECT * FROM grid),
filled AS (
  SELECT *,
    last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
      OVER (PARTITION BY k ORDER BY ts, is_grid, seq
            ROWS UNBOUNDED PRECEDING) AS t_prev,
    last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
      OVER (PARTITION BY k ORDER BY ts, is_grid, seq
            ROWS UNBOUNDED PRECEDING) AS v_prev,
    last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
      OVER (PARTITION BY k ORDER BY ts DESC, is_grid ASC, seq DESC
            ROWS UNBOUNDED PRECEDING) AS t_next,
    last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
      OVER (PARTITION BY k ORDER BY ts DESC, is_grid ASC, seq DESC
            ROWS UNBOUNDED PRECEDING) AS v_next
  FROM u
)
SELECT k AS {key}, ts AS ts_grid,
       CASE WHEN t_next = t_prev THEN v_prev
            ELSE v_prev + (v_next - v_prev) *
                 (CAST(ts - t_prev AS DOUBLE) / CAST(t_next - t_prev AS DOUBLE))
       END AS value
FROM filled
WHERE is_grid = 1 AND t_prev IS NOT NULL AND t_next IS NOT NULL
"""
