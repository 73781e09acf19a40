"""CUSUM change-point detection (Page 1954) — monitoring drift in a
metric stream per key, the classic sequential detector: in event order,

    s_i = max(0, s_{i-1} + (x_i - k)),  alarm when s_i > h

(k = allowed slack per step, h = decision threshold). A true sequential
recurrence over doubles — run as ``applyInPandas`` per key with one
double of carried state (same shape as packing.pack_bins_nosplit);
double ``+``/``max`` are IEEE-exact, so the DuckDB recursive-CTE mirror
replays the recurrence bit-for-bit and the detector is hash-gated
(q158). Parallelism = number of keys; state = 8 bytes per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _per_key_map(d: DataFrame, key_col: str, order_cols, schema, per_group):
    """Partition-level stand-in for ``groupBy(key).applyInPandas`` —
    see :func:`..operators.groupmap.per_group_map` (with many small
    keys the per-group pandas overhead dominates the recurrence;
    measured 2.3-2.6x on the q239 Holt shape, 1500 keys of ~67
    rows). Identical floats, identical rows."""
    from .groupmap import per_group_map

    return per_group_map(
        d, [key_col], schema, per_group, order_cols=order_cols
    )


def cusum_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    k: float,
    h: float,
) -> DataFrame:
    """One-sided CUSUM drift detector per key (Page 1954): in order,
    ``s_i = max(0, s_{i-1} + (x_i - k))``, alarm when ``s_i > h``.
    A true sequential recurrence -> ``applyInPandas`` per key with one
    double of carried state (the q144 pattern); double ``+``/``max`` are
    IEEE-exact, so the DuckDB recursive-CTE oracle replays it
    bit-for-bit. Output: key, order cols, value, ``cusum``, ``alarm``."""
    import pandas as pd

    order_cols = list(order_cols)
    d = df.select(
        F.col(key_col), *[F.col(c) for c in order_cols], F.col(value_col)
    )
    fields = dict(d.dtypes)
    schema = (
        ", ".join(f"`{c}` {fields[c]}" for c in [key_col, *order_cols, value_col])
        + ", cusum double, alarm boolean"
    )
    kf, hf = float(k), float(h)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s = 0.0
        out_s, out_a = [], []
        for x in pdf[value_col]:
            s = s + (float(x) - kf)
            if s < 0.0:
                s = 0.0
            out_s.append(s)
            out_a.append(s > hf)
        pdf = pdf.copy()
        pdf["cusum"] = out_s
        pdf["alarm"] = out_a
        return pdf

    return _per_key_map(d, key_col, order_cols, schema, run)


def sql_cusum_per_key(
    table: str,
    key_expr: str,
    order_exprs: Sequence[str],
    value_expr: str,
    k: float,
    h: float,
) -> str:
    """DuckDB mirror of :func:`cusum_per_key` — the recurrence as a
    recursive CTE over per-key row numbers."""
    ob = ", ".join(order_exprs)
    oc = ", ".join(f"{e}" for e in order_exprs)
    return f"""
WITH RECURSIVE r AS (
  SELECT {key_expr} AS _k, {oc}, {value_expr} AS _x,
         ROW_NUMBER() OVER (PARTITION BY {key_expr} ORDER BY {ob}) AS _rn
  FROM {table}
),
p AS (
  SELECT _k, {oc}, _x, _rn,
         GREATEST(0.0, CAST(_x AS DOUBLE) - {k!r}) AS cusum
  FROM r WHERE _rn = 1
  UNION ALL
  SELECT r._k, {', '.join('r.' + e for e in order_exprs)}, r._x, r._rn,
         GREATEST(0.0, p.cusum + (CAST(r._x AS DOUBLE) - {k!r}))
  FROM r JOIN p ON r._k = p._k AND r._rn = p._rn + 1
)
SELECT _k AS {key_expr}, {oc}, _x AS {value_expr}, cusum,
       cusum > {h!r} AS alarm
FROM p
"""


def ewma_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``s_1 = x_1; s_i = alpha*x_i + (1-alpha)*s_{i-1}`` — the smoothing
    companion to CUSUM, same stateful-recurrence contract (IEEE-exact
    ops only, recursive-CTE oracle replays it bit-for-bit)."""
    import pandas as pd

    order_cols = list(order_cols)
    d = df.select(
        F.col(key_col), *[F.col(c) for c in order_cols], F.col(value_col)
    )
    fields = dict(d.dtypes)
    schema = (
        ", ".join(f"`{c}` {fields[c]}" for c in [key_col, *order_cols, value_col])
        + ", ewma double"
    )
    a = float(alpha)
    b = 1.0 - a

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        out = []
        s = None
        for x in pdf[value_col]:
            x = float(x)
            s = x if s is None else a * x + b * s
            out.append(s)
        pdf = pdf.copy()
        pdf["ewma"] = out
        return pdf

    return _per_key_map(d, key_col, order_cols, schema, run)


def sql_ewma_per_key(
    table: str,
    key_expr: str,
    order_exprs: Sequence[str],
    value_expr: str,
    alpha: float,
) -> str:
    """DuckDB mirror of :func:`ewma_per_key`."""
    a = float(alpha)
    b = 1.0 - a
    ob = ", ".join(order_exprs)
    oc = ", ".join(order_exprs)
    return f"""
WITH RECURSIVE r AS (
  SELECT {key_expr} AS _k, {oc}, {value_expr} AS _x,
         ROW_NUMBER() OVER (PARTITION BY {key_expr} ORDER BY {ob}) AS _rn
  FROM {table}
),
p AS (
  SELECT _k, {oc}, _x, _rn, CAST(_x AS DOUBLE) AS ewma
  FROM r WHERE _rn = 1
  UNION ALL
  SELECT r._k, {', '.join('r.' + e for e in order_exprs)}, r._x, r._rn,
         {a!r} * CAST(r._x AS DOUBLE) + {b!r} * p.ewma
  FROM r JOIN p ON r._k = p._k AND r._rn = p._rn + 1
)
SELECT _k AS {key_expr}, {oc}, _x AS {value_expr}, ewma
FROM p
"""


def holt_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    beta: float,
) -> DataFrame:
    """Holt (1957) double-exponential (level + trend) smoothing per key — the
    trend-aware upgrade of :func:`ewma_per_key`, same stateful-
    recurrence contract (IEEE-exact ops in a fixed order; the
    recursive-CTE oracle replays every float bit-for-bit, q239):

    ``l_1 = x_1``, ``t_1 = x_2 - x_1`` (classic init; single-row keys
    emit a NULL trend and never recur); for i >= 2::

        forecast_i = l_{i-1} + t_{i-1}          (one-step-ahead)
        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + t_{i-1})
        t_i = beta*(l_i - l_{i-1}) + (1-beta)*t_{i-1}
    """
    import pandas as pd

    order_cols = list(order_cols)
    d = df.select(
        F.col(key_col), *[F.col(c) for c in order_cols], F.col(value_col)
    )
    fields = dict(d.dtypes)
    schema = (
        ", ".join(f"`{c}` {fields[c]}" for c in [key_col, *order_cols, value_col])
        + ", level double, trend double, forecast double"
    )
    a = float(alpha)
    ac = 1.0 - a
    bt = float(beta)
    bc = 1.0 - bt

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        xs = [float(v) for v in pdf[value_col]]
        levels, trends, fcs = [], [], []
        l = t = None
        for i, x in enumerate(xs):
            if i == 0:
                l = x
                t = (xs[1] - xs[0]) if len(xs) > 1 else None
                fcs.append(None)
            else:
                f = l + t
                fcs.append(f)
                l_new = a * x + ac * (l + t)
                t = bt * (l_new - l) + bc * t
                l = l_new
            levels.append(l)
            trends.append(t)
        pdf = pdf.copy()
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["forecast"] = fcs
        return pdf

    return _per_key_map(d, key_col, order_cols, schema, run)


def sql_holt_per_key(
    table: str,
    key_expr: str,
    order_exprs: Sequence[str],
    value_expr: str,
    alpha: float,
    beta: float,
) -> str:
    """DuckDB mirror of :func:`holt_per_key` — keep in lockstep (the
    recursive step spells l_i out twice so every float op matches the
    kernel's order exactly)."""
    a = float(alpha)
    ac = 1.0 - a
    bt = float(beta)
    bc = 1.0 - bt
    ob = ", ".join(order_exprs)
    oc = ", ".join(order_exprs)
    rcols = ", ".join("r." + e for e in order_exprs)
    lnew = f"({a!r} * CAST(r._x AS DOUBLE) + {ac!r} * (p.lvl + p.tr))"
    return f"""
WITH RECURSIVE r AS (
  SELECT {key_expr} AS _k, {oc}, {value_expr} AS _x,
         ROW_NUMBER() OVER (PARTITION BY {key_expr} ORDER BY {ob}) AS _rn,
         LEAD({value_expr}) OVER (PARTITION BY {key_expr} ORDER BY {ob}) AS _x2
  FROM {table}
),
p AS (
  SELECT _k, {oc}, _x, _rn,
         CAST(_x AS DOUBLE) AS lvl,
         CAST(_x2 AS DOUBLE) - CAST(_x AS DOUBLE) AS tr,
         CAST(NULL AS DOUBLE) AS forecast
  FROM r WHERE _rn = 1
  UNION ALL
  SELECT r._k, {rcols}, r._x, r._rn,
         {lnew},
         {bt!r} * ({lnew} - p.lvl) + {bc!r} * p.tr,
         p.lvl + p.tr
  FROM r JOIN p ON r._k = p._k AND r._rn = p._rn + 1
)
SELECT _k AS {key_expr}, {oc}, _x AS {value_expr}, lvl AS level, tr AS trend, forecast
FROM p
"""


def croston_per_key(
    df: DataFrame,
    key_col: str,
    day_col: str,
    qty_col: str,
    alpha: float,
) -> DataFrame:
    """Croston (1972) intermittent-demand forecast per key: over the
    DEMAND events only (zero days carry no row), smooth the demand size
    ``z = a*q + (1-a)*z`` and the inter-demand interval
    ``p = a*tau + (1-a)*p`` (tau = day gap to the previous demand),
    initialized ``z = q_1, p = 1``; forecast per period = ``z / p``.
    The sequential fold runs per key in an Arrow kernel (the Holt
    contract) and the oracle replays the identical IEEE recurrence as
    a recursive CTE. Output: key, n_demands, level round-9, interval
    round-9, forecast round-9."""
    import pandas as pd

    a = float(alpha)
    fields = dict(df.dtypes)
    schema = (
        f"`{key_col}` {fields[key_col]}, n_demands long, "
        f"level double, interval double, forecast double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col, kind="mergesort")
        days = pdf[day_col].to_numpy()
        qs = pdf[qty_col].astype(float).to_numpy()
        z = float(qs[0])
        p = 1.0
        for i in range(1, len(qs)):
            tau = float(days[i] - days[i - 1])
            z = a * float(qs[i]) + (1.0 - a) * z
            p = a * tau + (1.0 - a) * p
        return pd.DataFrame(
            [
                {
                    key_col: pdf[key_col].iloc[0],
                    "n_demands": len(qs),
                    "level": round(z, 9),
                    "interval": round(p, 9),
                    "forecast": round(z / p, 9),
                }
            ]
        )

    return _per_key_map(df, key_col, [day_col], schema, run)


def sql_croston_per_key(
    table: str, key_expr: str, day_expr: str, qty_expr: str, alpha: float
) -> str:
    """DuckDB mirror of :func:`croston_per_key` — keep in lockstep."""
    a = float(alpha)
    return f"""
WITH RECURSIVE cr_r AS (
  SELECT {key_expr} AS k, {day_expr} AS d, CAST({qty_expr} AS DOUBLE) AS q,
         ROW_NUMBER() OVER (PARTITION BY {key_expr} ORDER BY {day_expr})
           AS rn,
         {day_expr} - LAG({day_expr}) OVER (
           PARTITION BY {key_expr} ORDER BY {day_expr}) AS tau
  FROM {table}
),
cr_p AS (
  SELECT k, rn, q AS z, CAST(1.0 AS DOUBLE) AS p
  FROM cr_r WHERE rn = 1
  UNION ALL
  SELECT r.k, r.rn,
         {a!r} * r.q + {1.0 - a!r} * s.z,
         {a!r} * CAST(r.tau AS DOUBLE) + {1.0 - a!r} * s.p
  FROM cr_r r JOIN cr_p s ON r.k = s.k AND r.rn = s.rn + 1
),
cr AS (
  SELECT k, MAX(rn) AS n_demands,
         MAX_BY(z, rn) AS z, MAX_BY(p, rn) AS p
  FROM cr_p GROUP BY 1
)"""
