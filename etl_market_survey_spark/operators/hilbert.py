"""Hilbert-curve layout index — the locality-optimal cousin of Z-order.

Same lakehouse purpose as ``operators/zorder`` (sort files by a
space-filling index so min/max stats prune on either column), but the
Hilbert curve never takes the Morton curve's long diagonal jumps:
consecutive indices are ALWAYS unit steps in (x, y), so every file
covers one contiguous snake segment — measurably tighter rectangles at
the same file count (the reason Databricks added Hilbert as liquid
clustering's curve).

The mapping is the classic iterated rotate-and-flip (public-domain
formulation of the 1891 curve): for each bit plane s from the top,
quadrant = (rx, ry), index += s^2 * ((3*rx) XOR ry), then rotate the
frame. Pure integer bit arithmetic unrolled ``order`` times — the same
expression tree is emitted for Spark Columns and DuckDB SQL, so q274
pins the arithmetic bit-for-bit like q99 pins Morton's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ORDER = 8  # 8-bit coords -> indices in [0, 65536)


def with_hilbert(
    df,
    x: Column | str,
    y: Column | str,
    out_col: str = "hilbert_d",
    order: int = ORDER,
):
    """Attach the Hilbert index of integer coords in ``[0, 2^order)``
    as ``out_col`` (caller scales/folds wider keys, as with z2).

    Materializes per-iteration intermediate columns instead of nesting
    one Column tree: the rotate step references x and y twice each, so
    a pure expression tree grows 4^order nodes and stalls analysis —
    named intermediates keep the plan linear in ``order``. The chain is
    emitted as ONE ``select`` of lateral column aliases (each SELECT
    item may reference earlier aliases, Spark 3.4+) rather than a
    ``withColumns`` per iteration: 3 x order successive Dataset
    creations each re-analyze a growing projection chain — measured
    ~1.7 s of pure driver time per call at order=16 vs ~0.3 s for the
    single-analysis form, identical arithmetic and final plan."""
    df = df.withColumns(
        {
            "_h_x0": (F.col(x) if isinstance(x, str) else x).cast("long"),
            "_h_y0": (F.col(y) if isinstance(y, str) else y).cast("long"),
            "_h_d0": F.lit(0).cast("long"),
        }
    )
    exprs: list[str] = []
    s = 1 << (order - 1)
    i = 0
    while s > 0:
        rx = f"(CASE WHEN _h_x{i} & {s} > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN _h_y{i} & {s} > 0 THEN 1 ELSE 0 END)"
        # quadrant index += s*s * ((3*rx) XOR ry); s*s as a LONG: at
        # order > 15 the int32 product 3*s*s overflows (ANSI
        # ArithmeticException). rotate quadrant: if ry==0
        # { if rx==1 { x,y = s-1-y, s-1-x } else swap }
        exprs.append(
            f"_h_d{i} + CAST({s * s} AS LONG)"
            f" * CAST((3 * {rx}) ^ {ry} AS LONG) AS _h_d{i + 1}"
        )
        exprs.append(
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - _h_y{i} ELSE _h_y{i} END)"
            f" ELSE _h_x{i} END AS _h_x{i + 1}"
        )
        exprs.append(
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {s - 1} - _h_x{i} ELSE _h_x{i} END)"
            f" ELSE _h_y{i} END AS _h_y{i + 1}"
        )
        i += 1
        s >>= 1
    keep = [c for c in df.columns if c not in ("_h_x0", "_h_y0", "_h_d0")]
    out = df.select("*", *[F.expr(e) for e in exprs])
    return out.select(*keep, F.col(f"_h_d{i}").alias(out_col))


def sql_hilbert_cte(
    source_cte: str, out_cte: str = "hilb", order: int = ORDER
) -> str:
    """DuckDB mirror of :func:`hilbert_d` — identical integer
    recurrence as a chain of ``order`` CTEs carrying (k, x, y, d)
    (textual substitution would grow 4^order; named intermediates keep
    it linear). ``source_cte`` must expose ``(k, x, y)`` with integer
    coords in range; emits ``out_cte`` with ``(k, d)``. Paste inside a
    WITH list."""
    parts = [
        f"{out_cte}_0 AS (SELECT k, CAST(x AS BIGINT) AS x, "
        f"CAST(y AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM {source_cte})"
    ]
    s = 1 << (order - 1)
    i = 0
    while s > 0:
        rx = f"(CASE WHEN x & {s} > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN y & {s} > 0 THEN 1 ELSE 0 END)"
        parts.append(f"""
{out_cte}_{i + 1} AS (
  SELECT k,
         CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1
              THEN {s - 1} - y ELSE y END) ELSE x END AS x,
         CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1
              THEN {s - 1} - x ELSE x END) ELSE y END AS y,
         d + {s * s} * xor(3 * {rx}, {ry}) AS d
  FROM {out_cte}_{i}
)""")
        i += 1
        s >>= 1
    parts.append(f"{out_cte} AS (SELECT k, d FROM {out_cte}_{i})")
    return ",\n".join(parts)
