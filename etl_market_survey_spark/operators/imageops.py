"""Integer-exact image geometry ops over decoded pixel tables.

The multimodal codecs (PNG q231, JPEG q256, GIF q268, netpbm q205)
produce pixel matrices; the ops a curation pipeline runs next —
resize, crop, patchify — live here, expressed over LONG pixel tables
``(id, y, x, g)`` so they compose with any decoder and stay
cross-engine bit-exact.

``resize_bilinear_int`` is align-corners bilinear interpolation with
EXACT rational weights: source position for output row r is
``r * (h_in - 1) / (h_out - 1)`` — numerator/denominator kept as
integers, the four neighbor weights are ``(q - fy)(q - fx)`` etc. with
``q = h_out - 1`` scaled by q^2 — no float anywhere, so any engine
replaying the same integer algebra produces the same bits. (The
float-free formulation is also what a fixed-point SIMD resizer does.)

Scale shape: output pixels are a literal (r, c) grid crossed with the
id dimension; each output pixel reads its 4 neighbors via one join to
the pixel table on (id, y, x) — hash-partitioned by id, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resize_bilinear_int(
    pixels: DataFrame,
    h_in: int,
    w_in: int,
    h_out: int,
    w_out: int,
) -> DataFrame:
    """``(id, r, c, val_scaled)`` align-corners bilinear resize of
    ``(id, y, x, g)`` integer pixel tables; ``val_scaled`` is the
    interpolated value times ``(h_out-1)*(w_out-1)`` (exact integer,
    divide on display)."""
    qy, qx = h_out - 1, w_out - 1
    ids = pixels.select("id").distinct()
    grid = ids.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(h_out - 1))).alias("r"),
    ).select(
        "id", "r", F.explode(F.sequence(F.lit(0), F.lit(w_out - 1))).alias("c")
    )
    pos = grid.select(
        "id",
        "r",
        "c",
        F.expr(f"(r * {h_in - 1}) div {qy}").alias("y0"),
        F.expr(f"(r * {h_in - 1}) % {qy}").alias("fy"),
        F.expr(f"(c * {w_in - 1}) div {qx}").alias("x0"),
        F.expr(f"(c * {w_in - 1}) % {qx}").alias("fx"),
    ).select(
        "id", "r", "c", "y0", "fy", "x0", "fx",
        F.least(F.col("y0") + 1, F.lit(h_in - 1)).alias("y1"),
        F.least(F.col("x0") + 1, F.lit(w_in - 1)).alias("x1"),
    )

    def nb(yc, xc, alias):
        p = pixels.select(
            F.col("id").alias("pid"), F.col("y").alias("py"),
            F.col("x").alias("px"), F.col("g").alias(alias),
        )
        return (
            (F.col("pid") == F.col("id"))
            & (F.col("py") == F.col(yc))
            & (F.col("px") == F.col(xc)),
            p,
        )

    out = pos
    for yc, xc, alias in (
        ("y0", "x0", "g00"),
        ("y0", "x1", "g01"),
        ("y1", "x0", "g10"),
        ("y1", "x1", "g11"),
    ):
        cond, p = nb(yc, xc, alias)
        out = out.join(p, cond).drop("pid", "py", "px")
    val = F.expr(
        f"({qy} - fy) * ({qx} - fx) * g00 + ({qy} - fy) * fx * g01"
        f" + fy * ({qx} - fx) * g10 + fy * fx * g11"
    )
    return out.select("id", "r", "c", val.cast("long").alias("val_scaled"))


def sql_resize_bilinear_int(
    pixels_cte: str, h_in: int, w_in: int, h_out: int, w_out: int
) -> str:
    """DuckDB replay of :func:`resize_bilinear_int` over a
    ``(id, y, x, g)`` CTE; emits rows ``(id, r, c, val_scaled)``."""
    qy, qx = h_out - 1, w_out - 1
    return f"""
SELECT g.id, g.r, g.c,
       CAST(({qy} - g.fy) * ({qx} - g.fx) * p00.g
            + ({qy} - g.fy) * g.fx * p01.g
            + g.fy * ({qx} - g.fx) * p10.g
            + g.fy * g.fx * p11.g AS BIGINT) AS val_scaled
FROM (
  SELECT id, r, c,
         (r * {h_in - 1}) // {qy} AS y0,
         (r * {h_in - 1}) % {qy} AS fy,
         (c * {w_in - 1}) // {qx} AS x0,
         (c * {w_in - 1}) % {qx} AS fx,
         LEAST((r * {h_in - 1}) // {qy} + 1, {h_in - 1}) AS y1,
         LEAST((c * {w_in - 1}) // {qx} + 1, {w_in - 1}) AS x1
  FROM (SELECT DISTINCT id FROM {pixels_cte})
  CROSS JOIN (SELECT unnest(range(0, {h_out})) AS r)
  CROSS JOIN (SELECT unnest(range(0, {w_out})) AS c)
) g
JOIN {pixels_cte} p00 ON p00.id = g.id AND p00.y = g.y0 AND p00.x = g.x0
JOIN {pixels_cte} p01 ON p01.id = g.id AND p01.y = g.y0 AND p01.x = g.x1
JOIN {pixels_cte} p10 ON p10.id = g.id AND p10.y = g.y1 AND p10.x = g.x0
JOIN {pixels_cte} p11 ON p11.id = g.id AND p11.y = g.y1 AND p11.x = g.x1
"""
