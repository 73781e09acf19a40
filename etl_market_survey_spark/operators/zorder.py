"""Z-order (Morton) interleaved layout for multi-column data skipping.

The lakehouse table-layout technique (Delta OPTIMIZE ZORDER, Iceberg
sort orders): interleave the bits of two key columns and range-partition
+ sort files by the interleaved value, so every file covers a tight
rectangle in (a, b) space and parquet min/max stats prune files for
predicates on EITHER column — a linear sort only prunes its leading
column. The interleave is five shift-and-mask steps per column (the
standard magic-number bit spread), pure JVM integer expressions, exactly
replayable in SQL — q99 pins the arithmetic against DuckDB.

``zorder_write`` materializes the layout; the test proves the payoff on
row counts: with a Z layout, a range filter on either column touches a
small fraction of files, where the single-column sort layout touches
every file for the non-leading column.

16 bits per column (a 65536-cell grid per axis) is the standard
granularity — layout quality needs only the high bits to spread; keys
wider than 16 bits keep correctness (pruning decides from file min/max,
never from z itself) and should pre-scale or hash-fold if their high
bits carry all the variance.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` onto even bit positions (0,2,..30)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _MASKS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z2(a: Column | str, b: Column | str) -> Column:
    """Morton-interleave the low 16 bits of two integral columns:
    ``a`` on even bits, ``b`` on odd bits."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread16(ca).bitwiseOR(F.shiftleft(_spread16(cb), 1))


def sql_z2(a: str, b: str) -> str:
    """DuckDB mirror of :func:`z2` (same shifts and masks)."""

    def spread(e: str) -> str:
        x = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _MASKS:
            x = f"((({x} | ({x} << {shift})) & {mask}))"
        return x

    return f"({spread(a)} | ({spread(b)} << 1))"


def _scale16(c: Column, mn: int, mx: int) -> Column:
    """Affine-map [mn, mx] onto the full 16-bit grid (integer floor
    arithmetic). Interleaving is only balanced when both columns spread
    their HIGH bits — a column spanning [0, 9] left raw would sit in the
    low bits and never influence file boundaries."""
    span = max(1, mx - mn)
    return ((c.cast("long") - F.lit(mn)) * F.lit(0xFFFF) / F.lit(span)).cast("long")


def zorder_write(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int
) -> None:
    """Write ``df`` as ~``n_files`` parquet files range-partitioned and
    sorted by the (col_a, col_b) Z-value, each column first normalized
    to the 16-bit grid (one tiny min/max pre-pass)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    z = z2(
        _scale16(F.col(col_a), int(lo_a), int(hi_a)),
        _scale16(F.col(col_b), int(lo_b), int(hi_b)),
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(df: DataFrame) -> int:
    """Number of distinct files holding rows of ``df`` — the data-skipping
    payoff metric (files whose min/max stats cannot exclude the filter)."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )


def n_data_files(path: str) -> int:
    return sum(
        1 for n in os.listdir(path) if n.endswith(".parquet") and not n.startswith("_")
    )


def zk(cols: list[Column | str], bits: int | None = None) -> Column:
    """Morton-interleave k >= 2 columns: bit ``i`` of column ``j`` lands
    at position ``i*k + j``. ``bits`` defaults to the largest width that
    keeps the result inside a positive signed long (62 // k, capped at
    16). The k=2/16-bit case is :func:`z2`'s five-mask fast path; this
    general form unrolls one OR-shift term per (column, bit) — still a
    single JVM projection."""
    k = len(cols)
    if k < 2:
        raise ValueError("zk needs at least 2 columns")
    if bits is None:
        bits = min(16, 62 // k)
    if not 1 <= bits * k <= 62:
        raise ValueError("bits * k must stay within a positive signed long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(
            F.lit((1 << bits) - 1)
        )
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return out


def zk_ref(values: list[int], bits: int) -> int:
    """Driver-side reference of :func:`zk` for tests."""
    k = len(values)
    out = 0
    for j, v in enumerate(values):
        v &= (1 << bits) - 1
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


def with_curve_key(
    df: DataFrame,
    cols: list[str],
    order: int = 16,
    out_col: str = "_zd",
    bounds: dict | None = None,
) -> DataFrame:
    """Attach the space-filling-curve clustering key both lakehouse
    OPTIMIZE paths share (Delta ``optimize_zorder``, Iceberg
    ``rewrite_data_files(zorder_by=...)``): one column degrades to a
    plain (double-cast) sort key; two use the Hilbert curve; three and
    four the bit-interleaved Z-curve via :func:`zk`, with per-dimension
    grid bits clamped to ``62 // k``. Columns are scaled to the curve
    grid by min/max (ONE aggregate — no global-rank window, which would
    be a SinglePartition exchange; the trade is that extreme outliers
    compress the useful grid range).

    ``bounds``: optional ``{col: (mn, mx)}`` replacing the min/max
    aggregate — for callers whose source metadata already carries exact
    per-file column bounds (lakehouse log stats), saving one full-input
    job. Values MUST equal what the aggregate would return (the
    lakehouse callers guarantee it: integral columns only, where the
    long→double cast is monotone so double(min(x)) == min(double(x)),
    tight stats, no row-level deletes) — the curve key and therefore
    the produced file layout are identical either way."""
    from .hilbert import with_hilbert

    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder takes 1 to 4 columns")
    k = len(cols)
    bits = order if k <= 2 else min(order, 62 // k)
    grid = (1 << bits) - 1
    if k == 1:
        return df.withColumn(out_col, F.col(cols[0]).cast("double"))
    if bounds is not None and all(c in bounds for c in cols):
        b = {}
        for c in cols:
            mn, mx = bounds[c]
            b[f"mn_{c}"], b[f"mx_{c}"] = float(mn), float(mx)
    else:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
        b = df.agg(*aggs).first()
    scaled = {}
    for c in cols:
        mn, mx = b[f"mn_{c}"], b[f"mx_{c}"]
        span = (mx - mn) or 1.0
        scaled[f"_g_{c}"] = F.floor(
            (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
            * F.lit(float(grid))
        ).cast("long")
    df = df.withColumns(scaled)
    if k == 2:
        df = with_hilbert(df, f"_g_{cols[0]}", f"_g_{cols[1]}",
                          out_col=out_col, order=bits)
    else:
        df = df.withColumn(out_col, zk([f"_g_{c}" for c in cols], bits=bits))
    return df.drop(*[f"_g_{c}" for c in cols])
