"""File-level data-skipping index for plain parquet lakes (beyond
reference — the 100 TB point-lookup path).

Lakehouse tables carry per-file statistics in their transaction logs
(``sources/deltalog.py`` stats pruning, ``sources/iceberg.py``
``bounds_json``); a PLAIN parquet lake has no log, and zone maps alone
cannot prune a point lookup on a column the layout never clustered — a
high-cardinality id hash-scattered over every file has every file's
[min, max] covering every probe. The reference's analogue is the
directory-walking measurement catalog (``scripts/utils.py`` path
resolution): it re-lists and re-reads everything per query. This module
materializes a persistent SIDECAR index table instead — one row per
data file:

    file            string          (as ``input_file_name()`` renders)
    n_rows          bigint
    per indexed column ``c``:
      c__min, c__max                (zone map, source type)
      c__nnull      bigint
      c__bloom      map<int,bigint> (sparse words of a fixed-width
                                     bitmap; k probes via ``xxhash64``)

Scale shape:

- **Build** is one distributed pass; every hot expression is a JVM
  builtin (``xxhash64``, ``shiftleft``, ``bit_or``, ``map_from_
  entries``). The bloom shuffle carries at most ``n_files x n_cols x
  n_bits/64`` (file, col, word) triples — bounded by index geometry,
  never by row count — and the zone pass is an ordinary map-side-
  combined aggregation. Nothing row-sized ever reaches the driver.
- **Prune** runs entirely over the INDEX table (KBs per data file):
  zone interval checks plus an all-k-bits-set bloom probe, expressed
  as Catalyst filters; only surviving file PATHS are collected —
  metadata-sized by construction.
- **Read** scans only the survivors, plus any file the lake gained
  after the index was built (staleness is correctness-neutral:
  unindexed files are always scanned in full), then re-applies the
  whole predicate — so the result is EXACTLY the plain filtered scan,
  the bloom/zone stage only shrinks the file list.

Probe positions for a literal are computed by evaluating the SAME
``xxhash64`` expression the build used on a one-row frame (one
metadata-sized Spark job per prune) — type-exact by construction, with
no Python re-implementation of the JVM hash to drift.

Sizing: with k=4 probes, fpp ~= (1 - e^(-4n/m))^4 for n distinct keys
per file and m = ``n_bits``; the default m = 131072 (16 KiB/col/file)
gives <1% fpp up to ~13k distinct keys per file. Oversubscribed blooms
degrade to "scan that file" — never to wrong answers.
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_META_NAME = "_skipindex_meta.json"

# predicate spec: list of (column, op, value) conjuncts
_OPS = {
    "=", "in", "<", "<=", ">", ">=", "between", "prefix",
    "is_null", "is_not_null",
}


def _next_prefix(s: str) -> str | None:
    """Smallest string greater than EVERY string with prefix ``s``
    (bump the last non-max char, dropping trailing max chars); None
    when unbounded. Code-point order == UTF-8 byte order, so Python
    and Spark agree on the comparison."""
    chars = list(s)
    while chars:
        if ord(chars[-1]) < 0x10FFFF:
            chars[-1] = chr(ord(chars[-1]) + 1)
            return "".join(chars)
        chars.pop()
    return None


def _canon(path: str) -> str:
    """Canonical comparable form for file URIs: ``input_file_name()``
    and ``DataFrame.inputFiles()`` may disagree on scheme spelling
    (``file:///p`` vs ``file:/p``)."""
    p = urlparse(path)
    return p.path if p.scheme in ("", "file") else f"{p.scheme}://{p.netloc}{p.path}"


def _positions(col: Column, n_hashes: int, n_bits: int, seed: int) -> list[Column]:
    # null-safe: a null value contributes no bits (xxhash64 would
    # otherwise fold a null to the bare seed hash — one bogus position
    # shared by every null).
    return [
        F.when(
            col.isNotNull(),
            F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(n_bits)).cast("long"),
        )
        for i in range(n_hashes)
    ]


def _lake(spark: SparkSession, data_path: str):
    """Scan of the lake's PARQUET files only — lakehouse-style
    directories carry non-parquet sidecars (DV ``.bin`` blobs, logs)
    that a bare directory read would trip over."""
    return spark.read.option("pathGlobFilter", "*.parquet").parquet(
        data_path
    )


def build_skipping_index(
    spark: SparkSession,
    data_path: str,
    columns: list[str],
    index_path: str,
    *,
    n_bits: int = 131072,
    n_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """One distributed pass over the lake -> parquet index table at
    ``index_path`` (+ a tiny ``_skipindex_meta.json`` recording the
    geometry and the indexed columns' Spark types). Returns the index
    DataFrame as written."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    df = _lake(spark, data_path)
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"indexed columns not in data: {missing}")
    col_types = {c: df.schema[c].dataType.simpleString() for c in columns}

    idx = _index_frame(df, columns, n_bits, n_hashes, seed)
    idx.write.mode("overwrite").parquet(index_path)
    meta = {
        "columns": columns,
        "col_types": col_types,
        "n_bits": n_bits,
        "n_hashes": n_hashes,
        "seed": seed,
        "data_path": data_path,
    }
    with open(os.path.join(index_path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return spark.read.parquet(index_path)


def _index_frame(
    df: DataFrame, columns: list[str], n_bits: int, n_hashes: int,
    seed: int,
) -> DataFrame:
    """The per-file (zones + blooms) frame for whatever files ``df``
    scans — shared by full build and incremental refresh."""
    tagged = df.withColumn("__file", F.input_file_name())

    # zone maps + null counts: one map-side-combined agg
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nnull"),
        ]
    zones = tagged.groupBy("__file").agg(*aggs)

    # blooms: explode (col, probe) pairs once, OR into sparse words.
    # Shuffle volume is capped at n_files x n_cols x n_bits/64 words.
    entries = []
    for c in columns:
        for pos in _positions(F.col(c), n_hashes, n_bits, seed):
            entries.append(F.struct(F.lit(c).alias("c"), pos.alias("pos")))
    words = (
        tagged.select("__file", F.explode(F.array(*entries)).alias("e"))
        .filter(F.col("e.pos").isNotNull())
        .select(
            "__file",
            F.col("e.c").alias("c"),
            F.shiftright(F.col("e.pos"), 6).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(pmod(e.pos, 64) AS int))").alias("mask"),
        )
        .groupBy("__file", "c", "word")
        .agg(F.bit_or("mask").alias("mask"))
        .groupBy("__file", "c")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "mask"))
            ).alias("bloom")
        )
    )
    blooms = (
        words.groupBy("__file")
        .pivot("c", columns)
        .agg(F.first("bloom"))
    )
    for c in columns:
        blooms = blooms.withColumnRenamed(c, f"{c}__bloom")

    return (
        zones.join(blooms, "__file", "left")
        .withColumnRenamed("__file", "file")
    )


def refresh_skipping_index(
    spark: SparkSession,
    data_path: str,
    index_path: str,
) -> tuple[int, int]:
    """Incremental maintenance: index ONLY the files the lake gained
    since the last build/refresh, and drop index rows whose files are
    gone — never a full rebuild (at 100 TB the delta is what you can
    afford to scan). Returns ``(n_added, n_dropped)``.

    The added rows use the geometry pinned in the meta (same n_bits/
    hashes/seed), so probes stay valid across the whole index."""
    import shutil

    meta = _load_meta(index_path)
    full = _lake(spark, data_path)
    current = {_canon(f): f for f in full.inputFiles()}
    old = spark.read.parquet(index_path)
    old_files = [r["file"] for r in old.select("file").collect()]
    known = {_canon(f) for f in old_files}
    new_files = [f for c, f in sorted(current.items()) if c not in known]
    dropped = sorted(f for f in old_files if _canon(f) not in current)
    if not new_files and not dropped:
        return (0, 0)
    keep = old
    if dropped:
        gone = spark.createDataFrame(
            [(f,) for f in dropped], "file string"
        )
        keep = keep.join(F.broadcast(gone), "file", "left_anti")
    if new_files:
        add = _index_frame(
            spark.read.schema(full.schema).parquet(*new_files),
            meta["columns"], meta["n_bits"], meta["n_hashes"],
            meta["seed"],
        )
        keep = keep.unionByName(add, allowMissingColumns=True)
    # stage-then-swap (never overwrite the directory being read):
    # the index is KBs per data file, so the rewrite is metadata-scale
    staging = index_path.rstrip("/") + ".__staging__"
    keep.write.mode("overwrite").parquet(staging)
    shutil.rmtree(index_path)
    os.rename(staging, index_path)
    with open(os.path.join(index_path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return (len(new_files), len(dropped))


def _load_meta(index_path: str) -> dict:
    with open(os.path.join(index_path, _META_NAME)) as f:
        return json.load(f)


def _probe_positions_many(
    spark: SparkSession, probes: list[tuple], meta: dict
) -> list[list[int]]:
    """Bit positions for MANY probe literals in ONE one-row job —
    evaluated by the SAME JVM ``xxhash64`` expression the build used
    (no Python hash model to drift). ``probes`` is [(value, col_type)];
    a prune with an ``in`` list or many conjuncts costs one driver
    round-trip, not one per literal."""
    k = meta["n_hashes"]
    cols = []
    for j, (value, col_type) in enumerate(probes):
        lit = F.lit(value).cast(col_type)
        cols.extend(
            p.alias(f"p{j}_{i}")
            for i, p in enumerate(
                _positions(lit, k, meta["n_bits"], meta["seed"])
            )
        )
    row = spark.range(1).select(*cols).first()
    return [[row[f"p{j}_{i}"] for i in range(k)] for j in range(len(probes))]


def _probe_positions(
    spark: SparkSession, value, col_type: str, meta: dict
) -> list[int]:
    return _probe_positions_many(spark, [(value, col_type)], meta)[0]


def _gather_eq_probes(preds: list[tuple], meta: dict) -> list[tuple]:
    """(col, value) for every bloom-probed literal in ``preds`` —
    ``=`` values plus each element of an ``in`` list."""
    out = []
    for pred in preds:
        c, op = pred[0], pred[1]
        if c not in meta["col_types"]:
            continue
        if op == "=":
            out.append((c, pred[2]))
        elif op == "in":
            out.extend((c, x) for x in pred[2])
    return out


def _probe_cache(
    spark: SparkSession, preds: list[tuple], meta: dict
) -> dict:
    """{(col, value): positions} for every ``=``/``in`` literal in
    ``preds``, filled with a single one-row job."""
    probes = _gather_eq_probes(preds, meta)
    if not probes:
        return {}
    pos = _probe_positions_many(
        spark, [(v, meta["col_types"][c]) for c, v in probes], meta
    )
    return {key: p for key, p in zip(probes, pos)}


def _bloom_might_contain(
    spark: SparkSession, c: str, value, meta: dict, pos_cache: dict | None = None
) -> Column:
    pos = (pos_cache or {}).get((c, value))
    if pos is None:
        pos = _probe_positions(spark, value, meta["col_types"][c], meta)
    bloom = F.col(f"{c}__bloom")
    cond = F.lit(True)
    for p in pos:
        word, mask = p >> 6, 1 << (p & 63)
        # mask may have bit 63 set -> represent as signed 64-bit like
        # the stored bit_or words
        if mask >= 1 << 63:
            mask -= 1 << 64
        cond = cond & (
            F.coalesce(
                F.element_at(bloom, F.lit(int(word))), F.lit(0).cast("long")
            ).bitwiseAND(F.lit(mask).cast("long"))
            != F.lit(0).cast("long")
        )
    return cond


def _zone_conjunct(
    spark: SparkSession, pred: tuple, meta: dict, pos_cache: dict | None = None
) -> Column:
    """May-match condition over the index row for one predicate.
    NULL zone stats (all-null file for c) make comparisons NULL ->
    treated as no-match, which is correct for non-null probes."""
    c, op, v = pred[0], pred[1], pred[2] if len(pred) > 2 else None
    if c not in meta["col_types"]:
        raise ValueError(f"column {c!r} is not indexed")
    if op not in _OPS:
        raise ValueError(f"unsupported op {op!r}")
    t = meta["col_types"][c]
    mn, mx = F.col(f"{c}__min"), F.col(f"{c}__max")
    nnull, nrows = F.col(f"{c}__nnull"), F.col("n_rows")
    if op == "=":
        lit = F.lit(v).cast(t)
        return (
            (mn <= lit)
            & (mx >= lit)
            & _bloom_might_contain(spark, c, v, meta, pos_cache)
        )
    if op == "in":
        conds = [_zone_conjunct(spark, (c, "=", x), meta, pos_cache) for x in v]
        out = conds[0]
        for cc in conds[1:]:
            out = out | cc
        return out
    if op == "<":
        return mn < F.lit(v).cast(t)
    if op == "<=":
        return mn <= F.lit(v).cast(t)
    if op == ">":
        return mx > F.lit(v).cast(t)
    if op == ">=":
        return mx >= F.lit(v).cast(t)
    if op == "between":
        lo, hi = v
        return (mx >= F.lit(lo).cast(t)) & (mn <= F.lit(hi).cast(t))
    if op == "prefix":
        if t != "string":
            raise ValueError(f"prefix op needs a string column, {c!r} is {t}")
        nxt = _next_prefix(v)
        cond = mx >= F.lit(v)
        if nxt is not None:
            cond = cond & (mn < F.lit(nxt))
        return cond
    if op == "is_null":
        return nnull > 0
    return nrows > nnull  # is_not_null


def residual_filter(preds: list[tuple]) -> Column:
    """The EXACT row-level predicate the spec describes — re-applied to
    every scanned file so index pruning can only shrink IO, never
    change results."""
    out = F.lit(True)
    for pred in preds:
        c, op = pred[0], pred[1]
        v = pred[2] if len(pred) > 2 else None
        col = F.col(c)
        if op == "=":
            out = out & (col == F.lit(v))
        elif op == "in":
            out = out & col.isin(list(v))
        elif op == "<":
            out = out & (col < F.lit(v))
        elif op == "<=":
            out = out & (col <= F.lit(v))
        elif op == ">":
            out = out & (col > F.lit(v))
        elif op == ">=":
            out = out & (col >= F.lit(v))
        elif op == "between":
            out = out & col.between(F.lit(v[0]), F.lit(v[1]))
        elif op == "prefix":
            out = out & col.startswith(v)
        elif op == "is_null":
            out = out & col.isNull()
        elif op == "is_not_null":
            out = out & col.isNotNull()
        else:
            raise ValueError(f"unsupported op {op!r}")
    return out


def prune_files(
    spark: SparkSession, index_path: str, preds: list[tuple]
) -> list[str]:
    """File paths that MAY contain rows matching every predicate
    (conjunction). Runs only over the index table; the collect is the
    surviving path list — metadata-sized by construction."""
    meta = _load_meta(index_path)
    idx = spark.read.parquet(index_path)
    pos_cache = _probe_cache(spark, preds, meta)
    cond = F.lit(True)
    for pred in preds:
        cond = cond & _zone_conjunct(spark, pred, meta, pos_cache)
    return [r["file"] for r in idx.filter(cond).select("file").collect()]


def indexed_files(spark: SparkSession, index_path: str) -> set[str]:
    return {
        _canon(r["file"])
        for r in spark.read.parquet(index_path).select("file").collect()
    }


def read_with_index(
    spark: SparkSession,
    data_path: str,
    index_path: str,
    preds: list[tuple],
) -> DataFrame:
    """Filtered scan of the lake that reads ONLY index survivors plus
    any file the lake gained since the index was built. Bit-exact vs
    ``spark.read.parquet(data_path).filter(residual)`` — the index
    stage prunes files, the residual filter decides rows."""
    full = _lake(spark, data_path)
    current = full.inputFiles()
    current_canon = {_canon(x) for x in current}
    known = indexed_files(spark, index_path)
    unindexed = [f for f in current if _canon(f) not in known]
    survivors = [
        f for f in prune_files(spark, index_path, preds)
        if _canon(f) in current_canon  # dropped files gone
    ]
    paths = survivors + unindexed
    if not paths:
        return full.filter(F.lit(False))
    scan = spark.read.parquet(*paths)
    if set(scan.columns) != set(full.columns):
        # hive-partitioned directory layout: partition values live in
        # the PATH, not the files, so a per-file scan loses them.
        # Correctness over pruning — fall back to the full scan (use a
        # lakehouse format or index physical columns to prune these).
        return full.filter(residual_filter(preds))
    return scan.select(*full.columns).filter(residual_filter(preds))
