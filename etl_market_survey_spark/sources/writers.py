"""Sinks (SURVEY §2.1 K1-K4).

K1 Parquet (the reference's Feather role), K2 CSV for small result frames,
K3 Excel catalog export, K4 ``key = value`` text sidecars. Plot sinks (K5)
are out of engine scope — the engine delivers the aggregated frames.

Big data -> partitioned Parquet; CSV/Excel/sidecars are for *small result*
tables only (the reference uses them the same way), hence the row-count
guard rather than silent driver OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SMALL_RESULT_MAX_ROWS = 1_000_000


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    """K1 — partitioned columnar sink; emits _SUCCESS (the engine's marker)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
):
    """Bucketed managed table: co-locates join/agg keys on disk so a
    subsequent equi-join or groupBy on ``bucket_cols`` needs NO shuffle
    (both sides pre-hashed into the same bucket layout). The 100 TB
    fact⋈fact strategy when broadcast is impossible.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = True):
    """K2 — CSV result sink; coalesce(1) for the reference's one-file layout."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_excel(df: DataFrame, path: str):
    """K3 — catalog export (measurements.py:304). Small frames only.

    Prefers ``pandas.to_excel`` (openpyxl); falls back to the stdlib
    zip+XML writer in :mod:`.xlsx` when no Excel engine is installed."""
    _guard_small(df)
    pdf = df.toPandas()
    try:
        pdf.to_excel(path, index=False)
    except (ImportError, ModuleNotFoundError):
        from .xlsx import write_xlsx

        write_xlsx(
            path,
            [str(c) for c in pdf.columns],
            [list(r) for r in pdf.itertuples(index=False, name=None)],
        )


def write_text_sidecar(scalars: dict[str, float], path: str):
    """K4 — ``key = value`` scalar sidecar (fit_erf...py:175-177)."""
    with open(path, "w") as f:
        for k, v in scalars.items():
            f.write(f"{k} = {v}\n")


def _guard_small(df: DataFrame):
    n = df.limit(SMALL_RESULT_MAX_ROWS + 1).count()
    if n > SMALL_RESULT_MAX_ROWS:
        raise ValueError(
            f"refusing driver-side export of {n}+ rows; use write_parquet"
        )


def write_feather(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str = "zstd",
    max_chunksize: int = 1 << 16,
) -> int:
    """Feather v2 / Arrow-IPC SINK — the write half of
    :func:`..readers.read_feather` (the reference's primary format,
    measurements.py:66-87): EACH SPARK PARTITION writes one ``.fd``
    file from inside its own task (Arrow batches stream straight to
    the IPC writer — no driver funnel, no toPandas), producing a
    multi-file feather lake the record-batch-parallel reader scans
    back. Files are chunked at ``max_chunksize`` rows so the read side
    has batch-level parallelism even within one file. Returns the
    number of files written.

    Tasks write to temp names and rename on success; ``mode`` follows
    the Spark convention ('overwrite' clears the directory,
    'error' refuses a non-empty one, 'append' adds files — uuid names
    never collide)."""
    import os
    import shutil
    import uuid as _uuid

    if mode not in ("overwrite", "append", "error"):
        raise ValueError(f"unknown mode {mode!r}")
    if os.path.exists(path):
        existing = [f for f in os.listdir(path) if f.endswith(".fd")]
        if mode == "overwrite":
            shutil.rmtree(path)
        elif mode == "error" and existing:
            raise FileExistsError(f"{path} already holds feather files")
    os.makedirs(path, exist_ok=True)

    comp = compression
    chunk = int(max_chunksize)
    dest = path

    def sink(batch_iter):
        import pyarrow as _pa

        writer = None
        tmp = None
        final = None
        n = 0
        for b in batch_iter:
            if writer is None:
                name = f"part-{_uuid.uuid4().hex}.fd"
                final = os.path.join(dest, name)
                tmp = final + ".tmp"
                writer = _pa.ipc.new_file(
                    tmp, b.schema,
                    options=_pa.ipc.IpcWriteOptions(compression=comp),
                )
            for off in range(0, b.num_rows, chunk):
                writer.write_batch(b.slice(off, chunk))
            n += b.num_rows
        if writer is not None:
            writer.close()
            os.replace(tmp, final)
            yield _pa.RecordBatch.from_pydict(
                {"file": _pa.array([os.path.basename(final)]),
                 "rows": _pa.array([n], _pa.int64())}
            )

    stats = df.mapInArrow(sink, "file string, rows long").collect()
    return len(stats)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by=None
):
    """JSON-lines sink (one document object per line, partitioned like
    the parquet sink — jsonl is the interchange format LLM tooling
    expects; parquet stays the internal format)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None):
    """ORC sink — native columnar alternative when the downstream stack
    is Hive/Presto-flavored; same layout options as the parquet sink."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)
