"""Lakehouse snapshot tables on plain parquet — the Iceberg/Delta shape
without the runtime (VERDICT r3 item 8; ROADMAP items 22/26).

Neither Iceberg nor Delta jars exist in this runtime, but the thing that
makes a lakehouse table a *table* is not the jar — it is the metadata
protocol: an ordered chain of immutable snapshot files, each listing the
exact data files (with partition values and column stats) that make up
the table at that version. This module implements that protocol on
JSON + parquet:

    table/
      data/<partition>=<value>/part-....parquet     (immutable)
      metadata/v00001.json, v00002.json, ...        (snapshots)
      metadata/_current                             (atomic pointer)

Each snapshot JSON records: version, parent version, commit timestamp
(caller-supplied — determinism contract), operation, and the FULL
manifest: one entry per live data file with its partition tuple, row
count and per-column min/max. Appends write new files + a new snapshot
listing old+new; deletes/overwrites write a snapshot listing fewer
files; nothing is ever mutated — exactly Iceberg's append/replace
semantics (format spec v2, public), minus Avro manifests.

Read path = real lakehouse planning, scaled: the driver reads ONE small
JSON (manifests are metadata-sized, not data-sized), prunes the file
list against the caller's partition predicate — so Spark never even
*lists* non-matching files, the same win Iceberg partition pruning
gives over directory listing — then hands the surviving files to the
parquet scan, where Catalyst's usual pushdown/pruning still applies.
Time travel is choosing which JSON to read (``version=`` or
``as_of_ts=``); every historical version stays readable because data
files are immutable.

Reference parity: the reference pipeline re-reads whole measurement
directories per run (SengerM/ETL_market_survey utils.py path scans);
this is its catalog story upgraded to versioned, pruned scans.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_current"


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _data_dir(path: str) -> str:
    return os.path.join(path, "data")


def _snapshot_path(path: str, version: int) -> str:
    return os.path.join(_meta_dir(path), f"v{version:05d}.json")


def _read_current_version(path: str) -> int:
    cur = os.path.join(_meta_dir(path), _CURRENT)
    if not os.path.exists(cur):
        return 0
    with open(cur) as f:
        return int(f.read().strip())


def _load_snapshot(path: str, version: int) -> dict:
    with open(_snapshot_path(path, version)) as f:
        return json.load(f)


def _stats_for_file(spark: SparkSession, fpath: str, stat_cols: list[str]) -> dict:
    from pyspark.sql import functions as F

    df = spark.read.parquet(fpath)
    aggs = [F.count("*").alias("_n")]
    for c in stat_cols:
        if c in df.columns:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    row = df.agg(*aggs).collect()[0].asDict()
    stats = {"row_count": row.pop("_n")}
    stats["bounds"] = {
        c: [row.get(f"min_{c}"), row.get(f"max_{c}")]
        for c in stat_cols
        if f"min_{c}" in row
    }
    return stats


def commit_snapshot(
    spark: SparkSession,
    path: str,
    df: DataFrame | None,
    *,
    operation: str = "append",
    partition_col: str | None = None,
    commit_ts: int = 0,
    stat_cols: list[str] | None = None,
    delete_partition_values=None,
) -> int:
    """Write a new table snapshot and return its version.

    - ``operation='append'``: write ``df``'s rows as new immutable data
      files (one per partition value when ``partition_col`` is set) and
      commit old manifest + new entries.
    - ``operation='overwrite'``: commit a manifest of only the new files.
    - ``operation='delete'``: no new files; commit the parent manifest
      minus entries whose partition value is in
      ``delete_partition_values``.

    ``commit_ts`` is caller-supplied (integer, e.g. epoch seconds or a
    logical clock) so table history is deterministic — the same reason
    the streaming sinks take explicit batch ids.
    """
    os.makedirs(_meta_dir(path), exist_ok=True)
    os.makedirs(_data_dir(path), exist_ok=True)
    parent = _read_current_version(path)
    version = parent + 1
    prev_entries = _load_snapshot(path, parent)["manifest"] if parent else []

    new_entries = []
    if operation in ("append", "overwrite"):
        if df is None:
            raise ValueError(f"{operation} requires a dataframe")
        stat_cols = stat_cols or []
        if partition_col is not None:
            values = [r[0] for r in df.select(partition_col).distinct().collect()]
            for v in sorted(values, key=str):
                fname = f"part-{uuid.uuid5(uuid.NAMESPACE_URL, f'{version}|{v}').hex}.parquet"
                fdir = os.path.join(_data_dir(path), fname)
                part_df = df.filter(df[partition_col] == v)
                part_df.coalesce(1).write.mode("overwrite").parquet(fdir)
                new_entries.append(
                    {
                        "file": os.path.relpath(fdir, path),
                        "partition": {partition_col: v},
                        **_stats_for_file(spark, fdir, stat_cols),
                    }
                )
        else:
            fname = f"part-{uuid.uuid5(uuid.NAMESPACE_URL, str(version)).hex}.parquet"
            fdir = os.path.join(_data_dir(path), fname)
            df.write.mode("overwrite").parquet(fdir)
            new_entries.append(
                {
                    "file": os.path.relpath(fdir, path),
                    "partition": {},
                    **_stats_for_file(spark, fdir, stat_cols),
                }
            )

    if operation == "append":
        manifest = prev_entries + new_entries
    elif operation == "overwrite":
        manifest = new_entries
    elif operation == "delete":
        gone = set(map(str, delete_partition_values or []))
        manifest = [
            e
            for e in prev_entries
            if not any(str(v) in gone for v in e["partition"].values())
        ]
    else:
        raise ValueError(f"unknown operation {operation!r}")

    snap = {
        "version": version,
        "parent": parent or None,
        "commit_ts": int(commit_ts),
        "operation": operation,
        "manifest": manifest,
    }
    with open(_snapshot_path(path, version), "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    # atomic-enough pointer swap (single writer; real systems CAS this)
    tmp = os.path.join(_meta_dir(path), f"{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_meta_dir(path), _CURRENT))
    return version


def table_history(path: str) -> list[dict]:
    """All snapshots oldest-first: (version, parent, commit_ts,
    operation, n_files, row_count)."""
    out = []
    for v in range(1, _read_current_version(path) + 1):
        s = _load_snapshot(path, v)
        out.append(
            {
                "version": s["version"],
                "parent": s["parent"],
                "commit_ts": s["commit_ts"],
                "operation": s["operation"],
                "n_files": len(s["manifest"]),
                "row_count": sum(e["row_count"] for e in s["manifest"]),
            }
        )
    return out


def read_snapshot(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    as_of_ts: int | None = None,
    partition_filter: dict | None = None,
    bounds_filter: dict | None = None,
    merge_schema: bool = True,
) -> DataFrame:
    """Read the table at a snapshot (current by default; time-travel via
    ``version=`` or ``as_of_ts=`` — the newest snapshot with
    ``commit_ts <= as_of_ts``).

    ``partition_filter`` ({col: value} or {col: [values...]}) prunes the
    FILE LIST on the driver before Spark sees it — manifest-metadata
    pruning, the lakehouse fast path. Partition columns are stored in
    the data files themselves, so surviving files need no path parsing.

    ``bounds_filter`` ({col: value} or {col: (lo, hi)} inclusive) prunes
    by the per-file min/max recorded for ``stat_cols`` at commit time —
    zone maps over NON-partition columns (Iceberg's column-stats
    skipping). Sound only as a pruning step: a surviving file may still
    contain no matching rows, so callers apply the real predicate too
    (the usual contract — this filter only discards files that provably
    cannot match; files with no recorded bounds are kept).

    Returns an empty-manifest read as an empty DataFrame of the newest
    file's schema if no file survives (caller's responsibility to have
    committed at least once)."""
    if version is not None and as_of_ts is not None:
        raise ValueError("pass either version or as_of_ts, not both")
    current = _read_current_version(path)
    if current == 0:
        raise ValueError(f"no snapshots at {path}")
    if version is None:
        if as_of_ts is None:
            version = current
        else:
            version = 0
            for v in range(1, current + 1):
                if _load_snapshot(path, v)["commit_ts"] <= as_of_ts:
                    version = v
            if version == 0:
                raise ValueError(f"no snapshot at or before ts {as_of_ts}")
    snap = _load_snapshot(path, version)
    entries = snap["manifest"]
    if partition_filter:
        norm = {
            k: set(map(str, v if isinstance(v, (list, tuple, set)) else [v]))
            for k, v in partition_filter.items()
        }
        entries = [
            e
            for e in entries
            if all(
                k in e["partition"] and str(e["partition"][k]) in vals
                for k, vals in norm.items()
            )
        ]
    if bounds_filter:
        def survives(e: dict) -> bool:
            for col, want in bounds_filter.items():
                b = e.get("bounds", {}).get(col)
                if not b or b[0] is None or b[1] is None:
                    continue  # no stats recorded -> cannot prune
                lo, hi = (want if isinstance(want, (tuple, list)) else (want, want))
                if (hi is not None and b[0] > hi) or (
                    lo is not None and b[1] < lo
                ):
                    return False
            return True

        entries = [e for e in entries if survives(e)]
    files = [os.path.join(path, e["file"]) for e in entries]
    reader = spark.read
    if merge_schema:
        # schema EVOLUTION across commits: without mergeSchema, Spark
        # takes the first file's footer and silently drops columns added
        # by later appends — the classic lakehouse data-loss trap
        reader = reader.option("mergeSchema", "true")
    if not files:
        # preserve schema by reading the full manifest's first file 0-rows
        all_files = [os.path.join(path, e["file"]) for e in snap["manifest"]]
        if not all_files:
            raise ValueError(f"snapshot v{version} is empty and schema unknown")
        return reader.parquet(*all_files).limit(0)
    return reader.parquet(*files)


def compact_snapshot(
    spark: SparkSession,
    path: str,
    *,
    target_rows: int,
    commit_ts: int,
    stat_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: within each partition tuple, next-fit-pack
    the current snapshot's files into bins of ~``target_rows`` and
    rewrite every multi-file bin as one new data file; commit the result
    as a ``compact`` snapshot. Logical content is unchanged (same rows),
    single-file bins keep their original immutable file, and partition
    boundaries are never crossed — manifest pruning works exactly as
    before. Returns the new version.

    This is the maintenance loop every lakehouse runs (Iceberg
    rewrite_data_files / Delta OPTIMIZE): at 100 TB the cost model is
    driven by file count, and the protocol makes compaction just
    another immutable commit — time travel to pre-compaction versions
    still reads the old files."""
    current = _read_current_version(path)
    if current == 0:
        raise ValueError(f"no snapshots at {path}")
    snap = _load_snapshot(path, current)
    by_part: dict[tuple, list[dict]] = {}
    for e in snap["manifest"]:
        key = tuple(sorted(e["partition"].items()))
        by_part.setdefault(key, []).append(e)

    new_manifest: list[dict] = []
    stat_cols = stat_cols or []
    n_bin = 0
    for key in sorted(by_part, key=str):
        entries = sorted(by_part[key], key=lambda e: e["file"])
        bins: list[list[dict]] = []
        cur: list[dict] = []
        cur_rows = 0
        for e in entries:  # next-fit in file-name order (deterministic)
            if cur and cur_rows + e["row_count"] > target_rows:
                bins.append(cur)
                cur, cur_rows = [], 0
            cur.append(e)
            cur_rows += e["row_count"]
        if cur:
            bins.append(cur)
        for b in bins:
            if len(b) == 1:
                new_manifest.append(b[0])
                continue
            n_bin += 1
            files = [os.path.join(path, e["file"]) for e in b]
            fname = f"compact-{uuid.uuid5(uuid.NAMESPACE_URL, f'{current + 1}|{n_bin}').hex}.parquet"
            fdir = os.path.join(_data_dir(path), fname)
            spark.read.parquet(*files).coalesce(1).write.mode(
                "overwrite"
            ).parquet(fdir)
            new_manifest.append(
                {
                    "file": os.path.relpath(fdir, path),
                    "partition": dict(key),
                    **_stats_for_file(spark, fdir, stat_cols),
                }
            )

    version = current + 1
    out = {
        "version": version,
        "parent": current,
        "commit_ts": int(commit_ts),
        "operation": "compact",
        "manifest": new_manifest,
    }
    with open(_snapshot_path(path, version), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tmp = os.path.join(_meta_dir(path), f"{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_meta_dir(path), _CURRENT))
    return version


def read_incremental(
    spark: SparkSession,
    path: str,
    *,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental scan: rows in data files ADDED strictly after
    ``from_version`` up to ``to_version`` (current by default) — the
    Iceberg incremental-append read that turns a snapshot table into a
    micro-batch source ("process only what's new since my last
    checkpoint"). Only valid across append/compact history: if any
    intermediate snapshot deleted or overwrote files, the file-set
    difference under-represents the logical change — use
    :func:`snapshot_changes` there. Raises in that case.
    """
    current = _read_current_version(path)
    to_version = current if to_version is None else to_version
    if not 0 <= from_version <= to_version <= current:
        raise ValueError(f"bad version range {from_version}..{to_version}")
    for v in range(from_version + 1, to_version + 1):
        op = _load_snapshot(path, v)["operation"]
        if op not in ("append", "compact"):
            raise ValueError(
                f"incremental read crosses a '{op}' snapshot (v{v}); "
                "use snapshot_changes for logical diffs"
            )
    old_files = (
        {e["file"] for e in _load_snapshot(path, from_version)["manifest"]}
        if from_version
        else set()
    )
    new = _load_snapshot(path, to_version)["manifest"]
    # compaction rewrites old rows into new files — exclude any file
    # whose rows all came from files present at from_version by reading
    # only files introduced by APPEND snapshots in the range
    appended: set[str] = set()
    for v in range(from_version + 1, to_version + 1):
        snap = _load_snapshot(path, v)
        prev = (
            {e["file"] for e in _load_snapshot(path, v - 1)["manifest"]}
            if v > 1
            else set()
        )
        if snap["operation"] == "append":
            appended |= {e["file"] for e in snap["manifest"]} - prev
    files = [
        os.path.join(path, e["file"])
        for e in new
        if e["file"] in appended and e["file"] not in old_files
    ]
    if not files:
        all_files = [os.path.join(path, e["file"]) for e in new]
        if not all_files:
            raise ValueError("empty table")
        return spark.read.parquet(all_files[0]).limit(0)
    return spark.read.parquet(*files)


def snapshot_changes(
    spark: SparkSession,
    path: str,
    *,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Logical change feed between two versions — full-outer diff on
    ``keys`` over the materialized snapshots (works across deletes and
    overwrites, unlike :func:`read_incremental`). Output = the
    ``operators/merge.snapshot_diff`` shape: every row with a
    ``change_type`` in insert/delete/update/unchanged."""
    from ..operators.merge import snapshot_diff

    old = read_snapshot(spark, path, version=from_version)
    new = read_snapshot(spark, path, version=to_version)
    return snapshot_diff(old, new, keys=keys)
