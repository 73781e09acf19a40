"""Delta -> Iceberg metadata mirror (the UniForm shape, beyond
reference): ONE physical copy of the data, readable through BOTH
formats.

``mirror_to_iceberg`` translates the Delta table's current state into
an Iceberg snapshot IN THE SAME DIRECTORY — Delta's log lives in
``_delta_log/``, the mirrored Iceberg metadata in ``metadata/``; the
parquet data files are shared byte-for-byte, never copied or
rewritten. After a mirror call, ``read_iceberg(path)`` and
``read_delta(path)`` return the same logical table, and every Iceberg
surface (time travel across mirror points, ``snapshot_files``,
``count_rows_iceberg``, the ``iceberg_lite`` stream source) works
against data written by Delta.

Beyond real UniForm: live DELETION VECTORS are converted — each DV's
roaring bitmap expands (distributed, ``mapInPandas``; a DV is KB-scale
and its expansion is bounded by that file's deleted-row count) into
spec-sorted Iceberg position-delete files committed in the SAME
snapshot, so merge-on-read Delta state mirrors exactly. Databricks'
UniForm simply refuses DV tables.

Scale shape: the mirror is metadata work plus one grouped bounds
aggregate over the live files (``_batch_bounds`` — one job, one
collect of file-count-sized rows) and one distributed DV expansion;
no data file is read row-by-row, none is rewritten.

Guards (honest v1 limits):
- partitioned Delta tables are refused — Delta stores partition values
  in directory paths, not file content, and the ``iceberg_lite``
  reader resolves columns from file content;
- ``delta.columnMapping.mode != 'none'`` is refused — mirrored readers
  resolve by physical parquet names;
- don't run :func:`..iceberg.remove_orphan_files` against a mirrored
  path: the Iceberg view cannot see files only Delta's history
  references.

Each call writes one Iceberg snapshot describing Delta's CURRENT
state (summary carries ``delta-mirror-version``); repeated calls after
Delta commits produce an Iceberg history whose time travel follows the
mirror points.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .deltalog import _dv_positions_df, load_snapshot
from .iceberg import (
    _batch_bounds,
    _commit_planned_iceberg,
    _plan_write_iceberg,
    _write_position_delete_files,
)


def mirror_to_iceberg(
    spark: SparkSession,
    path: str,
    *,
    commit_ts: int = 0,
) -> int:
    """Publish the Delta table's current state as an Iceberg snapshot
    over the SAME data files; returns the new snapshot id."""
    snap = load_snapshot(spark, path)
    if snap.partition_columns:
        raise NotImplementedError(
            "mirror of partitioned Delta tables: partition values live "
            "in directory paths, not file content"
        )
    if snap.column_mapping_mode != "none":
        raise NotImplementedError(
            "mirror of columnMapping tables: mirrored readers resolve "
            "physical parquet names"
        )

    schema = snap.schema()
    plan = _plan_write_iceberg(
        path, schema, mode="overwrite", partition_col=None,
        partition_transform="identity", merge_schema=True,
        allow_spec_evolution=False,
    )
    new_v = plan["new_v"]

    adds = list(snap.adds.values())

    # bounds from Delta's OWN per-file stats wherever present — the
    # mirror is then PURE metadata (zero data IO; the 100 TB shape).
    # Both sides render stats through the same json.dumps(default=str)
    # path, so the bounds_json the Iceberg stats_filter parses is
    # byte-compatible. Files without stats (foreign writers) fall back
    # to one grouped aggregate.
    num_str = {
        f.name for f in schema.fields
        if f.dataType.simpleString() in
        ("int", "bigint", "double", "float", "string")
    }
    import json as _json

    by_rel: dict[str, tuple[str, int]] = {}
    need_scan: list[str] = []
    for a in adds:
        st = _json.loads(a["stats"]) if a.get("stats") else {}
        n = st.get("numRecords")
        mn, mx = st.get("minValues") or {}, st.get("maxValues") or {}
        if n is None or not num_str <= (set(mn) & set(mx)):
            need_scan.append(a["path"])
            continue
        bounds = {c: [mn[c], mx[c]] for c in sorted(num_str)}
        by_rel[a["path"]] = (
            _json.dumps(bounds, default=str), int(n)
        )
    if need_scan:
        scanned = _batch_bounds(
            spark, [os.path.join(path, r) for r in need_scan], schema
        )
        for r in need_scan:
            by_rel[r] = scanned[os.path.join(path, r)]
    staged = [
        (rel, None, *by_rel[rel]) for rel in sorted(by_rel)
    ]

    # live deletion vectors -> same-snapshot position-delete files
    del_entries = None
    dv_adds = [a for a in adds if a.get("deletionVector")]
    if dv_adds:
        n_del = sum(
            int(a["deletionVector"].get("cardinality") or 0)
            for a in dv_adds
        )
        name_to_rel = spark.createDataFrame(
            [(os.path.basename(a["path"]), a["path"]) for a in dv_adds],
            "_dv_name string, file_path string",
        )
        pairs = (
            _dv_positions_df(spark, path, dv_adds)
            .join(F.broadcast(name_to_rel), "_dv_name")
            .select("file_path", F.col("_dv_pos").alias("pos"))
        )
        del_entries = _write_position_delete_files(
            spark, path, pairs, new_v, n_del
        )

    return _commit_planned_iceberg(
        path, plan, staged, mode="overwrite", commit_ts=commit_ts,
        position_delete_entries=del_entries,
        summary_extra={"delta-mirror-version": str(snap.version)},
    )
