"""``iceberg_lite`` — a registerable Spark Python Data Source over the
:mod:`.iceberg` wire format (Avro manifests + parquet), the batch twin
of :mod:`.pyds`'s ``delta_lite``:

    spark.dataSource.register(IcebergLiteDataSource)
    spark.read.format("iceberg_lite").load(path)
    spark.read.format("iceberg_lite").option("snapshotId", s).load(path)

Planning is pure Python on the driver (the Avro codec in
:mod:`.avro` needs no JVM; metadata JSON needs no SparkSession);
scanning is pyarrow in the Python workers — one input partition per
live data file, so Spark owns scheduling and parallelism.

Merge-on-read inside the reader:
- position deletes (content=1): each partition reads the delete
  parquet(s) and drops its own file's row indexes. The delete files
  are re-read per partition — KB-scale metadata by construction here;
  a production reader would push per-file delete spans into the
  partition instead.
- equality deletes (content=2): pandas anti-join on the equality
  columns, scoped by data sequence number (rows from files committed
  at or after the delete survive — the reborn-key rule).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _pure_spark_schema(meta: dict):
    """Iceberg schema -> StructType WITHOUT an active SparkContext
    (``iceberg._spark_schema`` parses DDL through the JVM; data-source
    methods run in plain Python workers where none exists)."""
    from pyspark.sql import types as T

    m = {
        "long": T.LongType(), "int": T.IntegerType(),
        "string": T.StringType(), "double": T.DoubleType(),
        "float": T.FloatType(), "boolean": T.BooleanType(),
        "binary": T.BinaryType(), "date": T.DateType(),
        "timestamp": T.TimestampType(), "timestamptz": T.TimestampType(),
    }
    schema = meta.get("schema") or (meta.get("schemas") or [{}])[0]
    fields = []
    for f in schema.get("fields", []):
        t = f["type"]
        if not isinstance(t, str) or t not in m:
            raise ValueError(f"unsupported Iceberg type {t!r}")
        fields.append(
            T.StructField(f["name"], m[t], not f.get("required", False))
        )
    return T.StructType(fields)


class _IceFilePartition(InputPartition):
    def __init__(self, table_path, rel, seq, fields, pos_delete_rels,
                 eq_deletes, split=None):
        self.table_path = table_path
        self.rel = rel
        self.seq = int(seq or 0)
        self.fields = fields  # [(name, spark_type_json)] in schema order
        self.pos_delete_rels = pos_delete_rels  # [rel]
        # [(rel, seq, [equality col names])]
        self.eq_deletes = eq_deletes
        # (i, n): read the i-th of n contiguous row-group chunks —
        # how one huge file fans out across tasks (planned from the
        # manifest's record_count; chunk bounds from the footer the
        # task opens anyway)
        self.split = split


def _ice_splits(record_count, max_rows: int) -> list:
    """Split specs for a file of ``record_count`` rows: [None] when it
    fits one task, else [(i, n)] chunks."""
    try:
        rc = int(record_count or 0)
    except (TypeError, ValueError):
        rc = 0
    if max_rows <= 0 or rc <= max_rows:
        return [None]
    n = -(-rc // max_rows)
    return [(i, n) for i in range(n)]


def _pa_type(tjson):
    from .pyds import _pa_type as _pt

    return _pt(tjson)


def _read_ice_partition(p: _IceFilePartition):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = [n for n, _ in p.fields]
    fpath = os.path.join(p.table_path, p.rel)
    # schema evolution: pre-evolution files lack new columns — request
    # what exists, null-fill the rest below
    pf = pq.ParquetFile(fpath)
    have = set(pf.schema_arrow.names)
    cols = [n for n in names if n in have]
    split = getattr(p, "split", None)
    row_offset = 0
    if split is None:
        tbl = pq.read_table(fpath, columns=cols)
    else:
        i, n = split
        n_rg = pf.metadata.num_row_groups
        lo = (n_rg * i) // n
        hi = (n_rg * (i + 1)) // n
        row_offset = sum(
            pf.metadata.row_group(g).num_rows for g in range(lo)
        )
        if lo >= hi:
            tbl = pf.schema_arrow.empty_table().select(cols)
        else:
            tbl = pf.read_row_groups(list(range(lo, hi)), columns=cols)
    base = os.path.basename(p.rel)

    if p.pos_delete_rels:
        dead: list[int] = []
        for rel in p.pos_delete_rels:
            dt = pq.read_table(
                os.path.join(p.table_path, rel),
                columns=["file_path", "pos"],
            )
            fp = np.asarray(
                [os.path.basename(x) for x in dt.column("file_path").to_pylist()]
            )
            pos = np.asarray(dt.column("pos").to_pylist(), dtype=np.int64)
            dead.extend(pos[fp == base].tolist())
        if dead:
            mask = np.ones(tbl.num_rows, dtype=bool)
            d = np.asarray(dead, dtype=np.int64) - row_offset
            d = d[(d >= 0) & (d < tbl.num_rows)]
            mask[d] = False
            tbl = tbl.filter(pa.array(mask))

    for rel, dseq, cols in p.eq_deletes:
        if not (p.seq < dseq) or tbl.num_rows == 0:
            continue  # out of scope: this file is newer than the delete
        keys = pq.read_table(
            os.path.join(p.table_path, rel), columns=cols
        ).to_pandas()
        pdf = tbl.to_pandas()
        merged = pdf.merge(
            keys.drop_duplicates(), on=cols, how="left", indicator=True
        )
        tbl = pa.Table.from_pandas(
            merged[merged["_merge"] == "left_only"][
                [c for c in pdf.columns]
            ],
            preserve_index=False,
        )

    yield from _cast_to_fields(tbl, p.fields).to_batches(
        max_chunksize=1 << 16
    )


def _cast_to_fields(tbl, fields):
    """Project/cast a pyarrow table to the pinned field list (schema
    evolution: absent columns null-fill)."""
    import pyarrow as pa

    names = [n for n, _ in fields]
    arrays = [
        tbl.column(n).cast(_pa_type(t)).combine_chunks()
        if n in tbl.column_names
        else pa.array([None] * tbl.num_rows, type=_pa_type(t))
        for n, t in fields
    ]
    return pa.table(dict(zip(names, arrays))).select(names)


def _load_raw(table_path: str, rel: str, fields):
    """Raw file rows (NO deletes applied), cast to the field list."""
    import pyarrow.parquet as pq

    fpath = os.path.join(table_path, rel)
    names = [n for n, _ in fields]
    have = set(pq.ParquetFile(fpath).schema_arrow.names)
    return _cast_to_fields(
        pq.read_table(fpath, columns=[n for n in names if n in have]),
        fields,
    )


class _IcebergLiteReader(DataSourceReader):
    def __init__(self, path: str, snapshot_id: int | None,
                 max_rows: int = 2_000_000):
        self.path = path
        self.snapshot_id = snapshot_id
        self.max_rows = max_rows
        self.pushed = []  # single-column comparison filters

    def pushFilters(self, filters):
        """FILE-level pruning, transform-aware (the delta_lite shape):
        filters on a source column prune via the manifest partition
        tuple — EqualTo/In map through ANY spec transform (incl.
        bucket); range filters map through MONOTONIC transforms
        (identity/truncate/days/hours) with strict bounds weakened to
        non-strict on the transformed value — and via the per-file
        bounds_json min/max. All filters stay Spark-side (partially
        pushed: file pruning is coarse, rows keep the residual)."""
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            if isinstance(
                f, (EqualTo, In, GreaterThan, GreaterThanOrEqual,
                    LessThan, LessThanOrEqual)
            ) and len(f.attribute) == 1:
                self.pushed.append(f)
            yield f

    def _may_match(self, fentry, meta, spec_by_src, id_types) -> bool:
        import json as _json

        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan,
            LessThanOrEqual,
        )

        from .iceberg_transforms import transform_value
        from .pyds import _interval_disjoint

        part = fentry.get("partition") or {}
        bounds = None
        if fentry.get("bounds_json"):
            try:
                bounds = _json.loads(fentry["bounds_json"])
            except (TypeError, ValueError):
                bounds = None
        for flt in self.pushed:
            col = flt.attribute[0]
            spec = spec_by_src.get(col)
            if spec is not None and spec["name"] in part:
                kind, param = spec["kind"], spec["param"]
                src_t = id_types.get(spec["source-id"])
                pv = part[spec["name"]]
                try:
                    if isinstance(flt, EqualTo):
                        if flt.value is not None and pv != transform_value(
                            kind, param, flt.value, src_t
                        ):
                            return False
                    elif isinstance(flt, In):
                        tv = {
                            transform_value(kind, param, x, src_t)
                            for x in flt.value if x is not None
                        }
                        if tv and pv not in tv:
                            return False
                    elif kind != "bucket" and flt.value is not None:
                        # monotonic transform: map the bound, weaken
                        # strict to non-strict (a truncated bucket can
                        # straddle the original strict boundary)
                        tb = transform_value(kind, param, flt.value, src_t)
                        weak = {
                            GreaterThan: GreaterThanOrEqual,
                            LessThan: LessThanOrEqual,
                        }.get(type(flt), type(flt))
                        if _interval_disjoint(
                            pv, pv, weak(flt.attribute, tb)
                        ):
                            return False
                except (TypeError, ValueError):
                    pass  # un-transformable filter value: keep the file
            if bounds and col in bounds:
                lo, hi = bounds[col]
                if _interval_disjoint(lo, hi, flt):
                    return False
        return True

    def partitions(self):
        from .iceberg import (
            _load_metadata,
            snapshot_delete_files,
            snapshot_files,
        )

        meta = _load_metadata(self.path)
        st = _pure_spark_schema(meta)
        import json as _json

        fields = [(f.name, _json.loads(f.dataType.json())) for f in st.fields]
        id_to_name = {
            f["id"]: f["name"]
            for f in (
                meta.get("schema") or (meta.get("schemas") or [{}])[0]
            ).get("fields", [])
        }
        dels = snapshot_delete_files(self.path, snapshot_id=self.snapshot_id)
        pos_rels = [d["file_path"] for d in dels if d.get("content") == 1]
        eq = [
            (
                d["file_path"],
                int(d.get("_seq") or 0),
                [id_to_name[i] for i in (d.get("equality_ids") or [])],
            )
            for d in dels
            if d.get("content") == 2
        ]
        from .iceberg_transforms import parse_transform

        id_types = {
            f["id"]: f["type"]
            for f in (
                meta.get("schema") or (meta.get("schemas") or [{}])[0]
            ).get("fields", [])
        }
        spec_by_src = {}
        for sp in meta.get("partition-specs") or []:
            for f in sp.get("fields", []):
                kind, param = parse_transform(f.get("transform", "identity"))
                spec_by_src[id_to_name.get(f["source-id"])] = {
                    "name": f["name"], "kind": kind, "param": param,
                    "source-id": f["source-id"],
                }
        return [
            _IceFilePartition(
                self.path, f["file_path"], f.get("_seq"), fields,
                pos_rels, eq, split=s,
            )
            for f in sorted(
                snapshot_files(self.path, snapshot_id=self.snapshot_id),
                key=lambda x: x["file_path"],
            )
            if self._may_match(f, meta, spec_by_src, id_types)
            for s in _ice_splits(f.get("record_count"), self.max_rows)
        ]

    def read(self, partition):
        yield from _read_ice_partition(partition)


class _IcebergLitePlainReader(_IcebergLiteReader):
    """Pushdown-free variant for sessions where Spark's
    ``spark.sql.python.filterPushdown.enabled`` is off (Spark rejects
    readers that IMPLEMENT pushFilters there); selected via
    ``.option("pushdown", "false")``. Re-binding the BASE class's
    pushFilters makes Spark's override detection see a non-implementer
    while partitions() still runs with an empty pushed set."""

    pushFilters = DataSourceReader.pushFilters


class _IceChangePartition(InputPartition):
    """One streamed CHANGE work item — the partition-planned form of one
    term in the batch changelog algebra (iceberg.read_iceberg_changes,
    replayed per commit):

    - kind='insert':   raw rows of a data file newly added at sid
    - kind='dropped':  rows LIVE at the previous snapshot of a data file
                       that left the live set (previous pos/eq deletes
                       applied — already-dead rows are not re-emitted)
    - kind='posmatch': row-exact deletes — the explicit positions a NEW
                       position-delete file names in this data file
    - kind='eqmatch':  key-matched deletes — rows of this (older-seq)
                       data file matching a NEW equality-delete file
    """

    def __init__(self, kind, table_path, rel, fields, snapshot_id, ts,
                 seq=0, pos_delete_rels=(), eq_deletes=(),
                 positions=(), eq_rel=None, eq_cols=()):
        self.kind = kind
        self.table_path = table_path
        self.rel = rel
        self.fields = fields
        self.snapshot_id = int(snapshot_id)
        self.ts = int(ts)
        self.seq = int(seq or 0)
        self.pos_delete_rels = list(pos_delete_rels)
        self.eq_deletes = list(eq_deletes)
        self.positions = list(positions)
        self.eq_rel = eq_rel
        self.eq_cols = list(eq_cols)


def _read_ice_change_partition(p: _IceChangePartition):
    import pyarrow as pa
    import pyarrow.parquet as pq

    def with_meta(tbl):
        ct = "insert" if p.kind == "insert" else "delete"
        n = tbl.num_rows
        return (
            tbl.append_column(
                "_change_type", pa.array([ct] * n, type=pa.string())
            )
            .append_column(
                "_snapshot_id",
                pa.array([p.snapshot_id] * n, type=pa.int64()),
            )
            .append_column(
                "_commit_timestamp",
                pa.array([p.ts] * n, type=pa.int64()),
            )
        )

    if p.kind in ("insert", "dropped"):
        fp = _IceFilePartition(
            p.table_path, p.rel, p.seq, p.fields,
            p.pos_delete_rels if p.kind == "dropped" else [],
            p.eq_deletes if p.kind == "dropped" else [],
        )
        batches = list(_read_ice_partition(fp))
        tbl = (
            pa.Table.from_batches(batches)
            if batches
            else _cast_to_fields(pa.table({}), p.fields)
        )
    elif p.kind == "posmatch":
        tbl = _load_raw(p.table_path, p.rel, p.fields)
        idx = [i for i in sorted(p.positions) if i < tbl.num_rows]
        tbl = tbl.take(pa.array(idx, type=pa.int64()))
    elif p.kind == "eqmatch":
        tbl = _load_raw(p.table_path, p.rel, p.fields)
        keys = pq.read_table(
            os.path.join(p.table_path, p.eq_rel), columns=p.eq_cols
        ).to_pandas()
        pdf = tbl.to_pandas()
        # INNER join (not deduped) — the batch changelog's exact
        # semantics: a key listed twice deletes-emits twice
        merged = pdf.merge(keys, on=p.eq_cols, how="inner")
        tbl = _cast_to_fields(
            pa.Table.from_pandas(
                merged[list(pdf.columns)], preserve_index=False
            ),
            p.fields,
        )
    else:  # pragma: no cover - planner emits only the kinds above
        raise ValueError(f"unknown change kind {p.kind!r}")
    yield from with_meta(tbl).to_batches(max_chunksize=1 << 16)


class _IcebergLiteStreamReader(DataSourceStreamReader):
    """PARTITION-PLANNING stream reader over the Iceberg snapshot log —
    the format twin of pyds._DeltaLiteStreamReader (VERDICT r7 item 3).

    Offsets are ``{"snapshot_id": s}`` = 'everything up to and
    including snapshot s has been emitted' (-1 = before the first
    snapshot), persisted by Spark in its streaming checkpoint. The
    snapshot log is immutable and append-only, so replaying
    ``partitions(start, end)`` with checkpointed bounds plans identical
    partitions — the exactly-once contract. Planning is pure Python on
    the driver (metadata JSON + Avro manifests + KB-scale delete-file
    parquet); every row scan happens in an executor.

    ``read_changelog=True`` emits the incremental changelog — the same
    per-commit algebra as iceberg.read_iceberg_changes (inserts for
    added files, previous-state rows for dropped files, row-exact
    position-delete matches, seq-scoped equality-delete matches) with
    ``_change_type``/``_snapshot_id``/``_commit_timestamp`` columns.
    Plain mode streams appended files only and REFUSES snapshots that
    drop files or add delete files (set readChangelog=true for those).
    """

    def __init__(self, path: str, read_changelog: bool,
                 from_snapshot_id: int | None, schema=None,
                 max_rows: int = 2_000_000,
                 max_snapshots_per_trigger: int = 0):
        import json as _json

        self.path = path
        self.read_changelog = read_changelog
        self.from_snapshot_id = from_snapshot_id
        self.max_rows = max_rows
        # admission control (maxSnapshotsPerTrigger, 0 = unbounded) —
        # same two-variable contract as pyds._DeltaLiteStreamReader
        # (see the comment there): _anchor paces latestOffset, _emitted
        # (highest snapshot actually planned) clamps re-planning so a
        # post-restart capped offset landing behind the checkpointed
        # end heals through empty batches instead of double-emitting.
        # Both are snapshot IDS; ordering comes from the snapshot log.
        self.max_snapshots = int(max_snapshots_per_trigger)
        self._anchor: int | None = None  # -1 = before first snapshot
        self._emitted: int | None = None
        meta_names = {"_change_type", "_snapshot_id", "_commit_timestamp"}
        self.pinned_fields = (
            [
                (f.name, _json.loads(f.dataType.json()))
                for f in schema.fields
                if f.name not in meta_names
            ]
            if schema is not None
            else None
        )

    def initialOffset(self):
        off = (
            int(self.from_snapshot_id)
            if self.from_snapshot_id is not None
            else -1
        )
        return {"snapshot_id": off}

    def _idx_of(self, ids: list, sid: int | None) -> int | None:
        """Index of a snapshot id in the ordered log; -1 for the
        before-first sentinel; None when unknown/expired."""
        if sid is None:
            return None
        if sid == -1:
            return -1
        return ids.index(sid) if sid in ids else None

    def latestOffset(self):
        from .iceberg import _load_metadata, _main_lineage

        snaps = _main_lineage(_load_metadata(self.path))
        if not snaps:
            return {"snapshot_id": -1}
        ids = [int(s["snapshot-id"]) for s in snaps]
        idx = len(ids) - 1
        if self.max_snapshots > 0:
            base = self._idx_of(ids, self._anchor)
            if base is None:
                base = self._idx_of(
                    ids,
                    int(self.from_snapshot_id)
                    if self.from_snapshot_id is not None else -1,
                )
            em = self._idx_of(ids, self._emitted)
            if em is not None:
                base = em if base is None else max(base, em)
            if base is not None:
                idx = max(min(idx, base + self.max_snapshots), base)
            # unknown/expired base: leave unbounded (honest fallback;
            # never guess an ordering for an unknown id)
        off = ids[idx] if idx >= 0 else -1
        cur = self._idx_of(ids, self._anchor)
        if cur is None or idx > cur:
            self._anchor = off
        return {"snapshot_id": off}

    def _index(self, ids, sid) -> int:
        if sid == -1:
            return -1
        if sid not in ids:
            raise ValueError(
                f"snapshot {sid} is not in the table history (expired?)"
            )
        return ids.index(sid)

    def partitions(self, start: dict, end: dict):
        import json as _json

        from .iceberg import (
            _load_metadata,
            snapshot_delete_files,
            snapshot_files,
        )

        meta = _load_metadata(self.path)
        from .iceberg import _main_lineage

        snaps = _main_lineage(meta)  # staged WAP branches never stream
        ids = [s["snapshot-id"] for s in snaps]
        if int(end["snapshot_id"]) == -1:
            return []
        lo = self._index(ids, int(start["snapshot_id"]))
        hi = self._index(ids, int(end["snapshot_id"]))
        # admission control: never re-plan snapshots at or below
        # _emitted, then record the high-water marks (see __init__)
        em = self._idx_of(ids, self._emitted)
        if em is not None:
            lo = max(lo, em)
        new_em = max(x for x in (em, lo, hi) if x is not None)
        self._emitted = int(ids[new_em]) if new_em >= 0 else -1
        a = self._idx_of(ids, self._anchor)
        new_a = max(x for x in (a, lo, hi) if x is not None)
        self._anchor = int(ids[new_a]) if new_a >= 0 else -1
        st = _pure_spark_schema(meta)
        fields = self.pinned_fields or [
            (f.name, _json.loads(f.dataType.json())) for f in st.fields
        ]
        id_to_name = {
            f["id"]: f["name"]
            for f in (
                meta.get("schema") or (meta.get("schemas") or [{}])[0]
            ).get("fields", [])
        }

        prev_files: dict[str, dict] = {}
        prev_dels: dict[str, dict] = {}
        if lo >= 0:
            prev_files = {
                f["file_path"]: f
                for f in snapshot_files(self.path, snapshot_id=ids[lo])
            }
            prev_dels = {
                d["file_path"]: d
                for d in snapshot_delete_files(
                    self.path, snapshot_id=ids[lo]
                )
            }
        parts: list[InputPartition] = []
        for i in range(lo + 1, hi + 1):
            sid, ts = ids[i], snaps[i]["timestamp-ms"]
            cur_files = {
                f["file_path"]: f
                for f in snapshot_files(self.path, snapshot_id=sid)
            }
            cur_dels = {
                d["file_path"]: d
                for d in snapshot_delete_files(self.path, snapshot_id=sid)
            }
            added = [f for pth, f in cur_files.items()
                     if pth not in prev_files]
            dropped = [f for pth, f in prev_files.items()
                       if pth not in cur_files]
            new_dels = [d for pth, d in cur_dels.items()
                        if pth not in prev_dels]
            if not self.read_changelog:
                if dropped or new_dels:
                    raise ValueError(
                        f"snapshot {sid} drops files or adds delete "
                        "files; set readChangelog=true to stream the "
                        "change feed"
                    )
                for f in sorted(added, key=lambda x: x["file_path"]):
                    parts.extend(
                        _IceFilePartition(
                            self.path, f["file_path"], f.get("_seq"),
                            fields, [], [], split=s,
                        )
                        for s in _ice_splits(
                            f.get("record_count"), self.max_rows
                        )
                    )
                prev_files, prev_dels = cur_files, cur_dels
                continue

            for f in sorted(added, key=lambda x: x["file_path"]):
                parts.append(_IceChangePartition(
                    "insert", self.path, f["file_path"], fields, sid, ts,
                    seq=f.get("_seq"),
                ))
            if dropped:
                old_pos = [d["file_path"] for d in prev_dels.values()
                           if d.get("content") == 1]
                old_eq = [
                    (
                        d["file_path"],
                        int(d.get("_seq") or 0),
                        [id_to_name[i_]
                         for i_ in (d.get("equality_ids") or [])],
                    )
                    for d in prev_dels.values() if d.get("content") == 2
                ]
                for f in sorted(dropped, key=lambda x: x["file_path"]):
                    parts.append(_IceChangePartition(
                        "dropped", self.path, f["file_path"], fields,
                        sid, ts, seq=f.get("_seq"),
                        pos_delete_rels=old_pos, eq_deletes=old_eq,
                    ))
            pos_new = [d for d in new_dels if d.get("content") == 1]
            eq_new = [d for d in new_dels if d.get("content") == 2]
            if pos_new:
                by_base = self._positions_by_base(pos_new)
                for f in sorted(prev_files.values(),
                                key=lambda x: x["file_path"]):
                    poss = by_base.get(
                        os.path.basename(f["file_path"])
                    )
                    if poss:
                        parts.append(_IceChangePartition(
                            "posmatch", self.path, f["file_path"],
                            fields, sid, ts, seq=f.get("_seq"),
                            positions=poss,
                        ))
            for d in eq_new:
                names = [id_to_name[i_]
                         for i_ in (d.get("equality_ids") or [])]
                if not names:
                    raise ValueError(
                        "equality delete file without equality_ids"
                    )
                dseq = int(d.get("_seq") or 0)
                for f in sorted(prev_files.values(),
                                key=lambda x: x["file_path"]):
                    if int(f.get("_seq") or 0) < dseq:
                        parts.append(_IceChangePartition(
                            "eqmatch", self.path, f["file_path"],
                            fields, sid, ts, seq=f.get("_seq"),
                            eq_rel=d["file_path"], eq_cols=names,
                        ))
            prev_files, prev_dels = cur_files, cur_dels
        return parts

    def _positions_by_base(self, pos_new: list[dict]) -> dict[str, list]:
        """Driver-side read of the NEW position-delete parquets (delete
        metadata — KB-scale by construction, the same budget as
        delta_lite's DV bitmaps) grouped by target file basename, so
        only actually-affected data files get a partition."""
        import pyarrow.parquet as pq

        by_base: dict[str, list] = {}
        for d in pos_new:
            t = pq.read_table(
                os.path.join(self.path, d["file_path"]),
                columns=["file_path", "pos"],
            )
            for fp, pos in zip(
                t.column("file_path").to_pylist(),
                t.column("pos").to_pylist(),
            ):
                by_base.setdefault(os.path.basename(fp), []).append(
                    int(pos)
                )
        return by_base

    def read(self, partition):
        if isinstance(partition, _IceChangePartition):
            yield from _read_ice_change_partition(partition)
        else:
            yield from _read_ice_partition(partition)

    def commit(self, end: dict):
        # snapshot log is immutable; nothing to clean up — seed the
        # pacing anchor if this process has none yet (ordering for a
        # known id is recovered from the log at the next latestOffset)
        sid = int(end["snapshot_id"])
        if self._anchor is None and sid != -1:
            self._anchor = sid


class IcebergLiteDataSource(DataSource):
    """Options: ``path`` (from .load(path)), ``snapshotId`` (time
    travel to a snapshot), ``ref`` (a named tag/branch),
    ``pushdown=false`` (disable the pushFilters reader). Streaming:
    ``fromSnapshotId`` (exclusive start, the batch changelog contract;
    default = before the first snapshot), ``readChangelog`` (emit the
    incremental change feed with _change_type/_snapshot_id/
    _commit_timestamp; plain mode streams appends only)."""

    @classmethod
    def name(cls):
        return "iceberg_lite"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_lite requires .load(<table path>)")
        return path

    def schema(self):
        from .iceberg import _load_metadata

        st = _pure_spark_schema(_load_metadata(self._path()))
        if str(self.options.get("readchangelog", "false")).lower() \
                == "true":
            from pyspark.sql.types import (
                LongType, StringType, StructField, StructType,
            )

            return StructType(
                list(st.fields)
                + [
                    StructField("_change_type", StringType(), False),
                    StructField("_snapshot_id", LongType(), False),
                    StructField("_commit_timestamp", LongType(), False),
                ]
            )
        return st

    def _snapshot(self) -> int | None:
        sid = self.options.get("snapshotid")
        ref = self.options.get("ref")
        if sid is not None and ref is not None:
            raise ValueError("pass snapshotId OR ref, not both")
        if ref is not None:
            from .iceberg import resolve_ref

            return resolve_ref(self._path(), ref)
        return int(sid) if sid is not None else None

    def _max_rows(self) -> int:
        # one task per maxRowsPerTask rows of a data file (planned
        # from the manifest record_count, resolved to row-group chunks
        # in the task). 0 disables splitting.
        return int(self.options.get("maxrowspertask", 2_000_000))

    def reader(self, schema):
        sid = self._snapshot()
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return _IcebergLitePlainReader(self._path(), sid,
                                           max_rows=self._max_rows())
        return _IcebergLiteReader(self._path(), sid,
                                  max_rows=self._max_rows())

    def streamReader(self, schema):
        fs = self.options.get("fromsnapshotid")
        return _IcebergLiteStreamReader(
            self._path(),
            str(self.options.get("readchangelog", "false")).lower()
            == "true",
            int(fs) if fs is not None else None,
            schema=schema,
            max_rows=self._max_rows(),
            max_snapshots_per_trigger=int(
                self.options.get("maxsnapshotspertrigger", 0)
            ),
        )

    def writer(self, schema, overwrite):
        """``df.write.format("iceberg_lite").mode("append"|"overwrite")
        .save(path)``. Options: ``partitionCol`` + ``partitionTransform``
        (new tables only — existing tables inherit their default spec,
        hidden transforms included), ``commitTs`` (deterministic commit
        timestamp, same contract as :func:`iceberg.write_iceberg`)."""
        return _IcebergLiteWriter(
            self._path(), schema, overwrite, self.options
        )

    def streamWriter(self, schema, overwrite):
        """``df.writeStream.format("iceberg_lite").option(
        "checkpointLocation", ...).start(path)``. Options: ``txnAppId``
        (exactly-once marker recorded as snapshot-summary properties —
        set one per logical job), ``partitionCol`` /
        ``partitionTransform`` (table creation, as in the batch
        writer)."""
        return _IcebergLiteStreamWriter(
            self._path(), schema, overwrite, self.options
        )


# ---------------------------------------------------------------------------
# Writer — df.write.format("iceberg_lite").mode(...).save(path)
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceArrowWriter,
    WriterCommitMessage,
)


class _IceWriteCommit(WriterCommitMessage):
    """Per-task staged files: [(rel, partition_value, bounds_json, n)]."""

    def __init__(self, staged):
        self.staged = staged


class _IcebergLiteWriter(DataSourceArrowWriter):
    """Executor-staged parquet + driver-side manifest commit.

    Planning (:func:`iceberg._plan_write_iceberg`) runs once on the
    driver — spec inheritance, schema enforcement, snapshot/version
    allocation — all pure metadata JSON. Tasks then stream their Arrow
    batches into one open ``ParquetWriter`` per (task, partition
    value): the spec's HIDDEN transform (identity / bucket[N] /
    truncate[W] / days / hours) is applied per batch with the same
    murmur3 the manifests carry (:func:`iceberg_transforms
    .transform_value`, evaluated once per DISTINCT source value and
    broadcast to rows via ``index_in``/``take`` — no per-row Python),
    and int/float/string column bounds fold incrementally into the
    manifest's ``bounds_json``. ``commit`` reuses the library's commit
    half verbatim (:func:`iceberg._commit_planned_iceberg`: manifests,
    carry-forward of prior data AND delete manifests, metadata
    publish); a lost put-if-absent race on a plain append re-plans
    against the winner's metadata and retries, raising if the winner
    changed the partition spec out from under the staged layout."""

    def __init__(self, path, write_schema, overwrite, options):
        from .iceberg import _plan_write_iceberg

        self.path = path
        self.mode = "overwrite" if overwrite else "append"
        self.commit_ts = int(options.get("committs", 0))
        self.write_schema = write_schema
        self.partition_col_opt = options.get("partitioncol")
        self.transform_opt = options.get(
            "partitiontransform", "identity"
        )
        if (
            self.partition_col_opt is not None
            and self.partition_col_opt not in write_schema.names
        ):
            raise ValueError(
                f"partitionCol {self.partition_col_opt!r} is not a "
                "written column"
            )
        self.plan = _plan_write_iceberg(
            path, write_schema, mode=self.mode,
            partition_col=self.partition_col_opt,
            partition_transform=self.transform_opt,
            merge_schema=False, allow_spec_evolution=False,
        )
        self.types = {
            f.name: f.dataType.simpleString() for f in write_schema.fields
        }
        # scale guard: one ParquetWriter per (task, partition value) —
        # unclustered high-cardinality partition input must fail
        # actionably, not exhaust handles (repartition upstream or
        # raise the cap)
        self.max_open_files = int(options.get("maxopenfiles", 200))

    # -- executor side ------------------------------------------------

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from urllib.parse import quote

        from .iceberg import _pv_caster_ice
        from .iceberg_transforms import transform_value

        plan = self.plan
        pcol = plan["partition_col"]
        pfield = plan["pfield"]
        ordered = plan["ordered"]
        kind, param = plan["t_kind"], plan["t_param"]
        src_t, res_t = plan["src_ice_type"], plan["res_ice_type"]
        caster = _pv_caster_ice(res_t) if pcol else None
        bounds_cols = [
            n for n in ordered
            if self.types[n] in
            ("int", "bigint", "double", "float", "string")
        ]
        # pv_key -> [ParquetWriter, rel, pv, n, {col: [lo, hi]}]
        open_files: dict = {}

        def sink_for(pv):
            st = open_files.get(pv)
            if st is None:
                if len(open_files) >= self.max_open_files:
                    raise ValueError(
                        f"write task exceeded {self.max_open_files} open "
                        f"partition files; repartition the input by "
                        f"{pcol!r} before writing (or raise the "
                        "maxOpenFiles option)"
                    )
                # URL-quote the partition value exactly as
                # _DeltaLiteWriter does: a raw string value containing
                # '/', '..' or '=' would otherwise escape the intended
                # directory or produce a malformed layout (manifests
                # still resolve the file, but the on-disk layout and
                # orphan-file accounting break) — ADVICE r8. None maps
                # to the Hive null-partition sentinel.
                if pcol:
                    pdir = (
                        "__HIVE_DEFAULT_PARTITION__" if pv is None
                        else quote(str(pv), safe="")
                    )
                    rel = f"data/{pfield}={pdir}/{uuid.uuid4().hex}.parquet"
                else:
                    rel = f"data/{uuid.uuid4().hex}.parquet"
                dest = os.path.join(self.path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                st = [None, rel, pv, 0, {c: [None, None] for c in
                                         bounds_cols}]
                open_files[pv] = st
            return st

        def fold(st, part):
            st[3] += part.num_rows
            for c in bounds_cols:
                col = part.column(c)
                if col.null_count == len(col):
                    continue
                mm = pc.min_max(col)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                acc = st[4][c]
                if acc[0] is None or lo < acc[0]:
                    acc[0] = lo
                if acc[1] is None or hi > acc[1]:
                    acc[1] = hi

        for batch in iterator:
            tbl = pa.Table.from_batches([batch]).select(ordered)
            if pcol is None:
                groups = [(None, tbl)]
            else:
                src = tbl.column(pcol)
                uniq = pc.unique(src)
                uniq_py = uniq.to_pylist()
                tvals = [
                    None if u is None
                    else caster(str(transform_value(kind, param, u, src_t)))
                    for u in uniq_py
                ]
                groups = []
                for tv in sorted(
                    set(tvals), key=lambda x: (x is None, str(x))
                ):
                    members = pa.array(
                        [u for u, t in zip(uniq_py, tvals) if t == tv],
                        type=src.type,
                    )
                    mask = (
                        pc.is_null(src) if (
                            len(members) == 1 and not members[0].is_valid
                        )
                        else pc.is_in(src, value_set=members)
                    )
                    groups.append((tv, tbl.filter(mask)))
            for pv, part in groups:
                if part.num_rows == 0:
                    continue
                st = sink_for(pv)
                if st[0] is None:
                    st[0] = pq.ParquetWriter(
                        os.path.join(self.path, st[1]), part.schema
                    )
                st[0].write_table(part)
                fold(st, part)

        staged = []
        for st in open_files.values():
            writer, rel, pv, n, acc = st
            writer.close()
            bounds = json.dumps(
                {c: [acc[c][0], acc[c][1]] for c in bounds_cols},
                default=str,
            )
            staged.append((rel, pv, bounds, n))
        return _IceWriteCommit(staged)

    # -- driver side ---------------------------------------------------

    def commit(self, messages):
        from .iceberg import (
            IcebergConcurrentWriteError,
            _commit_planned_iceberg,
            _plan_write_iceberg,
        )

        staged = [
            s for m in messages if m is not None for s in m.staged
        ]
        plan = self.plan
        for _ in range(16):
            try:
                _commit_planned_iceberg(
                    self.path, plan, staged, mode=self.mode,
                    commit_ts=self.commit_ts,
                )
                return
            except IcebergConcurrentWriteError:
                if self.mode != "append":
                    raise
                replanned = _plan_write_iceberg(
                    self.path, self.write_schema, mode=self.mode,
                    partition_col=self.partition_col_opt,
                    partition_transform=self.transform_opt,
                    merge_schema=False, allow_spec_evolution=False,
                )
                if (
                    replanned["pfield"], replanned["t_kind"],
                    replanned["t_param"],
                ) != (plan["pfield"], plan["t_kind"], plan["t_param"]):
                    raise  # winner changed the spec: staged layout stale
                plan = replanned
        raise IcebergConcurrentWriteError(
            f"append could not commit after 16 rebases in {self.path}"
        )

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for rel, _, _, _ in m.staged:
                try:
                    os.remove(os.path.join(self.path, rel))
                except OSError:
                    pass


from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamArrowWriter,
)


def _max_committed_epoch(meta: dict, app: str) -> int | None:
    """Newest streaming epoch this app committed to the table — read
    from snapshot-summary properties (the marker real Iceberg
    streaming sinks use for exactly-once; metadata-sized scan)."""
    best = None
    for s in (meta or {}).get("snapshots") or []:
        summ = s.get("summary") or {}
        if summ.get("streaming-app-id") == app \
                and "streaming-epoch-id" in summ:
            e = int(summ["streaming-epoch-id"])
            best = e if best is None or e > best else best
    return best


class _IcebergLiteStreamWriter(_IcebergLiteWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("iceberg_lite")`` — exactly-once
    streaming appends, the Iceberg twin of delta_lite's stream sink.

    Executor staging is the batch writer's (spec-exact hidden
    transforms, incremental bounds). Iceberg has no Delta-style txn
    action; the exactly-once marker is the pair of snapshot-summary
    properties (``streaming-app-id``, ``streaming-epoch-id``) real
    Iceberg sinks record — a replayed micro-batch whose epoch the
    table already carries for this app deletes its staged duplicates
    and commits nothing. Every commit RE-PLANS against the current
    metadata (the table advances each batch) and raises if a
    concurrent writer changed the partition spec under the staged
    layout. Commit timestamps are the batch id. Append-only."""

    def __init__(self, path, write_schema, overwrite, options):
        if overwrite:
            raise ValueError(
                "iceberg_lite streaming sink is append-only "
                "(outputMode('append'))"
            )
        _IcebergLiteWriter.__init__(self, path, write_schema, False,
                                    options)
        self.app = options.get("txnappid", "iceberg_lite_stream")

    def commit(self, messages, batchId):
        from .iceberg import (
            IcebergConcurrentWriteError,
            _commit_planned_iceberg,
            _plan_write_iceberg,
        )

        staged = [s for m in messages if m is not None for s in m.staged]
        for _ in range(16):
            plan = _plan_write_iceberg(
                self.path, self.write_schema, mode="append",
                partition_col=self.partition_col_opt,
                partition_transform=self.transform_opt,
                merge_schema=False, allow_spec_evolution=False,
            )
            last = _max_committed_epoch(plan["meta"], self.app)
            if last is not None and batchId <= last:
                self.abort(messages, batchId)  # replay: drop duplicates
                return
            if (
                plan["pfield"], plan["t_kind"], plan["t_param"],
            ) != (
                self.plan["pfield"], self.plan["t_kind"],
                self.plan["t_param"],
            ):
                raise IcebergConcurrentWriteError(
                    "partition spec changed under the streaming sink"
                )
            try:
                _commit_planned_iceberg(
                    self.path, plan, staged, mode="append",
                    commit_ts=int(batchId),
                    summary_extra={
                        "streaming-app-id": self.app,
                        "streaming-epoch-id": str(int(batchId)),
                    },
                )
                return
            except IcebergConcurrentWriteError:
                continue  # lost the race: re-plan against the winner
        raise IcebergConcurrentWriteError(
            f"stream batch {batchId} could not commit after 16 rebases "
            f"in {self.path}"
        )

    def abort(self, messages, batchId):
        _IcebergLiteWriter.abort(self, messages)
