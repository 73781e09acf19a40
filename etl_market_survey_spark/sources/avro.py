"""Pure-Python Apache Avro container codec — no jar, no external lib.

The Avro Object Container File format (public spec, avro.apache.org
1.11 "Object Container Files" + "Binary Encoding"): a header
``Obj\\x01`` + metadata map (``avro.schema`` JSON, ``avro.codec``) + a
16-byte sync marker, then blocks of ``[row count, byte size, payload,
sync]`` where payload rows are binary-encoded by the writer schema
(zigzag-varint ints/longs, length-prefixed strings/bytes, little-endian
IEEE floats, inline records, count-block arrays/maps, index-prefixed
unions). ``deflate`` codec is raw zlib (RFC 1951, no header) — stdlib.

Why it exists here: the ``spark-avro`` module is a separate artifact
this runtime doesn't ship, but two first-class features need Avro
anyway — (a) Avro sources in general, (b) Iceberg manifests, which ARE
Avro files (:mod:`.iceberg`). The scale path never funnels through the
driver: :func:`read_avro_distributed` pairs Spark's ``binaryFile``
source (one task per file — the WARC-reader shape) with this decoder
inside ``mapInPandas``, so a directory of Avro part-files decodes in
parallel with only schema-sized driver state. Driver-side
:func:`read_avro_records` is for metadata-sized files (manifests).

Decoder coverage: all primitive types, record/enum/array/map/union/
fixed, named-type references, recursive types, deflate + null codecs.
Logical types surface as their underlying primitives (callers cast).
Writer: enough to round-trip tests and build Iceberg manifests —
records of primitives/unions/arrays/maps, null or deflate codec.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    # the familiar zigzag identity, branch-free form:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------


class _Types:
    """Named-type registry so records/enums/fixed can self-reference."""

    def __init__(self):
        self.by_name: dict[str, dict] = {}

    def register(self, schema: dict):
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            self.by_name[full] = schema
            self.by_name[name] = schema


def _decode(schema, buf: io.BytesIO, types: _Types):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        if t in types.by_name:
            return _decode(types.by_name[t], buf, types)
        raise ValueError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf, types)
    t = schema["type"]
    if t == "record":
        types.register(schema)
        return {
            f["name"]: _decode(f["type"], buf, types)
            for f in schema["fields"]
        }
    if t == "enum":
        types.register(schema)
        return schema["symbols"][_read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)  # block byte size — skippable, unused
            for _ in range(n):
                out.append(_decode(schema["items"], buf, types))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, types)
        return out
    if t == "fixed":
        types.register(schema)
        return buf.read(schema["size"])
    # logical types / wrapped primitives: {"type": "long", ...}
    return _decode(t, buf, types)


def _encode(schema, value, out: bytearray, types: _Types):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if value else 0)
            return
        if t in ("int", "long"):
            _write_long(out, int(value))
            return
        if t == "float":
            out.extend(struct.pack("<f", float(value)))
            return
        if t == "double":
            out.extend(struct.pack("<d", float(value)))
            return
        if t == "bytes":
            _write_bytes(out, bytes(value))
            return
        if t == "string":
            _write_bytes(out, value.encode("utf-8"))
            return
        if t in types.by_name:
            _encode(types.by_name[t], value, out, types)
            return
        raise ValueError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union: first branch whose kind fits
        idx = _union_index(schema, value)
        _write_long(out, idx)
        _encode(schema[idx], value, out, types)
        return
    t = schema["type"]
    if t == "record":
        types.register(schema)
        for f in schema["fields"]:
            _encode(f["type"], value[f["name"]], out, types)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(value))
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, types)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, types)
        _write_long(out, 0)
        return
    if t == "fixed":
        out.extend(value)
        return
    _encode(t, value, out, types)


def _union_index(union: list, value) -> int:
    def kind(s):
        return s if isinstance(s, str) else (
            s["type"] if isinstance(s, dict) else "union"
        )

    for i, s in enumerate(union):
        k = kind(s)
        if value is None and k == "null":
            return i
        if value is not None and k != "null":
            if isinstance(value, bool) and k != "boolean":
                continue
            if isinstance(value, str) and k not in ("string", "enum"):
                continue
            if isinstance(value, (bytes, bytearray)) and k not in ("bytes", "fixed"):
                continue
            if isinstance(value, dict) and k not in ("record", "map"):
                continue
            if isinstance(value, list) and k != "array":
                continue
            # numeric kinds must match too: an int falling through to a
            # 'string' branch crashes deep in _encode, and an int taking
            # a 'float'/'double' branch listed first silently loses
            # precision above 2^53
            if (
                isinstance(value, int)
                and not isinstance(value, bool)
                and k not in ("int", "long")
            ):
                continue
            if isinstance(value, float) and k not in ("float", "double"):
                continue
            return i
    raise ValueError(f"no union branch for {type(value)} in {union}")


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------


def decode_container(data: bytes) -> tuple[dict, list]:
    """(writer schema, records) from Avro container file bytes."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro container file (bad magic)")
    types = _Types()
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf, types)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(_decode(schema, block, types))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records


def encode_container(
    schema: dict, records: list, codec: str = "deflate"
) -> bytes:
    """Avro container file bytes for ``records`` under ``schema``."""
    types = _Types()
    body = bytearray()
    for r in records:
        _encode(schema, r, body, types)
    payload = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = co.compress(payload) + co.flush()
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    sync = b"\x00" * 8 + b"sparkavr"  # deterministic sync (tests replay)
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _encode({"type": "map", "values": "bytes"}, meta, out, types)
    out.extend(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    return bytes(out)


def read_avro_records(path: str) -> tuple[dict, list]:
    """Driver-side decode of ONE Avro file (metadata-sized by contract:
    Iceberg manifests, small exports)."""
    with open(path, "rb") as f:
        return decode_container(f.read())


def write_avro_file(path: str, schema: dict, records: list,
                    codec: str = "deflate") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(encode_container(schema, records, codec))


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------


def read_avro_distributed(spark, path: str, result_schema: str):
    """Jar-less distributed Avro scan: ``binaryFile`` lists the files
    (one task per file — same shape as the WARC source), this decoder
    runs inside ``mapInPandas``, rows come back under ``result_schema``
    (a Spark DDL string naming a SUBSET of the Avro record's fields —
    column pruning happens at decode time).

    For Avro files bigger than a task should hold, split upstream (Avro
    is block-structured; a splitter can cut on sync markers) — out of
    scope here, matching the one-WARC-per-task contract."""
    from pyspark.sql.types import StructType

    wanted = [f.name for f in StructType.fromDDL(result_schema).fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                _, records = decode_container(bytes(content))
                if records:
                    yield pd.DataFrame(
                        [{k: r.get(k) for k in wanted} for r in records]
                    )

    files = spark.read.format("binaryFile").load(path)
    return files.select("content").mapInPandas(decode, result_schema)


_AVRO_TO_SPARK = {
    "null": "string", "boolean": "boolean", "int": "int", "long": "long",
    "float": "float", "double": "double", "bytes": "binary",
    "string": "string",
}


def avro_schema_to_ddl(schema: dict) -> str:
    """Spark DDL for a flat Avro record of primitives / null-unions —
    the schema-inference step of the jar-less distributed scan."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # ["null", T] union
            non_null = [x for x in t if x != "null"]
            if len(non_null) != 1 or not isinstance(non_null[0], str):
                raise ValueError(f"unsupported union {t!r} for field {f['name']}")
            t = non_null[0]
        if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
            raise ValueError(f"unsupported Avro type {t!r} for field {f['name']}")
        cols.append(f"{f['name']} {_AVRO_TO_SPARK[t]}")
    return ", ".join(cols)
