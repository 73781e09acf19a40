"""Delta Lake deletion-vector bitmaps — the public wire format, no jar.

A deletion vector (DV) marks rows of one data file as logically deleted
without rewriting the file (merge-on-read). Three public specs meet
here, all implemented from their published definitions:

* **Z85** (ZeroMQ base-85, spec 32/Z85): DV file names embed a
  Z85-encoded UUID; 4 data bytes -> 5 printable chars.
* **Roaring bitmap, standard 32-bit serialization**
  (RoaringFormatSpec): cookie 12346 (no run containers) or 12347
  (with runs), descriptive headers (key, cardinality-1), optional
  offset table, then array (sorted u16), bitset (1024 x u64) or run
  ((start, len-1) pairs) containers — everything little-endian.
* **RoaringBitmapArray "portable" 64-bit format + DV file layout**
  (delta.io PROTOCOL.md "Deletion Vector Format"): magic 1681511377
  (4B LE), bitmap count (8B LE), then per 32-bit bitmap its key (4B
  LE) + standard serialization.  The .bin file wraps each DV as
  ``<size: 4B BIG-endian> <data> <crc32(data): 4B BIG-endian>`` after
  a 1-byte format version — the spec's noted endianness quirk: the
  framing is big-endian, the bitmap inside is little-endian.

Scale note: DVs are metadata — KB-scale compressed bitmaps per file.
Decoding is pure bytes->ints with no Spark dependency, so the reader
can run driver-side for small tables or inside ``mapInPandas`` for a
distributed decode (see ``deltalog.read_delta``'s DV anti-join).

The writer emits only no-run (cookie 12346) array/bitset containers —
always legal; run containers are a pure size optimization. The reader
accepts all three container kinds and both cookies, so tables written
by other engines read correctly.
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

_MAGIC = 1681511377  # RoaringBitmapArray portable-format magic (LE)
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # offsets omitted for <4 containers w/ runs


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("Z85 needs input length divisible by 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("Z85 needs input length divisible by 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# standard 32-bit roaring serialization
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """Sorted distinct u32 values -> standard no-run serialization."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset table (always present for cookie 12346): byte position of
    # each container from the stream start
    pos = 8 + 4 * len(keys) + 4 * len(keys)
    offsets = []
    for k in keys:
        offsets.append(pos)
        card = len(containers[k])
        pos += 8192 if card > 4096 else 2 * card
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) > 4096:  # bitset container
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:  # array container
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def _deserialize_roaring32(buf: bytes, off: int) -> tuple[list[int], int]:
    """Parse one 32-bit bitmap at ``off``; returns (values, next_off)."""
    (cookie16,) = struct.unpack_from("<H", buf, off)
    if cookie16 == _SERIAL_COOKIE:  # run-capable format
        (word,) = struct.unpack_from("<I", buf, off)
        n = (word >> 16) + 1
        off += 4
        run_flags = buf[off : off + (n + 7) // 8]
        off += (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        cookie, n = struct.unpack_from("<II", buf, off)
        if cookie != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"bad roaring cookie {cookie}")
        off += 8
        run_flags = b""
        has_offsets = True
    heads = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, off)
        off += 4
        heads.append((k, cm1 + 1))
    if has_offsets:
        off += 4 * n  # we read containers sequentially; offsets unused
    values: list[int] = []
    for i, (k, card) in enumerate(heads):
        base = k << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(base + v for v in range(start, start + lm1 + 1))
        elif card > 4096:  # bitset
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:  # array
            vals = struct.unpack_from(f"<{card}H", buf, off)
            off += 2 * card
            values.extend(base + v for v in vals)
    return values, off


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's portable format)
# ---------------------------------------------------------------------------


def serialize_rbm64(positions: list[int]) -> bytes:
    """Row positions (u64, need not be sorted/distinct) -> portable bytes."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        if p < 0:
            raise ValueError("negative row position")
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Iq", _MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(by_high[high])
    return bytes(out)


def deserialize_rbm64(data: bytes) -> list[int]:
    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    off = 12
    positions: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<I", data, off)
        off += 4
        vals, off = _deserialize_roaring32(data, off)
        positions.extend((high << 32) | v for v in vals)
    return positions


# ---------------------------------------------------------------------------
# DV .bin file layout + descriptor helpers
# ---------------------------------------------------------------------------


def write_dv_file(dest_path: str, dv_blobs: list[bytes]) -> list[dict]:
    """Write one DV file holding each blob; returns per-blob framing info
    ``{"offset": int, "sizeInBytes": int}`` for the add-action
    descriptors."""
    frames = []
    with open(dest_path, "wb") as f:
        f.write(b"\x01")  # format version
        pos = 1
        for data in dv_blobs:
            frames.append({"offset": pos, "sizeInBytes": len(data)})
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            pos += 4 + len(data) + 4
    return frames


def read_dv_blob(file_path: str, offset: int, size: int) -> bytes:
    """Read + checksum-verify one DV's data bytes out of a .bin file."""
    with open(file_path, "rb") as f:
        f.seek(offset)
        (n,) = struct.unpack(">i", f.read(4))
        if n != size:
            raise ValueError(f"DV size mismatch: framed {n} != descriptor {size}")
        data = f.read(n)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {file_path} @ {offset}")
    return data


def dv_file_name(u: _uuid.UUID) -> str:
    return f"deletion_vector_{u}.bin"


def encode_dv_path(u: _uuid.UUID, prefix: str = "") -> str:
    """``pathOrInlineDv`` for storageType 'u': optional random prefix +
    the 20-char Z85 UUID."""
    return prefix + z85_encode(u.bytes)


def decode_dv_path(path_or_inline: str) -> tuple[str, _uuid.UUID]:
    """Split a storageType-'u' value into (prefix, uuid): the LAST 20
    chars are the Z85 UUID, anything before is the directory prefix."""
    if len(path_or_inline) < 20:
        raise ValueError(f"DV path too short: {path_or_inline!r}")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    return prefix, _uuid.UUID(bytes=z85_decode(enc))
