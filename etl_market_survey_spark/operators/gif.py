"""Library-free GIF codec (tier-1 multimodal).

GIF87a/89a (CompuServe spec, public) with stdlib + numpy only: logical
screen descriptor, global/local color tables, extension-block skipping,
interlaced row ordering, and real variable-width LSB-packed LZW
(clear/EOI codes, dictionary growth to 4095, width bumps) in both
directions. GIF is LOSSLESS for paletted content, so — like PNG (q231)
and unlike JPEG — decode(encode(img)) is bit-exact for any image that
fits a 256-color palette, which is what the q268 gate checks.

Same determinism contract as the other tier-1 codecs: pure integer
byte-level functions of the input, no floats anywhere.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Variable-width LZW, LSB-first bit packing (GIF flavor)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for v in indices.tolist():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([v])
    if cur:
        emit(table[cur])
        # the decoder adds an entry for EVERY data code after the first,
        # including this final one the encoder never uses — mirror its
        # table growth or the EOI width diverges
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("invalid LZW code")
        if prev is not None and code < len(table) - 1:
            pass
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_expected:
        raise ValueError("LZW output shorter than image")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(
    img: np.ndarray, interlace: bool = False
) -> bytes:
    """Encode ``(h, w, 3)`` uint8 RGB (<= 256 distinct colors) or
    ``(h, w)`` uint8 grayscale to GIF87a bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img, img, img], axis=-1)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) or (h,w), got {img.shape}")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors > 256 (palette format)")
    # palette size = power of two >= max(2, n)
    size_exp = 1
    while (1 << size_exp) < len(colors):
        size_exp += 1
    n_pal = 1 << size_exp
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        indices = indices[_interlace_order(h), :]

    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((size_exp - 1) & 0x07), 0, 0])  # GCT flag + size
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    min_code = max(2, size_exp)
    out += bytes([min_code])
    lzw = _lzw_encode(indices.ravel(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a stream to ``(h, w, 3)``
    uint8 RGB. Extensions are skipped; local color tables, interlace,
    and sub-256-color palettes are handled."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02X} at {pos - 1}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("no color table for image")
        interlaced = bool(ipacked & 0x40)
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
        if interlaced:
            rows = np.empty(h, dtype=np.int64)
            rows[_interlace_order(h)] = np.arange(h)
            idx = idx[rows, :]
        return table[idx]
    raise ValueError("no image block in GIF stream")
