"""Library-free BMP codec (tier-1 multimodal) — the uncompressed
Windows bitmap (BITMAPINFOHEADER, public spec): 24-bit BGR and 8-bit
paletted, bottom-up and top-down row orders, 4-byte row padding.
Lossless, integer-only — same determinism contract as the other tier-1
codecs."""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode ``(h, w, 3)`` RGB or ``(h, w)`` grayscale (written as
    8-bit paletted) uint8 to BMP bytes (bottom-up, BI_RGB)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (h,w) or (h,w,3), got {img.shape}")
    h, w = img.shape[:2]
    if gray:
        bpp = 8
        palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
        rows = img
        stride = (w + 3) & ~3
    else:
        bpp = 24
        palette = b""
        rows = img[:, :, ::-1]  # RGB -> BGR
        stride = (w * 3 + 3) & ~3
    data_offset = 14 + 40 + len(palette)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = rows[y].tobytes()
        body += line + b"\x00" * (stride - len(line))
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", data_offset + len(body), 0, 0, data_offset)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835,
        256 if gray else 0, 0,
    )
    out += palette
    out += body
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode BI_RGB BMP (8-bit paletted or 24-bit) to ``(h, w, 3)``
    uint8 RGB. Top-down (negative height) supported."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported header size {hdr_size}")
    w, h_raw, _planes, bpp, comp = struct.unpack("<iiHHI", payload[18:34])
    if comp != 0:
        raise ValueError(f"only BI_RGB supported, got compression {comp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp == 8:
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal_raw = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_size
        ).reshape(n_colors, 4)
        palette = pal_raw[:, [2, 1, 0]]  # BGRx -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_offset
        ).reshape(h, stride)[:, :w]
        img = palette[rows]
    elif bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_offset
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        img = rows[:, :, ::-1]  # BGR -> RGB
    else:
        raise ValueError(f"unsupported bpp {bpp}")
    return img if top_down else img[::-1].copy()
