"""Multimodal column plumbing (beyond-reference, first-class).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time.

Codec policy — three tiers:

1. **Library-free formats decode for REAL with zero dependencies**:
   binary netpbm images (P5/P6 -> ``decode_ppm``, pure numpy), PNG
   (``decode_png`` — stdlib zlib inflate + the five scanline filters in
   numpy; 8-bit gray/RGB/palette/alpha, 16-bit, Adam7), baseline JPEG
   (``jpeg.decode_jpeg`` — full marker parse, canonical Huffman,
   dequant + float64 IDCT; grayscale/4:4:4/4:2:0, restart intervals),
   GIF (``gif.decode_gif`` — real variable-width LZW, interlace,
   local/global palettes), BMP (``bmp.decode_bmp`` — 8-bit paletted +
   24-bit, both row orders), the rawvid video container
   (``decode_rawvid``), and PCM WAV (``decode_wav``) — real pixels, real nearest-neighbor resize, real
   per-frame luma features. These paths are bit-deterministic pure
   functions of the bytes, so they are always on, even under the stub
   contract.
2. **Other compressed formats need PIL/ffmpeg**: PIL is probed at import
   (``HAS_PIL``). ``decode_stub=False`` requires it (raises
   ``NotImplementedError`` where absent — this runtime ships neither
   PIL nor ffmpeg); ``decode_stub=None`` opts into auto (real codec
   when the DRIVER sees PIL) for exploratory use — don't put it in a
   pipeline whose outputs feed hashes/dedup, and note a
   driver-with-PIL / executors-without cluster will surface the gap as
   a kernel-side NotImplementedError at task time.
3. **Everything else** under ``decode_stub=True`` (the default) falls
   back to the deterministic byte-statistics stand-in — output is a
   pure function of the bytes, never of the runtime's libraries.

The Spark-side plumbing — schema, batching, partition sizing — is
identical in every tier; swapping kernels changes no plan shape.

Scale notes: binary payloads dominate partition size; ``repartition`` by
size-bucket before decode keeps Arrow batches bounded (a 100 MB video and
a 10 kB thumbnail should not share a batch budget). Feature outputs are
small and columnar — the natural handoff to the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

try:  # probe once; kernels re-import inside the worker process
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _resolve_stub(decode_stub: bool | None) -> bool:
    """None = auto (real codec when available); True = force stub;
    False = require real codec."""
    if decode_stub is None:
        return not HAS_PIL
    if decode_stub is False and not HAS_PIL:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not in this runtime"
        )
    return bool(decode_stub)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_s double"
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest. Always the
    first stage — lets dedup/filtering prune before any decode."""
    p = F.col(payload_col)
    return df.withColumn("n_bytes", F.length(p)).withColumn("digest", F.md5(p))


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for the uncompressed netpbm formats — pure
    numpy, zero codec dependency, a bit-deterministic pure function of
    the bytes (so it is allowed even under the stub reproducibility
    contract). P6 (binary RGB) -> (h, w, 3) uint8; P5 (binary gray) ->
    (h, w) uint8. Raises ValueError on anything else."""
    if not (payload.startswith(b"P6") or payload.startswith(b"P5")):
        raise ValueError("not a binary netpbm payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    ch = 3 if payload.startswith(b"P6") else 1
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    return raw.reshape((h, w, 3)) if ch == 3 else raw.reshape((h, w))


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (P6 for (h,w,3), P5 for (h,w))."""
    a = np.ascontiguousarray(arr.astype(np.uint8))
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w,3) or (h,w), got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


# ---------------------------------------------------------------------------
# PNG — the most common real-world image format, decoded library-free:
# stdlib zlib inflate + the five PNG scanline filters in numpy/ints.
# Bit depths 8 and 16, color types 0 (gray) / 2 (RGB) / 3 (palette) /
# 4 (gray+alpha) / 6 (RGBA), both progressive layouts (non-interlaced
# and Adam7). A bit-deterministic pure function of the bytes -> tier 1
# (always on).
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _decode_scanlines(
    raw: bytes, offset: int, w: int, h: int, ch: int, depth: int
) -> tuple["np.ndarray", int]:
    """Unfilter one scanline block (a whole image or one Adam7 pass):
    returns ``(samples, bytes_consumed)`` with samples shaped
    (h, w*ch) in uint8 (depth 8) or uint16 (depth 16, big-endian
    words per spec). Filters operate bytewise with bpp = ch * depth/8."""
    sb = depth // 8
    stride = w * ch * sb
    bpp = ch * sb
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("IDAT too short for dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = offset
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        prev = _unfilter_scanline(ft, line, prev, bpp)
        out[y] = prev
        pos += 1 + stride
    if depth == 16:
        pairs = out.reshape(h, w * ch, 2).astype(np.uint16)
        return (pairs[..., 0] << 8) | pairs[..., 1], pos - offset
    return out, pos - offset


def _unfilter_scanline(
    ft: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """One PNG scanline, filter type ``ft`` removed. Filters 0/1/2 are
    vectorized (Sub is a per-lane mod-256 cumsum); Average/Paeth carry a
    left-neighbor recurrence, unfiltered with a per-byte integer loop —
    fine at gate scale, and real deployments route compressed images
    through PIL executors when present anyway."""
    if ft == 0:
        return line.copy()
    if ft == 1:  # Sub: out[x] = line[x] + out[x-bpp]
        lanes = line.reshape(-1, bpp).astype(np.uint32)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).ravel()
    if ft == 2:  # Up
        return line + prev  # uint8 wraps mod 256
    out = line.copy()
    n = out.shape[0]
    if ft == 3:  # Average
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if ft == 4:  # Paeth
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(line[i]) + pred) & 0xFF
        return out
    raise ValueError(f"unknown PNG filter type {ft}")


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode with zero codec dependency: CRC-checked chunk
    walk, stdlib ``zlib`` inflate, the five scanline filters removed in
    numpy; bit depths 8 and 16 (big-endian words -> uint16 output),
    non-interlaced AND Adam7 progressive layouts. Returns (h, w) for
    grayscale, (h, w, 2) gray+alpha, (h, w, 3) RGB (palette images
    expand here), (h, w, 4) RGBA — dtype uint8 or uint16 per depth.
    Raises ValueError on non-PNG bytes or unsupported depth/type."""
    import struct
    import zlib

    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, idat = len(PNG_MAGIC), []
    w = h = ct = bitd = interlace = None
    palette = None
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, bitd, ct, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bitd not in (8, 16):
                raise ValueError(f"only 8/16-bit depth supported, got {bitd}")
            if ct not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {ct}")
            if ct == 3 and bitd != 8:
                raise ValueError("palette images require depth 8")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("no IHDR chunk")
    ch = _PNG_CHANNELS[ct]
    raw = zlib.decompress(b"".join(idat))
    dtype = np.uint16 if bitd == 16 else np.uint8
    if interlace == 0:
        grid, used = _decode_scanlines(raw, 0, w, h, ch, bitd)
        if used != len(raw):
            raise ValueError("IDAT length does not match dimensions")
        full = grid.reshape(h, w, ch)
    else:  # Adam7: seven sub-images, each its own filtered block
        full = np.zeros((h, w, ch), dtype=dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = len(range(x0, w, dx))
            ph = len(range(y0, h, dy))
            if pw == 0 or ph == 0:
                continue
            sub, used = _decode_scanlines(raw, off, pw, ph, ch, bitd)
            off += used
            full[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        if off != len(raw):
            raise ValueError("IDAT length does not match Adam7 passes")
    if ct == 3:
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        return palette[full.reshape(h, w)].reshape((h, w, 3))
    return full.reshape((h, w)) if ch == 1 else full


def _filter_block(block: "np.ndarray", bpp: int, filter_type) -> bytes:
    """Filter a scanline block (one image or one Adam7 pass): ``block``
    is (h, stride) uint8 sample bytes; returns the filtered scanlines
    with their per-row filter-type prefix bytes."""
    h = block.shape[0]
    flat = block.astype(np.int32)
    zeros = np.zeros((1, block.shape[1]), dtype=np.int32)
    prev = np.vstack([zeros, flat[:-1]])
    left = np.pad(flat, ((0, 0), (bpp, 0)))[:, : block.shape[1]]
    upleft = np.pad(prev, ((0, 0), (bpp, 0)))[:, : block.shape[1]]

    def _row(y: int, ft: int) -> bytes:
        r, p, l, ul = flat[y], prev[y], left[y], upleft[y]
        if ft == 0:
            f = r
        elif ft == 1:
            f = r - l
        elif ft == 2:
            f = r - p
        elif ft == 3:
            f = r - ((l + p) >> 1)
        else:  # Paeth predictor
            pr = l + p - ul
            pa, pb, pc = np.abs(pr - l), np.abs(pr - p), np.abs(pr - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), l, np.where(pb <= pc, p, ul)
            )
            f = r - pred
        return bytes([ft]) + (f % 256).astype(np.uint8).tobytes()

    return b"".join(
        _row(y, (y % 5) if filter_type == "mixed" else int(filter_type))
        for y in range(h)
    )


def encode_png(
    arr: np.ndarray, filter_type: int | str = 0, interlace: bool = False
) -> bytes:
    """Inverse of :func:`decode_png` for (h,w) gray / (h,w,2)
    gray+alpha / (h,w,3) RGB / (h,w,4) RGBA — uint8 (depth 8) or
    uint16 (depth 16, big-endian words). ``filter_type``: one of 0-4
    applied to every row, or ``"mixed"`` = row index mod 5 (the
    round-trip gate uses mixed so decode exercises all five filters).
    ``interlace=True`` writes the Adam7 progressive layout."""
    import struct
    import zlib

    depth = 16 if np.asarray(arr).dtype == np.uint16 else 8
    a = np.ascontiguousarray(
        arr.astype(np.uint16 if depth == 16 else np.uint8)
    )
    if a.ndim == 2:
        ct, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        ch = a.shape[2]
        ct = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"expected (h,w[,2|3|4]), got {arr.shape}")
    h, w = a.shape[0], a.shape[1]
    sb = depth // 8
    bpp = ch * sb

    def to_bytes(sub: "np.ndarray") -> "np.ndarray":
        ph, pw = sub.shape[0], sub.shape[1]
        if depth == 16:
            s16 = sub.reshape(ph, pw * ch).astype(np.uint16)
            out = np.empty((ph, pw * ch * 2), dtype=np.uint8)
            out[:, 0::2] = (s16 >> 8).astype(np.uint8)
            out[:, 1::2] = (s16 & 0xFF).astype(np.uint8)
            return out
        return sub.reshape(ph, pw * ch).astype(np.uint8)

    if not interlace:
        scan = _filter_block(to_bytes(a), bpp, filter_type)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(_filter_block(to_bytes(sub), bpp, filter_type))
        scan = b"".join(parts)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 1 if interlace else 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _luma(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 grayscale — fixed coefficients, deterministic. Alpha
    channels (gray+alpha, RGBA) are dropped before weighting."""
    if img.ndim == 2:
        return img.astype(np.float64)
    if img.shape[2] == 2:  # gray + alpha
        return img[..., 0].astype(np.float64)
    f = img.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def _fake_decode(payload: bytes) -> np.ndarray:
    """Library-free decode chain: netpbm AND PNG payloads decode for
    REAL (pure numpy + stdlib zlib, real pixels -> luma -> chunk means);
    anything else falls back to the deterministic byte-statistics
    stand-in. Both paths are pure functions of the bytes — the
    reproducibility contract holds."""
    if payload.startswith(b"P6") or payload.startswith(b"P5"):
        arr = _luma(decode_ppm(payload)).ravel()
    elif payload.startswith(PNG_MAGIC):
        arr = _luma(decode_png(payload)).ravel()
    elif payload.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        arr = _luma(decode_jpeg(payload)).ravel()
    elif payload.startswith(b"GIF8"):
        from .gif import decode_gif

        arr = _luma(decode_gif(payload)).ravel()
    elif payload.startswith(b"BM"):
        from .bmp import decode_bmp

        arr = _luma(decode_bmp(payload)).ravel()
    else:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real decode: grayscale pixel values, chunk-meaned to FEATURE_DIM
    (same featurization contract as the stub, real pixels in)."""
    import io

    try:
        import PIL.Image
    except ImportError as e:  # driver had PIL, this executor doesn't
        raise NotImplementedError(
            "real media decode requires PIL on every executor"
        ) from e

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.float64).ravel()
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    decode_stub: bool | None = True,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (one Arrow batch at a time).

    Output schema = input columns minus the payload, plus
    ``features array<double>`` — payload is dropped post-decode so the
    shuffle that follows moves features, not bytes.
    """
    use_stub = _resolve_stub(decode_stub)
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if use_stub else _pil_decode
        for pdf in batches:
            feats = [
                decode(bytes(b) if b is not None else b"") for b in pdf[payload_col]
            ]
            out = pdf[keep].copy()
            out[out_col] = [f.tolist() for f in feats]
            yield out

    return df.mapInPandas(kernel, schema)


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
    decode_stub: bool | None = True,
    out_col: str = "resized",
) -> DataFrame:
    """Resize per-row payload -> resized payload + recorded target dims,
    Arrow-batched. Real mode decodes with PIL, resizes to ``target`` and
    re-encodes PNG; stub 'resize' is a deterministic byte-subsample to
    w*h bytes. Plan shape is identical either way."""
    use_stub = _resolve_stub(decode_stub)
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} binary, out_width int, out_height int"
    w, h = target

    def _stub_resize(b: bytes) -> bytes:
        # netpbm and PNG payloads resize for REAL: nearest-neighbor
        # index grid (pure numpy, deterministic), re-encoded in the
        # same format
        if b.startswith(b"P6") or b.startswith(b"P5"):
            img = decode_ppm(b)
            ih, iw = img.shape[0], img.shape[1]
            ys = (np.arange(h) * ih) // h
            xs = (np.arange(w) * iw) // w
            return encode_ppm(img[ys][:, xs])
        if b.startswith(PNG_MAGIC):
            img = decode_png(b)
            ih, iw = img.shape[0], img.shape[1]
            ys = (np.arange(h) * ih) // h
            xs = (np.arange(w) * iw) // w
            return encode_png(img[ys][:, xs])
        if b.startswith(b"\xff\xd8"):
            from .jpeg import decode_jpeg, encode_jpeg

            img = decode_jpeg(b)
            ih, iw = img.shape[0], img.shape[1]
            ys = (np.arange(h) * ih) // h
            xs = (np.arange(w) * iw) // w
            return encode_jpeg(img[ys][:, xs], quality=95)
        if b.startswith(b"GIF8"):
            from .gif import decode_gif, encode_gif

            img = decode_gif(b)
            ih, iw = img.shape[0], img.shape[1]
            ys = (np.arange(h) * ih) // h
            xs = (np.arange(w) * iw) // w
            return encode_gif(img[ys][:, xs])
        if b.startswith(b"BM"):
            from .bmp import decode_bmp, encode_bmp

            img = decode_bmp(b)
            ih, iw = img.shape[0], img.shape[1]
            ys = (np.arange(h) * ih) // h
            xs = (np.arange(w) * iw) // w
            return encode_bmp(img[ys][:, xs])
        n = w * h
        if len(b) == 0:
            return b""
        if len(b) >= n:
            step = len(b) // n
            return b[::step][:n]
        return (b * (n // len(b) + 1))[:n]

    def _pil_resize(b: bytes) -> bytes:
        import io

        try:
            import PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                "real media resize requires PIL on every executor"
            ) from e

        if len(b) == 0:
            return b""
        img = PIL.Image.open(io.BytesIO(b)).resize((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize = _stub_resize if use_stub else _pil_resize
        for pdf in batches:
            outs = [resize(bytes(b) if b is not None else b"") for b in pdf[payload_col]]
            out = pdf[keep].copy()
            out[out_col] = outs
            out["out_width"] = w
            out["out_height"] = h
            yield out

    return df.mapInPandas(kernel, schema)


#: Raw-video container: magic + uint16 w + uint16 h + uint16 n_frames
#: (big-endian), then n_frames concatenated raw RGB frames. The
#: uncompressed stand-in for a real codec container — lets the video
#: path run REAL frame slicing and per-frame featurization with zero
#: library dependencies (ffmpeg integration would replace only
#: ``decode_video_frames``'s inner parser, not the plan shape).
RAWVID_MAGIC = b"RVID"


def encode_rawvid(frames: "np.ndarray") -> bytes:
    """(n, h, w, 3) uint8 -> container bytes."""
    f = np.ascontiguousarray(frames.astype(np.uint8))
    n, h, w, _ = f.shape
    import struct

    return RAWVID_MAGIC + struct.pack(">HHH", w, h, n) + f.tobytes()


def decode_rawvid(payload: bytes) -> "np.ndarray":
    """Container bytes -> (n, h, w, 3) uint8. Pure function of bytes."""
    import struct

    if not payload.startswith(RAWVID_MAGIC):
        raise ValueError("not a rawvid payload")
    w, h, n = struct.unpack(">HHH", payload[4:10])
    raw = np.frombuffer(payload, dtype=np.uint8, count=n * h * w * 3, offset=10)
    return raw.reshape((n, h, w, 3))


def decode_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    stride: int = 2,
    max_frames: int = 8,
) -> DataFrame:
    """REAL frame sampling + featurization for rawvid payloads: every
    ``stride``-th frame (up to ``max_frames``) becomes one output row
    with its luma chunk-mean features — the explode-then-featurize shape
    an ffmpeg-backed pipeline would have, Arrow-batched, payload dropped
    before anything shuffles. Non-rawvid payloads yield no rows (route
    compressed formats through a PIL/ffmpeg kernel when available)."""
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, frame_idx int, features array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in enumerate(pdf[payload_col]):
                payload = bytes(b) if b is not None else b""
                if not payload.startswith(RAWVID_MAGIC):
                    continue
                frames = decode_rawvid(payload)
                idxs = list(range(0, frames.shape[0], stride))[:max_frames]
                for fi in idxs:
                    lum = _luma(frames[fi]).ravel()
                    chunks = np.array_split(lum, FEATURE_DIM)
                    feats = [c.mean() if c.size else 0.0 for c in chunks]
                    rec = {c: pdf[c].iloc[i] for c in keep}
                    rec["frame_idx"] = fi
                    rec["features"] = feats
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=keep + ["frame_idx", "features"])

    return df.mapInPandas(kernel, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    frame index — the explode pattern a video pipeline needs. Stubbed
    frame extraction (byte-slice stand-in); see
    :func:`decode_video_frames` for the real rawvid path."""
    n = F.least(
        F.greatest(F.floor(F.length(payload_col) / every_n_bytes), F.lit(1)),
        F.lit(max_frames),
    ).cast("int")
    return (
        df.withColumn("_n_frames", n)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("_n_frames") - 1)))
        .withColumn(
            "frame_bytes",
            F.substring(
                F.col(payload_col), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ),
        )
        .drop("_n_frames")
    )


# ---------------------------------------------------------------------------
# audio: PCM WAV (uncompressed) — the third real library-free codec
# ---------------------------------------------------------------------------


def encode_wav(samples: "np.ndarray", rate: int = 16_000) -> bytes:
    """Mono 16-bit PCM WAV from an int16 sample array — RIFF container
    assembled with struct, no audio library."""
    import struct

    s = np.ascontiguousarray(samples.astype("<i2"))
    data = s.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """(sample_rate, int16 samples) from a mono 16-bit PCM WAV. Walks
    RIFF chunks (tolerates extra chunks before ``data``). Pure function
    of the bytes."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1:
                raise ValueError(f"only PCM supported, got format {fmt_tag}")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise ValueError(f"only mono 16-bit supported ({channels}ch {bits}bit)")
            return rate, np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
) -> DataFrame:
    """REAL audio featurization for WAV payloads: FEATURE_DIM per-chunk
    RMS energies plus a zero-crossing-rate column — the standard cheap
    audio descriptors, computed from real samples, Arrow-batched,
    payload dropped before anything shuffles. Non-WAV payloads yield
    null features (route compressed audio through an ffmpeg kernel when
    available)."""
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} array<double>, zcr double, sample_rate int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, zcrs, rates = [], [], []
            for b in pdf[payload_col]:
                payload = bytes(b) if b is not None else b""
                if not payload.startswith(b"RIFF"):
                    feats.append(None), zcrs.append(None), rates.append(None)
                    continue
                rate, s = decode_wav(payload)
                x = s.astype(np.float64)
                if x.size == 0:
                    feats.append([0.0] * FEATURE_DIM), zcrs.append(0.0)
                    rates.append(rate)
                    continue
                chunks = np.array_split(x, FEATURE_DIM)
                feats.append(
                    [float(np.sqrt((c * c).mean())) if c.size else 0.0 for c in chunks]
                )
                zcrs.append(
                    float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    / max(x.size - 1, 1)
                )
                rates.append(rate)
            out = pdf[keep].copy()
            out[out_col] = feats
            out["zcr"] = zcrs
            out["sample_rate"] = rates
            yield out

    return df.mapInPandas(kernel, schema)


def scene_cuts(
    df: DataFrame,
    payload_col: str = "payload",
    id_cols: list[str] | None = None,
    threshold_num: int = 10,
) -> DataFrame:
    """Shot-boundary detection over rawvid payloads: for every adjacent
    frame pair, the integer sum of absolute pixel differences; a cut is
    flagged when mean |diff| exceeds ``threshold_num`` — compared as
    ``diff_sum > threshold_num * n_px`` so the decision is pure integer
    arithmetic (q279 replays it). The frame-sampling front end of video
    curation: sample AT cuts instead of blindly every Nth frame.

    Output: id columns + (frame_idx >= 1, diff_sum, is_cut). Arrow-
    batched per payload; payloads never shuffle."""
    id_cols = id_cols or ["media_id"]
    schema_fields = ", ".join(
        f"`{c}` {t}" for c, t in df.dtypes if c in id_cols
    )
    schema = f"{schema_fields}, frame_idx int, diff_sum long, is_cut boolean"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames = decode_rawvid(bytes(r[payload_col]))
                n_px = int(np.prod(frames.shape[1:]))
                prev = frames[0].astype(np.int64)
                for f in range(1, frames.shape[0]):
                    cur = frames[f].astype(np.int64)
                    d = int(np.abs(cur - prev).sum())
                    rows.append(
                        {
                            **{c: r[c] for c in id_cols},
                            "frame_idx": f,
                            "diff_sum": d,
                            "is_cut": d > threshold_num * n_px,
                        }
                    )
                    prev = cur
            yield pd.DataFrame(
                rows, columns=id_cols + ["frame_idx", "diff_sum", "is_cut"]
            )

    return df.select(*id_cols, payload_col).mapInPandas(kernel, schema)
