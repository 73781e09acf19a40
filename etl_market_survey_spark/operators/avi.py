"""MJPEG-in-AVI: a REAL compressed video container over the library-free
JPEG codec (:mod:`.jpeg`) — the video half of the "no codec is a stub"
claim (FLAC closed audio, VERDICT r5 item 8; this closes ROADMAP item
1's video row).

Format (public spec: Microsoft RIFF/AVI, msdn "AVI RIFF File
Reference"; OpenDML for the chunk ids):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' <56>  main header: dwMicroSecPerFrame, dwMaxBytesPerSec,
                     padding, dwFlags (HASINDEX), dwTotalFrames, 0,
                     dwStreams=1, dwSuggestedBufferSize, dwWidth,
                     dwHeight, 4 reserved dwords
        LIST 'strl'
          'strh' <56>  fccType 'vids', fccHandler 'MJPG',
                       dwScale/dwRate = exact fps ratio, dwLength
          'strf' <40>  BITMAPINFOHEADER, biCompression 'MJPG'
      LIST 'movi'
        '00dc' <n> JPEG bytes   (word-aligned: odd chunks get one pad
        ...                      byte NOT counted in the chunk size)
      'idx1'  16 bytes/frame: ckid, AVIIF_KEYFRAME, offset (relative to
              the start of the 'movi' list data, per the original spec),
              size — every MJPEG frame is a keyframe

Each frame payload is an independent baseline JPEG (that IS the MJPEG
"codec": there is no inter-frame state), so frame extraction
parallelizes trivially — at 100 TB every worker seeks straight to its
file's movi list; no cross-frame dependency ever shuffles.

Exactness regime (same as the q256/q355 JPEG gates): constant 8x8
blocks with even values + the flat Q=16 table survive quantization
exactly, so ``decode(encode(frames)) == frames`` bit-for-bit and the
q374 oracle replays every pixel as md5 arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_AVIIF_KEYFRAME = 0x10
_AVIF_HASINDEX = 0x10


def _chunk(ckid: bytes, body: bytes) -> bytes:
    """RIFF chunk: id + size + body (+ pad byte to word-align; the pad
    is NOT counted in the size field)."""
    pad = b"\x00" if len(body) % 2 else b""
    return ckid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames,
    fps: int = 25,
    *,
    quality: int = 75,
    luma_table: np.ndarray | None = None,
) -> bytes:
    """Encode a sequence of ``(h, w)`` grayscale or ``(h, w, 3)`` RGB
    uint8 frames as an MJPEG AVI. All frames must share one shape.
    ``luma_table=QT_FLAT16`` is the exact-gate regime."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("all frames must share one shape")
    if fps <= 0:
        raise ValueError("fps must be positive")
    h, w = shape[0], shape[1]

    payloads = [
        encode_jpeg(f, quality=quality, luma_table=luma_table)
        for f in frames
    ]
    max_sz = max(len(p) for p in payloads)

    # movi list data + original-spec idx1 (offsets relative to the
    # start of the movi list DATA, i.e. offset 0 points at 'movi')
    movi_body = bytearray(b"movi")
    idx = bytearray()
    for p in payloads:
        # offset is relative to the 'movi' fourcc (offset 4 = first
        # chunk header), which is movi_body's current length
        idx += b"00dc" + struct.pack(
            "<III", _AVIIF_KEYFRAME, len(movi_body), len(p)
        )
        movi_body += _chunk(b"00dc", p)
    movi = _chunk(b"LIST", bytes(movi_body))

    avih = struct.pack(
        "<IIIIIIIIII",
        round(1_000_000 / fps),       # dwMicroSecPerFrame (informational)
        max_sz * fps,                 # dwMaxBytesPerSec
        0,                            # dwPaddingGranularity
        _AVIF_HASINDEX,               # dwFlags
        len(payloads),                # dwTotalFrames
        0,                            # dwInitialFrames
        1,                            # dwStreams
        max_sz,                       # dwSuggestedBufferSize
        w,
        h,
    ) + b"\x00" * 16                  # dwReserved[4]

    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,                  # flags, priority, language
            0,                        # initial frames
            1, fps,                   # dwScale / dwRate: EXACT fps
            0,                        # start
            len(payloads),            # length (frames)
            max_sz,                   # suggested buffer size
            0xFFFFFFFF,               # quality (default)
            0,                        # sample size (varies)
        )
        + struct.pack("<hhhh", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (ckid, body_start, body_size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        ckid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield ckid, pos + 8, size
        pos += 8 + size + (size % 2)  # skip the uncounted pad byte


def avi_info(payload: bytes) -> dict:
    """Container metadata without decoding any frame — the cheap
    planning pass (width/height/fps/frame count/handler)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    info: dict = {}
    for ckid, b0, sz in _walk_chunks(payload, 12, 8 + riff_size):
        if ckid != b"LIST" or payload[b0:b0 + 4] != b"hdrl":
            continue
        for c2, b2, s2 in _walk_chunks(payload, b0 + 4, b0 + sz):
            if c2 == b"avih":
                (mspf, _, _, flags, n, _, streams, _, w, h) = struct.unpack_from(
                    "<IIIIIIIIII", payload, b2
                )
                info.update(
                    width=w, height=h, n_frames=n, n_streams=streams,
                    has_index=bool(flags & _AVIF_HASINDEX),
                )
            elif c2 == b"LIST" and payload[b2:b2 + 4] == b"strl":
                for c3, b3, s3 in _walk_chunks(payload, b2 + 4, b2 + s2):
                    if c3 == b"strh":
                        info["fcc_type"] = payload[b3:b3 + 4].decode("ascii")
                        info["handler"] = payload[b3 + 4:b3 + 8].decode("ascii")
                        scale, rate = struct.unpack_from("<II", payload, b3 + 20)
                        if scale:
                            info["fps"] = rate / scale
    if "width" not in info:
        raise ValueError("no avih header found")
    return info


def decode_avi_mjpeg(payload: bytes) -> tuple[float, np.ndarray]:
    """Decode an MJPEG AVI to ``(fps, frames)`` where frames is
    ``(n, h, w)`` or ``(n, h, w, 3)`` uint8. Validates the container
    magic, the MJPG handler, the idx1 entries against the movi chunks,
    and the frame count against the main header."""
    info = avi_info(payload)
    if info.get("handler") not in ("MJPG", "mjpg"):
        raise ValueError(f"not an MJPEG stream: {info.get('handler')!r}")
    (riff_size,) = struct.unpack_from("<I", payload, 4)

    frames: list[np.ndarray] = []
    chunk_sizes: list[int] = []
    idx_entries: list[tuple[int, int]] = []
    for ckid, b0, sz in _walk_chunks(payload, 12, 8 + riff_size):
        if ckid == b"LIST" and payload[b0:b0 + 4] == b"movi":
            for c2, b2, s2 in _walk_chunks(payload, b0 + 4, b0 + sz):
                if c2 in (b"00dc", b"00db"):
                    frames.append(decode_jpeg(payload[b2:b2 + s2]))
                    chunk_sizes.append(s2)
        elif ckid == b"idx1":
            for off in range(0, sz, 16):
                _ckid, flags, _o, size = struct.unpack_from(
                    "<4sIII", payload, b0 + off
                )
                if _ckid in (b"00dc", b"00db"):
                    idx_entries.append((flags, size))
    if len(frames) != info["n_frames"]:
        raise ValueError(
            f"avih says {info['n_frames']} frames, movi has {len(frames)}"
        )
    if idx_entries:
        if [s for _, s in idx_entries] != chunk_sizes:
            raise ValueError("idx1 sizes disagree with movi chunks")
        if any(not (f & _AVIIF_KEYFRAME) for f, _ in idx_entries):
            raise ValueError("MJPEG frames must all be keyframes")
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("frame shape changed mid-stream")
    return float(info.get("fps") or 0.0), np.stack(frames)
