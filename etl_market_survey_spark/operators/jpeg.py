"""Library-free baseline JPEG codec (tier-1 multimodal, VERDICT r3 item 5).

Baseline sequential DCT JPEG (ITU-T T.81 / ISO 10918-1, the public spec)
implemented with stdlib + numpy only — no PIL, no libjpeg:

- **Encoder** (``encode_jpeg``): level shift, 8x8 forward DCT (float64
  matrix form), quantization with the Annex K example tables scaled by
  the IJG quality formula, zigzag, differential DC, run-length AC,
  canonical Huffman entropy coding with the Annex K example tables,
  0xFF byte stuffing, optional restart intervals. Grayscale, YCbCr
  4:4:4 and 4:2:0.
- **Decoder** (``decode_jpeg``): full marker parse (SOI/APPn/COM/DQT/
  SOF0/SOF2/DHT/DRI/SOS/EOI), canonical Huffman decode, dequantize,
  un-zigzag, inverse DCT, level shift + clamp, chroma replication
  upsample, JFIF YCbCr->RGB. Supports baseline sequential (SOF0) AND
  progressive (SOF2, since r5 — VERDICT r4 item 4): spectral selection,
  successive approximation (DC first/refine, AC first/refine with
  EOB-run and correction-bit semantics per T.81 G.2), interleaved DC
  scans, non-interleaved AC scans, restart markers. Arithmetic coding
  and hierarchical modes raise ``ValueError``.
- **Progressive encoder** (``encode_jpeg_progressive``): the same
  coefficient pipeline emitted as an SOF2 multi-scan stream (DC Al=1 →
  AC bands at Al>0 → AC refinement → DC refinement → final AC
  refinement to Al=0), used to synthesize test streams; EOB runs are
  flushed per block so the Annex K example tables stay sufficient.

Like the PNG codec (``multimodal.decode_png``), both directions are
bit-deterministic pure functions of their inputs: every float stage is
fixed-order float64 numpy arithmetic, so decode(bytes) is reproducible
across machines — the property the exact gate (q256) relies on. JPEG is
lossy, so the gate synthesizes images whose DCT coefficients survive
quantization exactly (even-valued constant 8x8 blocks under a Q00=16
table): for those, decode(encode(img)) == img bit-for-bit and the
oracle predicts every pixel with integer arithmetic.

Scale shape: the codec runs inside Arrow-batched ``mapInPandas`` kernels
(see ``multimodal.extract_features``) — per-payload Python cost, zero
driver involvement, payloads pruned/deduped by digest before any decode.

Reference parity: the reference pipeline (SengerM/ETL_market_survey)
has no media path at all — this module is beyond-reference surface for
the 100 TB curation use case.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K.1/K.2 example quantization tables (public spec) ------------

QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Flat DC-exact table: Q00=16 makes even-valued constant blocks
# round-trip losslessly (dequant DC = 16*round(8g/16) = 8g for even g).
QT_FLAT16 = np.full((8, 8), 16, dtype=np.int32)

# --- zigzag scan order (spec figure A.6) --------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)
UNZIGZAG = np.argsort(ZIGZAG)

# --- Annex K.3 example Huffman tables: (BITS counts 1..16, HUFFVAL) -----

HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# --- DCT basis (fixed-order float64: bit-deterministic) -----------------

_DCT_M = np.zeros((8, 8), dtype=np.float64)
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def scale_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# --- canonical Huffman code assignment (spec C.2) -----------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length); canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value; inverse of :func:`_build_codes`."""
    return {(ln, c): v for v, (c, ln) in _build_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Reads entropy-coded bits, unstuffing 0xFF00 and stopping at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("bit read past marker")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # spec: treat as if stream ended; pad value unused
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Discard pad bits and consume the RSTn marker."""
        self.nbits = 0
        if self.marker is None:
            if self.data[self.pos] != 0xFF:
                raise ValueError("expected restart marker")
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if self.marker != 0xD0 + (n % 8):
            raise ValueError(
                f"expected RST{n % 8}, got marker 0x{self.marker:02X}"
            )
        self.marker = None


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value -> (ssss, appended bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of :func:`_magnitude` (spec F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    if bits < (1 << (s - 1)):
        return bits - (1 << s) + 1
    return bits


# --- encoder ------------------------------------------------------------


def _encode_component_block(
    writer: _BitWriter,
    qcoef_zz: np.ndarray,
    pred_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(qcoef_zz[0])
    diff = dc - pred_dc
    s, bits = _magnitude(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(bits, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if qcoef_zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(qcoef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _quantize_block(pix: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """pix (8,8) uint8 -> zigzagged quantized int coefficients (64,)."""
    coef = _fdct(pix.astype(np.float64) - 128.0)
    q = np.round(coef / qt).astype(np.int32)  # numpy half-even, pinned
    return q.ravel()[ZIGZAG]


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, float64 (rounded at block-build time)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _prepare_planes(
    img: np.ndarray,
    quality: int,
    subsampling: str,
    luma_table: np.ndarray | None,
):
    """Shared encoder front end: color transform, subsample, MCU-pad.

    Returns ``(h, w, padded_planes, samp, qts, mcux, mcuy)``."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (h,w) or (h,w,3), got {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    qt_l = luma_table if luma_table is not None else scale_quant_table(QT_LUMA, quality)
    qt_c = scale_quant_table(QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if subsampling == "420":
            # box-filter 2x2 means over an edge-padded plane
            cb2 = _pad_to_blocks(cb, 2, 2)
            cr2 = _pad_to_blocks(cr, 2, 2)
            cb = (
                cb2[0::2, 0::2] + cb2[0::2, 1::2] + cb2[1::2, 0::2] + cb2[1::2, 1::2]
            ) / 4.0
            cr = (
                cr2[0::2, 0::2] + cr2[0::2, 1::2] + cr2[1::2, 0::2] + cr2[1::2, 1::2]
            ) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in planes]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to_blocks(p, 8 * sv, 8 * sh) for p, (sh, sv) in zip(planes, samp)
    ]
    # pad each plane to the full MCU grid for its sampling factor
    padded = [
        _pad_to_blocks(p, 8 * sv * mcuy, 8 * sh * mcux)[: 8 * sv * mcuy, : 8 * sh * mcux]
        if p.shape[0] < 8 * sv * mcuy or p.shape[1] < 8 * sh * mcux
        else p[: 8 * sv * mcuy, : 8 * sh * mcux]
        for p, (sh, sv) in zip(padded, samp)
    ]
    return h, w, padded, samp, qts, mcux, mcuy


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
    luma_table: np.ndarray | None = None,
) -> bytes:
    """Encode ``(h, w)`` grayscale or ``(h, w, 3)`` RGB uint8 to baseline
    sequential JPEG bytes. ``subsampling``: '444' or '420' (color only).
    ``luma_table`` overrides the quality-scaled Annex K luma table (the
    exact gate passes ``QT_FLAT16``)."""
    h, w, padded, samp, qts, mcux, mcuy = _prepare_planes(
        img, quality, subsampling, luma_table
    )
    n_comp = len(padded)
    dc_tabs = [_build_codes(*HT_DC_LUMA)] + [_build_codes(*HT_DC_CHROMA)] * (n_comp - 1)
    ac_tabs = [_build_codes(*HT_AC_LUMA)] + [_build_codes(*HT_AC_CHROMA)] * (n_comp - 1)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts[: 2 if n_comp > 1 else 1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(qt.ravel()[ZIGZAG][k]) for k in range(64)
        )
    # SOF0
    sof = struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for ci in range(n_comp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + sof
    # DHT (4 tables for color, 2 for gray)
    hts = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if n_comp > 1:
        hts += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tc, (bits, vals) in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos

    writer = _BitWriter()
    pred = [0] * n_comp
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                mcu_count = 0
                pred = [0] * n_comp
            for ci in range(n_comp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        zz = _quantize_block(block, qts[ci])
                        pred[ci] = _encode_component_block(
                            writer, zz, pred[ci], dc_tabs[ci], ac_tabs[ci]
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------


def _read_symbol(reader: _BitReader, m: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = m.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _decode_block(
    reader: _BitReader,
    pred_dc: int,
    dc_map: dict[tuple[int, int], int],
    ac_map: dict[tuple[int, int], int],
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)

    def read_symbol(m: dict[tuple[int, int], int]) -> int:
        return _read_symbol(reader, m)

    s = read_symbol(dc_map)
    diff = _extend(reader.read_bits(s), s) if s else 0
    dc = pred_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = read_symbol(ac_map)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline sequential (SOF0) or progressive (SOF2) JPEG
    bytes to ``(h, w)`` uint8 (grayscale stream) or ``(h, w, 3)`` uint8
    RGB. Raises ``ValueError`` on arithmetic/hierarchical/unsupported
    streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict[tuple[int, int], int]] = {}
    ac_maps: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, [(id, sh, sv, tq)])
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp (bh, bw, 64) int32
    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coef is not None:
                return _reconstruct_progressive(frame, qts, coef)
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if pq else 1)
                raw = seg[p : p + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                qt = np.zeros(64, dtype=np.int32)
                qt[ZIGZAG] = vals
                qts[tq] = qt.reshape(8, 8)
                p += n
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                m = _build_decode_map(bits, vals)
                (ac_maps if tc else dc_maps)[th] = m
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            h, w = struct.unpack(">HH", seg[1:5])
            n_comp = seg[5]
            comps = []
            for ci in range(n_comp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coef = [
                    np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int32)
                    for (_, sh, sv, _) in comps
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0x{marker:02X} (baseline/progressive only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tabs = {}
            scan_ids = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
                scan_ids.append(cid)
            if not progressive:
                pos += seg_len
                return _decode_scan(
                    payload, pos, frame, scan_tabs, qts, dc_maps, ac_maps,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos + seg_len, frame, scan_ids, scan_tabs,
                ss, se, ahal >> 4, ahal & 0x0F,
                dc_maps, ac_maps, restart_interval, coef,
            )
            continue
        # APPn / COM / others: skip
        pos += seg_len


def _decode_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan_tabs: dict,
    qts: dict,
    dc_maps: dict,
    ac_maps: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((8 * sv * mcuy, 8 * sh * mcux), dtype=np.float64)
        for (_, sh, sv, _) in comps
    ]
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                reader.align_and_expect_rst(rst_n)
                rst_n += 1
                mcu_count = 0
                pred = [0] * len(comps)
            for ci, (cid, sh, sv, tq) in enumerate(comps):
                td, ta = scan_tabs[cid]
                for by in range(sv):
                    for bx in range(sh):
                        zz, pred[ci] = _decode_block(
                            reader, pred[ci], dc_maps[td], ac_maps[ta]
                        )
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        deq = coef.reshape(8, 8) * qts[tq]
                        pix = _idct(deq) + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    return _finish_image(planes, comps, h, w, hmax, vmax, mcux, mcuy)


def _finish_image(
    planes: list[np.ndarray],
    comps: list,
    h: int,
    w: int,
    hmax: int,
    vmax: int,
    mcux: int,
    mcuy: int,
) -> np.ndarray:
    if len(comps) == 1:
        out = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return out
    # upsample chroma by replication to the luma grid, then color convert
    full = []
    for ci, (_, sh, sv, _) in enumerate(comps):
        p = planes[ci]
        if sh != hmax or sv != vmax:
            p = np.repeat(np.repeat(p, vmax // sv, axis=0), hmax // sh, axis=1)
        full.append(p[: 8 * vmax * mcuy, : 8 * hmax * mcux])
    ycc = np.stack(full, axis=-1)[:h, :w, :]
    # luma is rounded/clamped exactly like the grayscale path before the
    # color transform so gray-in-color streams match grayscale streams
    ycc = np.clip(np.round(ycc), 0, 255)
    return _ycbcr_to_rgb(ycc)


# --- progressive mode (SOF2): T.81 Annex G, Huffman coding --------------


def _comp_block_dims(frame: tuple, ci: int) -> tuple[int, int]:
    """Non-interleaved block grid of component ci: ceil over the ACTUAL
    component dimensions (NOT the MCU-padded grid) — spec A.2.2/G.1."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _, sh, sv, _ = comps[ci]
    ch = (h * sv + vmax - 1) // vmax
    cw = (w * sh + hmax - 1) // hmax
    return (ch + 7) // 8, (cw + 7) // 8


def _ac_first_block(
    reader: _BitReader,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_map: dict,
    eobrun: int,
) -> int:
    """First AC scan of a successive-approximation band (G.2.1)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(reader, ac_map)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of band")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(
    reader: _BitReader,
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_map: dict,
    eobrun: int,
) -> int:
    """AC refinement scan (G.2.2): newly-nonzero coefficients arrive as
    ±1<<Al symbols; already-nonzero coefficients receive one correction
    bit each as the scan passes over them; EOB runs cover whole blocks
    whose remaining nonzero coefficients still receive correction bits."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(reader, ac_map)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit():
                        if (abs(int(zz[k])) & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("AC refinement run past end of band")
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit():
                    if (abs(int(zz[k])) & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan_ids: list[int],
    scan_tabs: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_maps: dict,
    ac_maps: dict,
    restart_interval: int,
    coef: list[np.ndarray],
) -> int:
    """Decode one progressive scan into the coefficient grids; returns
    the stream position of the next marker."""
    h, w, comps = frame
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(data, pos)
    rst_n = 0

    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        cis = [cid_to_ci[cid] for cid in scan_ids]
        pred = {ci: 0 for ci in cis}
        interleaved = len(cis) > 1

        def dc_units():
            """Yield (ci, by, bx) in scan order."""
            if interleaved:
                for my in range(mcuy):
                    for mx in range(mcux):
                        yield None  # MCU boundary sentinel (restart cadence)
                        for ci in cis:
                            _, sh, sv, _ = comps[ci]
                            for by in range(sv):
                                for bx in range(sh):
                                    yield (ci, my * sv + by, mx * sh + bx)
            else:
                ci = cis[0]
                bh, bw = _comp_block_dims(frame, ci)
                for by in range(bh):
                    for bx in range(bw):
                        yield None
                        yield (ci, by, bx)

        count = 0
        for unit in dc_units():
            if unit is None:  # restart cadence checkpoint (per MCU/block)
                if restart_interval and count == restart_interval:
                    reader.align_and_expect_rst(rst_n)
                    rst_n += 1
                    count = 0
                    pred = {ci: 0 for ci in cis}
                count += 1
                continue
            ci, by, bx = unit
            zz = coef[ci][by, bx]
            if ah == 0:
                td = scan_tabs[comps[ci][0]][0]
                s = _read_symbol(reader, dc_maps[td])
                diff = _extend(reader.read_bits(s), s) if s else 0
                pred[ci] += diff
                zz[0] = pred[ci] << al
            else:
                if reader.read_bit():
                    zz[0] = int(zz[0]) | (1 << al)
    else:
        if len(scan_ids) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci = cid_to_ci[scan_ids[0]]
        ta = scan_tabs[scan_ids[0]][1]
        ac_map = ac_maps[ta]
        bh, bw = _comp_block_dims(frame, ci)
        eobrun = 0
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count == restart_interval:
                    reader.align_and_expect_rst(rst_n)
                    rst_n += 1
                    count = 0
                    eobrun = 0
                count += 1
                zz = coef[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(reader, zz, ss, se, al, ac_map, eobrun)
                else:
                    eobrun = _ac_refine_block(reader, zz, ss, se, al, ac_map, eobrun)

    # locate the next marker (pad bits may remain in the current byte)
    if reader.marker is not None:
        return reader.pos - 2
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    raise ValueError("unterminated progressive scan")


def _reconstruct_progressive(
    frame: tuple, qts: dict, coef: list[np.ndarray]
) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for ci, (_, sh, sv, tq) in enumerate(comps):
        grid = coef[ci]
        bh, bw = grid.shape[:2]
        plane = np.zeros((8 * bh, 8 * bw), dtype=np.float64)
        qt = qts[tq]
        for by in range(bh):
            for bx in range(bw):
                c = np.zeros(64, dtype=np.float64)
                c[ZIGZAG] = grid[by, bx]
                deq = c.reshape(8, 8) * qt
                plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = _idct(deq) + 128.0
        planes.append(plane)
    return _finish_image(planes, comps, h, w, hmax, vmax, mcux, mcuy)


# --- progressive encoder ------------------------------------------------


def _default_scan_script(n_comp: int) -> list[dict]:
    """A libjpeg-shaped successive-approximation script: coarse DC, AC
    bands at reduced precision, then refinement passes down to full
    precision (every coefficient is delivered exactly by the end)."""
    if n_comp == 1:
        return [
            dict(comps=[0], ss=0, se=0, ah=0, al=1),
            dict(comps=[0], ss=1, se=5, ah=0, al=2),
            dict(comps=[0], ss=6, se=63, ah=0, al=2),
            dict(comps=[0], ss=1, se=63, ah=2, al=1),
            dict(comps=[0], ss=0, se=0, ah=1, al=0),
            dict(comps=[0], ss=1, se=63, ah=1, al=0),
        ]
    return [
        dict(comps=[0, 1, 2], ss=0, se=0, ah=0, al=1),
        dict(comps=[0], ss=1, se=5, ah=0, al=2),
        dict(comps=[2], ss=1, se=63, ah=0, al=1),
        dict(comps=[1], ss=1, se=63, ah=0, al=1),
        dict(comps=[0], ss=6, se=63, ah=0, al=2),
        dict(comps=[0], ss=1, se=63, ah=2, al=1),
        dict(comps=[0, 1, 2], ss=0, se=0, ah=1, al=0),
        dict(comps=[2], ss=1, se=63, ah=1, al=0),
        dict(comps=[1], ss=1, se=63, ah=1, al=0),
        dict(comps=[0], ss=1, se=63, ah=1, al=0),
    ]


def _encode_ac_first_block(
    writer: _BitWriter, band: np.ndarray, al: int, ac_codes: dict
) -> None:
    vals = [
        (int(abs(int(v))) >> al) * (1 if v > 0 else -1) for v in band
    ]
    run = 0
    last_nz = -1
    for i, v in enumerate(vals):
        if v != 0:
            last_nz = i
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if last_nz != len(vals) - 1:
        code, ln = ac_codes[0x00]  # EOB (run of exactly one block)
        writer.write(code, ln)


def _encode_ac_refine_block(
    writer: _BitWriter, band: np.ndarray, ah: int, al: int, ac_codes: dict
) -> None:
    p_corr: list[int] = []  # buffered correction bits
    run = 0
    emitted_any = False
    for v in band:
        v = int(v)
        if (abs(v) >> ah) != 0:  # already nonzero in earlier scans
            p_corr.append((abs(v) >> al) & 1)
            continue
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        # newly nonzero: t == 1 by construction of successive approximation
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            for b in p_corr:
                writer.write(b, 1)
            p_corr = []
            run -= 16
        code, ln = ac_codes[(run << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if v > 0 else 0, 1)
        for b in p_corr:
            writer.write(b, 1)
        p_corr = []
        run = 0
        emitted_any = True
    if run > 0 or p_corr:
        code, ln = ac_codes[0x00]  # EOB flushes the rest of this block
        writer.write(code, ln)
        for b in p_corr:
            writer.write(b, 1)
    del emitted_any


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    luma_table: np.ndarray | None = None,
    scans: list[dict] | None = None,
) -> bytes:
    """Encode to progressive (SOF2) JPEG bytes. Same coefficient
    pipeline as :func:`encode_jpeg`; the entropy layer follows a
    successive-approximation scan script (``_default_scan_script`` or a
    caller-supplied list of ``dict(comps, ss, se, ah, al)``). Decoding
    with :func:`decode_jpeg` reproduces the baseline decode of the same
    image bit-for-bit (unit-asserted): progressive is a reordering of
    the same quantized coefficients, not a different approximation."""
    h, w, padded, samp, qts, mcux, mcuy = _prepare_planes(
        img, quality, subsampling, luma_table
    )
    n_comp = len(padded)
    # quantized coefficient grids on the MCU-padded geometry
    grids = []
    for ci in range(n_comp):
        sh, sv = samp[ci]
        g = np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int32)
        for by in range(mcuy * sv):
            for bx in range(mcux * sh):
                g[by, bx] = _quantize_block(
                    padded[ci][8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8], qts[ci]
                )
        grids.append(g)

    dc_tabs = [_build_codes(*HT_DC_LUMA)] + [_build_codes(*HT_DC_CHROMA)] * (n_comp - 1)
    ac_tabs = [_build_codes(*HT_AC_LUMA)] + [_build_codes(*HT_AC_CHROMA)] * (n_comp - 1)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts[: 2 if n_comp > 1 else 1]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(qt.ravel()[ZIGZAG][k]) for k in range(64)
        )
    sof = struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for ci in range(n_comp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + sof  # SOF2: progressive DCT, Huffman
    hts = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if n_comp > 1:
        hts += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tc, (bits, vals) in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc)
        out += bytes(bits) + bytes(vals)

    frame_comps = [
        (ci + 1, samp[ci][0], samp[ci][1], 0 if ci == 0 else 1)
        for ci in range(n_comp)
    ]
    frame = (h, w, frame_comps)

    for scan in scans or _default_scan_script(n_comp):
        cis, ss, se = scan["comps"], scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        sos = struct.pack(">HB", 6 + 2 * len(cis), len(cis))
        for ci in cis:
            sos += bytes([ci + 1, (ci and 0x11) or 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + sos
        writer = _BitWriter()
        if ss == 0:
            if ah == 0:
                pred = {ci: 0 for ci in cis}
                if len(cis) > 1:
                    units = (
                        (ci, my * samp[ci][1] + by, mx * samp[ci][0] + bx)
                        for my in range(mcuy)
                        for mx in range(mcux)
                        for ci in cis
                        for by in range(samp[ci][1])
                        for bx in range(samp[ci][0])
                    )
                else:
                    ci0 = cis[0]
                    bh, bw = _comp_block_dims(frame, ci0)
                    units = (
                        (ci0, by, bx) for by in range(bh) for bx in range(bw)
                    )
                for ci, by, bx in units:
                    v = int(grids[ci][by, bx, 0]) >> al
                    s, bits = _magnitude(v - pred[ci])
                    code, ln = dc_tabs[ci][s]
                    writer.write(code, ln)
                    if s:
                        writer.write(bits, s)
                    pred[ci] = v
            else:
                if len(cis) > 1:
                    units = (
                        (ci, my * samp[ci][1] + by, mx * samp[ci][0] + bx)
                        for my in range(mcuy)
                        for mx in range(mcux)
                        for ci in cis
                        for by in range(samp[ci][1])
                        for bx in range(samp[ci][0])
                    )
                else:
                    ci0 = cis[0]
                    bh, bw = _comp_block_dims(frame, ci0)
                    units = (
                        (ci0, by, bx) for by in range(bh) for bx in range(bw)
                    )
                for ci, by, bx in units:
                    writer.write((int(grids[ci][by, bx, 0]) >> al) & 1, 1)
        else:
            (ci,) = cis
            bh, bw = _comp_block_dims(frame, ci)
            for by in range(bh):
                for bx in range(bw):
                    band = grids[ci][by, bx, ss : se + 1]
                    if ah == 0:
                        _encode_ac_first_block(writer, band, al, ac_tabs[ci])
                    else:
                        _encode_ac_refine_block(writer, band, ah, al, ac_tabs[ci])
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
