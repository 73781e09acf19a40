"""Library-free FLAC codec — the first real COMPRESSED audio format
here (ROADMAP item 1's last codec gap; WAV/rawvideo were already real,
ffmpeg formats were stubs).

Implemented from the published format (xiph.org/flac/format, now RFC
9639), same recipe as the JPEG/PNG/GIF codecs in this package:

* container: ``fLaC`` marker, STREAMINFO metadata block (block sizes,
  sample rate, channels, bits-per-sample, total samples, MD5 of the
  raw audio), other metadata blocks skipped;
* frames: 14-bit sync, fixed-blocksize strategy, UTF-8-coded frame
  number, CRC-8 header check and CRC-16 frame check (both verified on
  decode — a corrupt byte fails loudly, not wrongly);
* subframes: CONSTANT, VERBATIM, FIXED predictors order 0-4 (the
  s[i] = k-th order difference reconstruction), and LPC (quantized
  coefficients + shift) on the decode side;
* residuals: Rice coding (zigzag map, unary quotient, 4- or 5-bit
  parameters, partition orders, and the escape-to-raw-bits case).

The encoder emits mono 16-bit streams with per-block best-of FIXED
order 0-4 and a per-block exhaustive Rice parameter search — genuine
compression (typically 50-70% of PCM on smooth signals), decodable by
any FLAC player. The decoder additionally handles LPC subframes,
independent stereo, and partitioned residuals, so externally encoded
files read too. Both directions are integer-exact: FLAC is lossless
by construction, and the round trip is gated bit-for-bit (q372) the
same way q256/q355 gate the JPEG paths.

Scale shape: a codec is a per-payload Arrow kernel — used inside
``mapInPandas`` over binary columns, payloads never shuffle
uncompressed (see operators/multimodal.py).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110

# block-size code table (frame header, 4 bits); None = reserved/coded
_BS_OF_CODE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_CODE_OF_BS = {v: k for k, v in _BS_OF_CODE.items()}

_RATE_OF_CODE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}

_BPS_OF_CODE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}
_CODE_OF_BPS = {v: k for k, v in _BPS_OF_CODE.items()}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — the whole-frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits:
            self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
            self.nbits += bits
            while self.nbits >= 8:
                self.nbits -= 8
                self.buf.append((self.acc >> self.nbits) & 0xFF)
        # keep acc bounded
        self.acc &= (1 << self.nbits) - 1 if self.nbits else 0

    def write_unary(self, q: int):
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding for frame/sample numbers (like
    UTF-8 but extended to 36-bit values / 7-byte sequences)."""
    if n < 0x80:
        return bytes([n])
    for cont, head, headbits in (
        (1, 0xC0, 5), (2, 0xE0, 4), (3, 0xF0, 3),
        (4, 0xF8, 2), (5, 0xFC, 1), (6, 0xFE, 0),
    ):
        if n < 1 << (headbits + 6 * cont):
            out = [head | (n >> (6 * cont))]
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    cont = 0
    mask = 0x40
    while b0 & mask:
        cont += 1
        mask >>= 1
    if cont < 1 or cont > 6:
        raise ValueError("bad UTF-8 coded number")
    n = b0 & (mask - 1) if mask else 0
    for _ in range(cont):
        nb = br.read(8)
        if nb & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        n = (n << 6) | (nb & 0x3F)
    return n


# fixed predictor residual: order-k forward difference
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _best_rice_param(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int(np.sum(u >> p)) + len(u) * (p + 1)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 4096) -> bytes:
    """Mono int16 samples -> a spec-conformant FLAC stream (FIXED
    predictors, one Rice partition per subframe)."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int64)
    n = len(x)
    md5 = hashlib.md5(
        np.asarray(samples, dtype="<i2").tobytes()
    ).digest()

    # STREAMINFO: all blocks block_size except a shorter last one
    last = n % block_size or block_size if n else 0
    min_bs = min(block_size, last) if n else block_size
    si = _BitWriter()
    si.write(min_bs, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(0, 3)   # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    streaminfo = si.bytes() + md5

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize strategy
        bs_code = _CODE_OF_BS.get(bs)
        w.write(bs_code if bs_code else 0b0111, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(0, 4)  # channel assignment: mono
        w.write(_CODE_OF_BPS[16], 3)
        w.write(0, 1)  # reserved
        for b in _utf8_number(fi):
            w.write(b, 8)
        if not bs_code:
            w.write(bs - 1, 16)
        w.align()
        hdr = bytes(w.buf)
        w.write(_crc8(hdr), 8)

        # choose the cheapest FIXED order by zigzag-sum heuristic
        best_order, best_cost = 0, None
        for order in range(min(4, bs - 1) + 1):
            res = _fixed_residual(blk, order)
            cost = int(np.sum(_zigzag(res))) if len(res) else 0
            if best_cost is None or cost < best_cost:
                best_order, best_cost = order, cost
        order = best_order
        res = _fixed_residual(blk, order)

        w.write(0, 1)  # subframe pad bit
        w.write(0b001000 | order, 6)  # FIXED, order
        w.write(0, 1)  # no wasted bits
        for v in blk[:order]:  # warmup, verbatim bps bits
            w.write(int(v), 16)
        u = _zigzag(res)
        p = _best_rice_param(u)
        w.write(0, 2)  # residual method: 4-bit Rice
        w.write(0, 4)  # partition order 0
        # escape if raw would be cheaper (pathological residuals)
        raw_bits = int(u.max()).bit_length() + 1 if len(u) else 2
        if raw_bits > 30:
            raise ValueError("residual exceeds encodable range")
        if len(u) and int(np.sum(u >> p)) + len(u) * (p + 1) > raw_bits * len(u):
            w.write(0b1111, 4)
            w.write(raw_bits, 5)
            for r in res:
                w.write(int(r), raw_bits)
        else:
            w.write(p, 4)
            for q in u:
                w.write_unary(int(q) >> p)
                w.write(int(q), p)
        w.align()
        body = w.bytes()
        out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


def decode_flac(payload: bytes, verify_md5: bool = True):
    """FLAC stream -> (sample_rate, samples). Mono and independent
    stereo; CONSTANT / VERBATIM / FIXED / LPC subframes; Rice and
    Rice2 residuals with partitions and escapes. CRC-8/CRC-16/MD5
    verified."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos]
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min block
    si.read(16)  # max block
    si.read(24)
    si.read(24)
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_expect = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != _SYNC:
            raise ValueError("lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        else:
            bs = _BS_OF_CODE[bs_code]
        if rate_code == 0b1100:
            br.read(8)
        elif rate_code in (0b1101, 0b1110):
            br.read(16)
        br.align()
        hdr_crc = br.read(8)
        if _crc8(payload[frame_start : br.byte - 1]) != hdr_crc:
            raise ValueError("frame header CRC-8 mismatch")
        fbps = _BPS_OF_CODE[bps_code] if bps_code else bps

        if chan_code < 0b1000:
            n_sub = chan_code + 1
            side = None
        else:
            n_sub, side = 2, chan_code  # 1000 L/S, 1001 R/S, 1010 M/S
        subs = []
        for ci in range(n_sub):
            sbps = fbps
            if side is not None:
                # the SIDE channel carries one extra bit
                if (side == 0b1000 and ci == 1) or \
                   (side == 0b1001 and ci == 0) or \
                   (side == 0b1010 and ci == 1):
                    sbps += 1
            subs.append(_decode_subframe(br, bs, sbps))
        br.align()
        crc = br.read(16)
        if _crc16(payload[frame_start : br.byte - 2]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.byte

        if side == 0b1000:  # left/side: right = left - side
            left, s = subs
            subs = [left, [left[i] - s[i] for i in range(bs)]]
        elif side == 0b1001:  # right/side: left = right + side
            s, right = subs
            subs = [[right[i] + s[i] for i in range(bs)], right]
        elif side == 0b1010:  # mid/side
            mid, s = subs
            subs = [
                [(((mid[i] << 1) | (s[i] & 1)) + s[i]) >> 1 for i in range(bs)],
                [(((mid[i] << 1) | (s[i] & 1)) - s[i]) >> 1 for i in range(bs)],
            ]
        for ci in range(channels):
            chans[ci].extend(subs[ci])
        got += bs

    for ci in range(channels):
        chans[ci] = chans[ci][:total]
    dtype = np.int16 if bps <= 16 else np.int32
    if channels == 1:
        arr = np.array(chans[0], dtype=dtype)
        raw = arr.astype("<i2").tobytes() if bps == 16 else None
    else:
        arr = np.stack([np.array(c, dtype=dtype) for c in chans], axis=1)
        raw = arr.astype("<i2").tobytes() if bps == 16 else None
    if verify_md5 and raw is not None and md5_expect != b"\x00" * 16:
        if hashlib.md5(raw).digest() != md5_expect:
            raise ValueError("decoded audio MD5 mismatch")
    return rate, arr


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe pad bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if t == 0b000000:  # CONSTANT
        v = br.read_signed(bps)
        out = [v] * bs
    elif t == 0b000001:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(bs)]
    elif 0b001000 <= t <= 0b001100:  # FIXED
        order = t & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = list(warm)
        for i, r in enumerate(res):
            if order == 0:
                out.append(r)
            elif order == 1:
                out.append(r + out[-1])
            elif order == 2:
                out.append(r + 2 * out[-1] - out[-2])
            elif order == 3:
                out.append(r + 3 * out[-1] - 3 * out[-2] + out[-3])
            else:
                out.append(r + 4 * out[-1] - 6 * out[-2] + 4 * out[-3]
                           - out[-4])
    elif t >= 0b100000:  # LPC
        order = (t & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.read_signed(5)
        coeffs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = list(warm)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append(r + (pred >> shift))
    else:
        raise ValueError(f"reserved subframe type {t:06b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(br: _BitReader, bs: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for pi in range(nparts):
        cnt = bs >> po
        if pi == 0:
            cnt -= order
        p = br.read(pbits)
        if p == escape:
            raw = br.read(5)
            vals = [br.read_signed(raw) if raw else 0 for _ in range(cnt)]
            out.extend(vals)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << p) | br.read(p)
                out.append((u >> 1) ^ -(u & 1))
    return out
