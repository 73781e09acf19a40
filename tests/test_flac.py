"""FLAC codec (operators/flac): bit-exact round trips across signal
shapes, CRC/MD5 corruption detection, and hand-built streams for the
decode-only paths (LPC subframes, independent stereo, partitioned
residuals) that the FIXED-predictor encoder never emits."""

import struct

import numpy as np
import pytest

from etl_market_survey_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _SYNC,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _round_trip(x, rate=16000, **kw):
    blob = encode_flac(x, rate=rate, **kw)
    got_rate, back = decode_flac(blob)
    assert got_rate == rate
    assert np.array_equal(back, np.asarray(x, dtype=np.int16))
    return blob


class TestRoundTrip:
    def test_smooth_multi_block(self):
        rng = np.random.default_rng(5)
        x = np.cumsum(rng.integers(-25, 26, 10000)).clip(-30000, 30000)
        blob = _round_trip(x.astype(np.int16))
        # genuinely compresses a smooth signal
        assert len(blob) < 2 * len(x) * 0.7

    def test_noise_uses_escape_but_stays_exact(self):
        rng = np.random.default_rng(6)
        x = rng.integers(-32768, 32768, 5000).astype(np.int16)
        _round_trip(x)

    def test_constant_and_tiny(self):
        _round_trip(np.full(4097, 77, np.int16))  # crosses block boundary
        _round_trip(np.array([1, -1], np.int16))
        _round_trip(np.array([0], np.int16))

    def test_extremes(self):
        _round_trip(np.array([32767, -32768, 32767, -32768] * 50, np.int16))

    def test_non_default_block_size(self):
        rng = np.random.default_rng(7)
        x = np.cumsum(rng.integers(-10, 11, 3000)).astype(np.int16)
        _round_trip(x, block_size=1024)


class TestIntegrity:
    def test_frame_corruption_detected(self):
        x = np.cumsum(np.ones(2000)).astype(np.int16)
        blob = bytearray(encode_flac(x))
        blob[-20] ^= 0xFF  # inside the last frame body
        with pytest.raises(ValueError):
            decode_flac(bytes(blob))

    def test_md5_mismatch_detected(self):
        x = np.arange(500, dtype=np.int16)
        blob = bytearray(encode_flac(x))
        # STREAMINFO md5 lives at bytes [8+18, 8+34) of the stream
        blob[8 + 20] ^= 0x01
        with pytest.raises(ValueError, match="MD5"):
            decode_flac(bytes(blob))

    def test_not_flac_rejected(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            decode_flac(b"RIFFxxxxWAVE")


def _streaminfo(n, rate=8000, channels=1, bps=16, block=16):
    w = _BitWriter()
    w.write(block, 16)
    w.write(block, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)
    body = w.bytes() + b"\x00" * 16  # md5 zero = unknown, skips verify
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(w, bs_code, chan_code, frame_no=0):
    w.write(_SYNC, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(bs_code, 4)
    w.write(0, 4)          # rate from STREAMINFO
    w.write(chan_code, 4)
    w.write(0b100, 3)      # 16 bps
    w.write(0, 1)
    for b in _utf8_number(frame_no):
        w.write(b, 8)


def _finish_frame(w):
    w.align()
    hdr = bytes(w.buf)
    # header CRC-8 goes at the first byte boundary after the header —
    # callers of this helper write it inline; here we only close the
    # frame with its CRC-16
    w2 = bytes(w.buf)
    return w2 + struct.pack(">H", _crc16(w2))


class TestHandBuiltStreams:
    """Streams our encoder never writes, decoded against independently
    computed expectations."""

    def test_lpc_subframe(self):
        # bs=16, mono; LPC order 2, coeffs (2, -1) with shift 0:
        # s[i] = 2*s[i-1] - s[i-2] + r[i]  (a linear ramp predictor)
        bs = 16
        warm = [100, 110]
        res = [0, 3, -2, 0, 1, 0, 0, -1, 2, 0, 0, 0, 1, -3]
        expect = list(warm)
        for r in res:
            expect.append(r + 2 * expect[-1] - expect[-2])

        w = _BitWriter()
        _frame_header(w, 0b0110, 0b0000)
        w.write(bs - 1, 8)   # blocksize-1, 8-bit form
        w.align()
        w.write(_crc8(bytes(w.buf)), 8)
        w.write(0, 1)
        w.write(0b100000 | (2 - 1), 6)  # LPC order 2
        w.write(0, 1)
        for v in warm:
            w.write(v, 16)
        w.write(15 - 1, 4)   # precision 15 bits
        w.write(0, 5)        # shift 0
        w.write(2, 15)
        w.write(-1, 15)
        w.write(0, 2)        # rice, 4-bit params
        w.write(0, 4)        # partition order 0
        w.write(2, 4)        # rice param 2
        for r in res:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            w.write_unary(u >> 2)
            w.write(u, 2)
        blob = _streaminfo(bs) + _finish_frame(w)
        rate, got = decode_flac(blob)
        assert rate == 8000
        assert got.tolist() == expect

    def test_independent_stereo_verbatim(self):
        bs = 8
        left = [10, -10, 20, -20, 30, -30, 40, -40]
        right = [1, 2, 3, 4, 5, 6, 7, 8]
        w = _BitWriter()
        _frame_header(w, 0b0110, 0b0001)  # 2 channels, independent
        w.write(bs - 1, 8)
        w.align()
        w.write(_crc8(bytes(w.buf)), 8)
        for chan in (left, right):
            w.write(0, 1)
            w.write(0b000001, 6)  # VERBATIM
            w.write(0, 1)
            for v in chan:
                w.write(v, 16)
        blob = _streaminfo(bs, channels=2) + _finish_frame(w)
        _, got = decode_flac(blob)
        assert got.shape == (bs, 2)
        assert got[:, 0].tolist() == left and got[:, 1].tolist() == right

    def test_partitioned_residual(self):
        # FIXED order 1, partition order 1 -> two partitions with
        # different rice parameters (7 + 8 residuals over bs=16)
        bs = 16
        warm = [50]
        res = [1, -1, 2, 0, 0, -2, 1] + [8, -9, 12, 0, -15, 7, 3, -4]
        expect = list(warm)
        for r in res:
            expect.append(r + expect[-1])

        w = _BitWriter()
        _frame_header(w, 0b0110, 0b0000)
        w.write(bs - 1, 8)
        w.align()
        w.write(_crc8(bytes(w.buf)), 8)
        w.write(0, 1)
        w.write(0b001000 | 1, 6)  # FIXED order 1
        w.write(0, 1)
        w.write(warm[0], 16)
        w.write(0, 2)
        w.write(1, 4)  # partition order 1
        for part, p in ((res[:7], 1), (res[7:], 3)):
            w.write(p, 4)
            for r in part:
                u = (r << 1) if r >= 0 else ((-r << 1) - 1)
                w.write_unary(u >> p)
                w.write(u, p)
        blob = _streaminfo(bs) + _finish_frame(w)
        _, got = decode_flac(blob)
        assert got.tolist() == expect

    def test_constant_subframe(self):
        bs = 8
        w = _BitWriter()
        _frame_header(w, 0b0110, 0b0000)
        w.write(bs - 1, 8)
        w.align()
        w.write(_crc8(bytes(w.buf)), 8)
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(0, 1)
        w.write(-777, 16)
        blob = _streaminfo(bs) + _finish_frame(w)
        _, got = decode_flac(blob)
        assert got.tolist() == [-777] * bs
