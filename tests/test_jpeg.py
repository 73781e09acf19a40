"""Library-free baseline JPEG codec (operators/jpeg) — tier-1 gate.

The codec must be a bit-deterministic pure function of the bytes; these
units pin the exact-roundtrip regime the q256 gate relies on (constant
even-valued blocks under the flat Q=16 table), the near-lossless q=100
regime, color + subsampling, restart markers, and the reject paths.
"""

import numpy as np
import pytest

from etl_market_survey_spark.operators.jpeg import (
    QT_FLAT16,
    _build_codes,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    scale_quant_table,
    QT_LUMA,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


def test_exact_roundtrip_constant_even_blocks():
    # 8x8-constant blocks with even values: DC = 8*(v-128) quantizes
    # losslessly under Q00=16, AC = 0 -> decode(encode(x)) == x exactly.
    # This is the q256 gate regime.
    r = _rng()
    blocks = (r.randint(-40, 41, size=(4, 6)) * 2 + 128).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg(img, luma_table=QT_FLAT16))
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_exact_roundtrip_with_restart_markers():
    r = _rng(11)
    blocks = (r.randint(-40, 41, size=(3, 5)) * 2 + 128).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    payload = encode_jpeg(img, luma_table=QT_FLAT16, restart_interval=2)
    # restart markers must actually be present in the stream
    assert any(
        payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7
        for i in range(2, len(payload) - 2)
    )
    np.testing.assert_array_equal(decode_jpeg(payload), img)


def test_near_lossless_q100_gray():
    # q=100 -> all-ones table: error is pure DCT float roundoff, <= 1
    r = _rng(3)
    img = r.randint(0, 256, size=(24, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == img.shape
    assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 1


def test_lossy_q75_smooth_gradient_close():
    y, x = np.mgrid[0:32, 0:48]
    img = ((x * 3 + y * 2) % 200 + 20).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 4.0, err.mean()


def test_color_444_roundtrip_close():
    r = _rng(5)
    img = np.zeros((16, 24, 3), dtype=np.uint8)
    img[..., 0] = r.randint(60, 196, size=(16, 24))
    img[..., 1] = img[..., 0]  # low-chroma content, kind to 4:4:4
    img[..., 2] = img[..., 0]
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="444"))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.max()) <= 8, err.max()


def test_color_420_constant_chroma_close():
    # constant-color image: chroma planes constant -> 4:2:0 subsample +
    # replication upsample are exact; only DCT/quant roundoff remains
    img = np.zeros((20, 28, 3), dtype=np.uint8)  # non-multiple of 16 dims
    img[..., 0] = 180
    img[..., 1] = 90
    img[..., 2] = 40
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.max()) <= 4, err.max()


def test_gray_odd_dims_edge_padding():
    # 13x19: partial edge blocks exercise the replicate-pad path; the
    # visible region must still round-trip exactly in the flat regime
    img = np.full((13, 19), 136, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, luma_table=QT_FLAT16))
    assert out.shape == (13, 19)
    np.testing.assert_array_equal(out, img)


def test_byte_stuffing_writer_reader_roundtrip():
    # deterministic stuffing unit: a 0xFF entropy byte must be emitted
    # as FF 00 and read back transparently
    from etl_market_survey_spark.operators.jpeg import _BitReader, _BitWriter

    w = _BitWriter()
    w.write(0xFF, 8)
    w.write(0x12, 8)
    w.flush()
    assert bytes(w.out) == b"\xff\x00\x12"
    r = _BitReader(bytes(w.out) + b"\xff\xd9", 0)
    assert r.read_bits(8) == 0xFF
    assert r.read_bits(8) == 0x12


def test_quality_scaling_formula():
    q50 = scale_quant_table(QT_LUMA, 50)
    np.testing.assert_array_equal(q50, QT_LUMA)  # scale=100 -> identity
    q100 = scale_quant_table(QT_LUMA, 100)
    assert q100.max() == 1  # all-ones
    q10 = scale_quant_table(QT_LUMA, 10)
    assert q10.max() == 255  # clamped
    with pytest.raises(ValueError):
        scale_quant_table(QT_LUMA, 0)


def test_huffman_canonical_assignment():
    # spec C.2 example property: codes are consecutive within a length,
    # strictly increasing across lengths after the shift
    codes = _build_codes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)


def test_rejects_non_jpeg_and_arithmetic():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    img = np.full((8, 8), 128, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg(bytes(payload))
    # a baseline scan header (Ss=0, Se=63) inside an SOF2 stream is
    # malformed progressive data and must still be rejected
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_decoder_reads_foreign_table_ids_and_app_segments():
    # decoder must not assume OUR emission order: inject an extra APP1
    # segment and a COM before SOF and still decode
    img = np.full((16, 16), 200, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, luma_table=QT_FLAT16))
    extra = b"\xff\xe1" + (len(b"Exif\x00\x00") + 2).to_bytes(2, "big") + b"Exif\x00\x00"
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    i = payload.index(b"\xff\xdb")
    patched = bytes(payload[:i]) + extra + com + bytes(payload[i:])
    np.testing.assert_array_equal(decode_jpeg(patched), img)


# --- progressive (SOF2) mode — VERDICT r4 item 4 ------------------------


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((16, 16), "444"),
        ((24, 17), "444"),  # non-multiple-of-8 edges
        ((32, 32, 3), "444"),
        ((24, 19, 3), "420"),  # subsampled chroma, ragged edges
        ((8, 8), "444"),
    ],
)
def test_progressive_decode_matches_baseline(shape, sub):
    """Progressive is a REORDERING of the same quantized coefficients:
    once every scan has landed, decode must equal the baseline decode of
    the same image bit-for-bit."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=75, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=75, subsampling=sub))
    np.testing.assert_array_equal(base, prog)


def test_progressive_flat16_lossless_roundtrip():
    """The q256 exact-gate regime (even constant blocks, Q=16 flat
    table) must round-trip losslessly through the progressive path too
    — the property the q355 gate relies on."""
    rng = np.random.default_rng(11)
    blocks = (128 + 2 * rng.integers(-40, 41, size=(3, 2))).astype(np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_jpeg_progressive(img, luma_table=QT_FLAT16))
    np.testing.assert_array_equal(out, img)


def test_progressive_spectral_selection_only_script():
    """Spectral selection without successive approximation (Ah=Al=0
    throughout) is the other legal progressive organization; a custom
    scan script exercises it."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    scans = [
        dict(comps=[0], ss=0, se=0, ah=0, al=0),
        dict(comps=[0], ss=1, se=9, ah=0, al=0),
        dict(comps=[0], ss=10, se=63, ah=0, al=0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=50))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=50, scans=scans))
    np.testing.assert_array_equal(base, prog)


def test_progressive_high_quality_dense_coefficients():
    """quality=95 leaves many nonzero AC coefficients -> the refinement
    scans exercise correction bits, ZRL skips, and newly-nonzero
    placement densely."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(40, 33, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=95))
    np.testing.assert_array_equal(base, prog)
