"""Library-free GIF codec (operators/gif) — q268 gates the corpus
path; units pin the LZW layer, spec vectors, interlace, palettes, and
reject paths."""

import numpy as np
import pytest

from etl_market_survey_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_known_minimal_spec_vector():
    # classic 1x1 white-pixel GIF89a
    known = bytes(
        [0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80,
         0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x00, 0x2C, 0x00, 0x00,
         0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0x02, 0x02, 0x44, 0x01,
         0x00, 0x3B]
    )
    assert decode_gif(known).tolist() == [[[255, 255, 255]]]


def test_lzw_roundtrip_with_dictionary_reset():
    r = np.random.RandomState(0)
    for n in (2, 13, 100, 5000, 20000):
        for alpha, mcs in ((4, 2), (130, 8)):
            seq = r.randint(0, alpha, size=n).astype(np.uint8)
            out = _lzw_decode(_lzw_encode(seq, mcs), mcs, n)
            np.testing.assert_array_equal(out, seq)


def test_roundtrip_palettes_and_interlace():
    r = np.random.RandomState(7)
    for ncol in (2, 5, 16, 130, 256):
        pal = r.randint(0, 256, size=(ncol, 3), dtype=np.uint8)
        im = pal[r.randint(0, ncol, size=(21, 17))]
        for inter in (False, True):
            np.testing.assert_array_equal(
                decode_gif(encode_gif(im, interlace=inter)), im
            )


def test_grayscale_input_becomes_rgb():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(out, np.stack([img] * 3, axis=-1))


def test_extension_blocks_skipped():
    img = np.full((4, 4), 9, dtype=np.uint8)
    payload = bytearray(encode_gif(img))
    i = payload.index(0x2C, 13)
    # inject a graphic-control extension before the image descriptor
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(payload[:i]) + ext + bytes(payload[i:])
    np.testing.assert_array_equal(decode_gif(patched), decode_gif(bytes(payload)))


def test_rejects():
    with pytest.raises(ValueError):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    i = np.arange(300)
    many = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=-1).astype(
        np.uint8
    ).reshape(20, 15, 3)  # 300 distinct colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(many)


def test_bmp_roundtrips_and_rejects():
    from etl_market_survey_spark.operators.bmp import decode_bmp, encode_bmp

    r = np.random.RandomState(3)
    rgb = r.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(rgb)), rgb)
    gray = r.randint(0, 256, size=(5, 9), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_bmp(encode_bmp(gray)), np.stack([gray] * 3, axis=-1)
    )
    # top-down variant: negate height in the header, drop the row flip
    payload = bytearray(encode_bmp(rgb))
    import struct as st

    h = st.unpack("<i", payload[22:26])[0]
    payload[22:26] = st.pack("<i", -h)
    flipped = decode_bmp(bytes(payload))
    np.testing.assert_array_equal(flipped, rgb[::-1])
    with pytest.raises(ValueError):
        decode_bmp(b"GIF89a")
