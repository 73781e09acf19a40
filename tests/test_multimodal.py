

# ---------------------------------------------------------------------------
# real library-free codecs: netpbm images + rawvid video
# ---------------------------------------------------------------------------


def _ppm(w, h, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    from etl_market_survey_spark.operators.multimodal import encode_ppm

    return img, encode_ppm(img)


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    img, payload = _ppm(7, 5, seed=3)
    assert np.array_equal(decode_ppm(payload), img)
    # header comments are legal netpbm
    commented = payload.replace(b"\n7 5\n", b"\n# made for tests\n7 5\n", 1)
    assert np.array_equal(decode_ppm(commented), img)
    # grayscale P5
    g = img[:, :, 0]
    assert np.array_equal(decode_ppm(encode_ppm(g)), g)


def test_ppm_features_are_real_pixels(spark):
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    img, payload = _ppm(16, 16, seed=1)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = extract_features(df).collect()[0]
    lum = (
        0.299 * img[..., 0].astype(float)
        + 0.587 * img[..., 1].astype(float)
        + 0.114 * img[..., 2].astype(float)
    ).ravel()
    want = [c.mean() for c in np.array_split(lum, FEATURE_DIM)]
    assert row.features == want


def test_ppm_resize_real_nearest_neighbor(spark):
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        decode_ppm,
        resize_media,
    )

    img, payload = _ppm(8, 8, seed=2)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = resize_media(df, target=(4, 4)).collect()[0]
    got = decode_ppm(bytes(row.resized))
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(got, img[ys][:, xs])
    assert (row.out_width, row.out_height) == (4, 4)


def test_rawvid_frame_sampling_real(spark):
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_rawvid,
        decode_video_frames,
        encode_rawvid,
    )

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, size=(6, 4, 4, 3), dtype=np.uint8)
    payload = encode_rawvid(frames)
    assert np.array_equal(decode_rawvid(payload), frames)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    out = decode_video_frames(df, stride=2, max_frames=8).collect()
    assert sorted(r.frame_idx for r in out) == [0, 2, 4]
    assert all(r.media_id == 1 for r in out)  # non-rawvid row yields none
    r0 = next(r for r in out if r.frame_idx == 0)
    lum = (
        0.299 * frames[0][..., 0].astype(float)
        + 0.587 * frames[0][..., 1].astype(float)
        + 0.114 * frames[0][..., 2].astype(float)
    ).ravel()
    want = [c.mean() for c in np.array_split(lum, FEATURE_DIM)]
    assert r0.features == want


def test_wav_roundtrip_and_features(spark):
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        FEATURE_DIM,
        audio_features,
        decode_wav,
        encode_wav,
    )

    rng = np.random.RandomState(4)
    samples = rng.randint(-32768, 32768, size=2048, dtype=np.int16)
    payload = encode_wav(samples, rate=8000)
    rate, back = decode_wav(payload)
    assert rate == 8000 and np.array_equal(back, samples)

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"mp3junk"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in audio_features(df).collect()}
    x = samples.astype(float)
    want = [
        float(np.sqrt((c * c).mean()))
        for c in np.array_split(x, FEATURE_DIM)
    ]
    assert rows[1].features == want and rows[1].sample_rate == 8000
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / (
        len(x) - 1
    )
    assert rows[1].zcr == zc
    assert rows[2].features is None  # non-WAV -> null, no crash


def test_wav_tolerates_extra_chunks():
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import decode_wav, encode_wav

    s = np.arange(-5, 5, dtype=np.int16)
    p = encode_wav(s)
    # splice a LIST chunk between fmt and data
    import struct

    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = p[:fmt_end] + extra + p[fmt_end:]
    rate, back = decode_wav(spliced)
    assert np.array_equal(back, s)


def test_png_roundtrip_all_shapes_and_filters():
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(42)
    for shape in [(13, 17), (13, 17, 2), (13, 17, 3), (13, 17, 4), (1, 1)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for ft in [0, 1, 2, 3, 4, "mixed"]:
            back = decode_png(encode_png(img, filter_type=ft))
            assert back.shape == img.shape and (back == img).all(), (shape, ft)


def test_png_palette_and_crc_guard():
    import struct
    import zlib

    import numpy as np
    import pytest

    from etl_market_survey_spark.operators.multimodal import decode_png

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    plte = b"".join(bytes([i, 255 - i, i // 2]) for i in range(4))
    scan = b"".join(b"\x00" + bytes([0, 1, 2, 3]) for _ in range(2))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 4, 3)
    assert tuple(out[0, 1]) == (1, 254, 0)
    assert np.array_equal(out[0], out[1])

    corrupted = png[:40] + bytes([png[40] ^ 0xFF]) + png[41:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(corrupted)


def test_png_features_and_resize_are_real_pixels(spark):
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_png,
        encode_png,
        extract_features,
        resize_media,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_png(img, filter_type="mixed")
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = extract_features(df).collect()[0]
    lum = (
        0.299 * img[..., 0].astype(float)
        + 0.587 * img[..., 1].astype(float)
        + 0.114 * img[..., 2].astype(float)
    ).ravel()
    want = [c.mean() for c in np.array_split(lum, FEATURE_DIM)]
    assert row.features == want

    rrow = resize_media(df, target=(4, 4)).collect()[0]
    got = decode_png(bytes(rrow.resized))
    ys = (np.arange(4) * 16) // 4
    xs = (np.arange(4) * 16) // 4
    assert np.array_equal(got, img[ys][:, xs])


def test_png_16bit_and_adam7_roundtrip():
    import numpy as np

    from etl_market_survey_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for shape in [(13, 17), (13, 17, 3), (13, 17, 4), (1, 1), (8, 8, 2)]:
        for dt in [np.uint8, np.uint16]:
            hi = 256 if dt == np.uint8 else 65536
            img = rng.randint(0, hi, size=shape).astype(dt)
            for interlace in [False, True]:
                back = decode_png(
                    encode_png(img, filter_type="mixed", interlace=interlace)
                )
                assert back.dtype == img.dtype
                assert back.shape == img.shape
                assert (back == img).all(), (shape, dt, interlace)
