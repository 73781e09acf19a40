

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
