"""DSP kernels (operators/dsp) + scene cuts — gates q279/q280 cover the
corpus paths; units pin the signal math on known inputs."""

import math

import numpy as np
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.dsp import audio_tone_features, goertzel_coeff


def test_goertzel_detects_matching_bin(spark):
    n, k = 64, 8  # bin 8 of 64 = period 8
    rows = []
    for key, period in (("match", 8), ("miss", 16)):
        for i in range(n):
            v = 1000 if (i // (period // 2)) % 2 == 0 else -1000
            rows.append((key, i, v))
    df = spark.createDataFrame(rows, "key string, n long, x long")
    got = {
        r["key"]: r for r in audio_tone_features(df, ["key"], "x", "n", k, n).collect()
    }
    assert got["match"]["goertzel_power"] > 10 * got["miss"]["goertzel_power"]
    # square wave of period p crosses zero 2/p of the time
    assert got["match"]["zero_crossings"] == 2 * n // 8 - 1
    assert got["miss"]["zero_crossings"] == 2 * n // 16 - 1
    assert got["match"]["n_samples"] == n


def test_goertzel_pure_tone_energy():
    # sanity on the coefficient itself
    assert goertzel_coeff(0, 8) == 2.0
    assert abs(goertzel_coeff(2, 8)) < 1e-15  # cos(pi/2) = 0


def test_scene_cuts_flags_boundaries(spark):
    from etl_market_survey_spark.operators.multimodal import (
        encode_rawvid,
        scene_cuts,
    )

    frames = np.zeros((6, 4, 4, 3), dtype=np.uint8)
    frames[3:] = 200  # one hard cut at frame 3
    df = spark.createDataFrame(
        [(1, bytearray(encode_rawvid(frames)))], "media_id long, payload binary"
    )
    rows = {r["frame_idx"]: r for r in scene_cuts(df, "payload", ["media_id"]).collect()}
    assert len(rows) == 5
    assert rows[3]["is_cut"] and rows[3]["diff_sum"] == 200 * 4 * 4 * 3
    assert all(not rows[i]["is_cut"] for i in (1, 2, 4, 5))
