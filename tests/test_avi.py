"""MJPEG-in-AVI container (operators/avi): RIFF structure goldens,
exact round-trip in the flat-Q constant-block regime, idx1/header
cross-validation, and failure modes."""

import struct

import numpy as np
import pytest

from etl_market_survey_spark.operators.avi import (
    avi_info,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from etl_market_survey_spark.operators.jpeg import QT_FLAT16


def _exact_frames(n=4, bh=2, bw=3, seed=11):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        blocks = (128 + 2 * rng.randint(-40, 41, size=(bh, bw))).astype(
            np.uint8
        )
        out.append(np.kron(blocks, np.ones((8, 8), dtype=np.uint8)))
    return out


class TestContainer:
    def test_riff_structure_goldens(self):
        blob = encode_avi_mjpeg(_exact_frames(2), fps=25,
                                luma_table=QT_FLAT16)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
        (riff_size,) = struct.unpack_from("<I", blob, 4)
        assert 8 + riff_size == len(blob)  # size covers the whole body
        assert b"LIST" in blob and b"hdrl" in blob and b"movi" in blob
        assert b"idx1" in blob and b"vidsMJPG" in blob
        assert blob.count(b"00dc") == 2 + 2  # movi chunks + idx entries

    def test_info_without_decoding(self):
        blob = encode_avi_mjpeg(_exact_frames(3), fps=30,
                                luma_table=QT_FLAT16)
        info = avi_info(blob)
        assert info["n_frames"] == 3 and info["fps"] == 30.0
        assert (info["width"], info["height"]) == (24, 16)
        assert info["handler"] == "MJPG" and info["has_index"]

    def test_word_alignment_odd_jpeg(self):
        # force an odd-length frame payload: every chunk must stay
        # word-aligned (pad byte outside the declared size)
        frames = _exact_frames(3, seed=5)
        blob = encode_avi_mjpeg(frames, fps=25, luma_table=QT_FLAT16)
        fps, out = decode_avi_mjpeg(blob)
        assert out.shape == (3, 16, 24)


class TestRoundTrip:
    def test_exact_regime_bit_for_bit(self):
        frames = _exact_frames(5)
        blob = encode_avi_mjpeg(frames, fps=24, luma_table=QT_FLAT16)
        fps, out = decode_avi_mjpeg(blob)
        assert fps == 24.0
        assert out.shape == (5, 16, 24)
        for i, f in enumerate(frames):
            assert (out[i] == f).all(), f"frame {i} differs"

    def test_rgb_lossy_close(self):
        rng = np.random.RandomState(3)
        frames = [
            rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
            for _ in range(2)
        ]
        blob = encode_avi_mjpeg(frames, fps=30, quality=95)
        fps, out = decode_avi_mjpeg(blob)
        assert out.shape == (2, 16, 16, 3)
        mae = np.mean(np.abs(out.astype(int) - np.stack(frames).astype(int)))
        assert mae < 16  # lossy but sane at q95 on noise

    def test_single_frame(self):
        (f,) = _exact_frames(1)
        fps, out = decode_avi_mjpeg(
            encode_avi_mjpeg([f], fps=1, luma_table=QT_FLAT16)
        )
        assert out.shape == (1, 16, 24) and (out[0] == f).all()


class TestValidation:
    def test_not_avi_rejected(self):
        with pytest.raises(ValueError, match="not an AVI"):
            avi_info(b"RIFX" + b"\x00" * 64)
        with pytest.raises(ValueError, match="not an AVI"):
            decode_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    def test_empty_and_mismatched_frames_rejected(self):
        with pytest.raises(ValueError, match="at least one"):
            encode_avi_mjpeg([], fps=25)
        with pytest.raises(ValueError, match="share one shape"):
            encode_avi_mjpeg(
                [np.zeros((16, 16), np.uint8), np.zeros((8, 8), np.uint8)],
                fps=25,
            )
        with pytest.raises(ValueError, match="fps"):
            encode_avi_mjpeg(_exact_frames(1), fps=0)

    def test_header_frame_count_checked(self):
        blob = bytearray(
            encode_avi_mjpeg(_exact_frames(2), fps=25, luma_table=QT_FLAT16)
        )
        i = blob.find(b"avih") + 8  # dwMicroSecPerFrame
        struct.pack_into("<I", blob, i + 16, 9)  # corrupt dwTotalFrames
        with pytest.raises(ValueError, match="frames"):
            decode_avi_mjpeg(bytes(blob))

    def test_idx1_size_mismatch_checked(self):
        blob = bytearray(
            encode_avi_mjpeg(_exact_frames(2), fps=25, luma_table=QT_FLAT16)
        )
        i = blob.rfind(b"00dc")  # last idx1 entry
        struct.pack_into("<I", blob, i + 12, 1)  # corrupt its size
        with pytest.raises(ValueError, match="idx1"):
            decode_avi_mjpeg(bytes(blob))
