"""Audio constellation fingerprinting (operators/audiofp): landmark
extraction, amplitude invariance, clip recovery, and layout
determinism."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.audiofp import (
    fingerprint_signals,
    frame_peaks,
    match_clips,
)

T, N, W = 4, 256, 32
BINS = tuple(range(2, 10))


@pytest.fixture(scope="module")
def tracks(spark):
    return spark.range(T * N).select(
        (F.col("id") / N).cast("long").alias("track_id"),
        (F.col("id") % N).alias("i"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(2001)) - 1000)
        .cast("double")
        .alias("x"),
    )


def test_peaks_amplitude_invariant(spark, tracks):
    base = frame_peaks(tracks, "track_id", "x", "i", W, BINS)
    scaled = frame_peaks(
        tracks.withColumn("x", F.col("x") * 7), "track_id", "x", "i", W, BINS
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, scaled.collect()))
    assert a == b
    assert len(a) == T * (N // W)  # one landmark per frame


def test_clip_recovery_exact(spark, tracks):
    corpus_fp = fingerprint_signals(tracks, "track_id", "x", "i", W, BINS)
    clips_spec = [(0, 1, 0), (1, 3, 2)]
    rows = spark.createDataFrame(clips_spec, "clip_id long, trk long, off long")
    clips = rows.join(tracks, rows["trk"] == tracks["track_id"]).filter(
        (F.col("i") >= F.col("off") * W) & (F.col("i") < (F.col("off") + 5) * W)
    ).select(
        "clip_id",
        (F.col("i") - F.col("off") * W).alias("j"),
        (F.col("x") * 3).alias("xq"),
    )
    clip_fp = fingerprint_signals(clips, "clip_id", "xq", "j", W, BINS)
    got = {
        r["clip_id"]: (r["track_id"], r["frame_offset"])
        for r in match_clips(corpus_fp, clip_fp).collect()
    }
    assert got == {0: (1, 0), 1: (3, 2)}


def test_fingerprints_partitioning_invariant(spark, tracks):
    a = sorted(
        map(
            tuple,
            fingerprint_signals(tracks, "track_id", "x", "i", W, BINS).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            fingerprint_signals(
                tracks.repartition(11), "track_id", "x", "i", W, BINS
            ).collect(),
        )
    )
    assert a == b
    # every hash pairs a landmark with one in its target zone
    assert all(100 <= k[2] for k in a)


def test_wrong_clip_gets_few_votes(spark, tracks):
    """A clip synthesized from an ALIEN signal (different hash stream)
    must not concentrate votes anywhere near a true match's count."""
    corpus_fp = fingerprint_signals(tracks, "track_id", "x", "i", W, BINS)
    alien = spark.range(5 * W).select(
        F.lit(9).alias("clip_id"),
        F.col("id").alias("j"),
        (F.pmod(F.xxhash64(F.col("id") + 777_000), F.lit(2001)) - 1000)
        .cast("double")
        .alias("xq"),
    )
    clip_fp = fingerprint_signals(alien, "clip_id", "xq", "j", W, BINS)
    true_clip = tracks.filter(
        (F.col("track_id") == 1) & (F.col("i") < 5 * W)
    ).select(
        F.lit(1).alias("clip_id"), F.col("i").alias("j"), F.col("x").alias("xq")
    )
    true_fp = fingerprint_signals(true_clip, "clip_id", "xq", "j", W, BINS)
    both = match_clips(corpus_fp, clip_fp.unionByName(true_fp)).collect()
    by_id = {r["clip_id"]: r for r in both}
    true_votes = by_id[1]["votes"]
    assert by_id[1]["track_id"] == 1 and by_id[1]["frame_offset"] == 0
    # 5 frames -> 4+3+2 = 9 target-zone pairs, all of which must vote
    assert true_votes == 9
    if 9 in by_id:  # alien clip may match nothing at all
        assert by_id[9]["votes"] < true_votes
