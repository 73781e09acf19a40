"""Audio constellation fingerprinting — Shazam-style clip matching as a
distributed operator (Wang 2003, "An Industrial-Strength Audio Search
Algorithm": landmark peaks -> combinatorial hashes -> offset voting).

Pipeline:

1. **Frames**: each signal is cut into fixed windows of ``frame_size``
   samples; per (signal, frame, DFT bin) a Goertzel power is computed
   by :func:`..operators.dsp.audio_filterbank_powers` — the same Arrow
   sequential-fold kernel the MFCC/periodogram operators use, so the
   whole chain stays SQL-replayable (recursive-CTE folds with identical
   ``2cos(w)`` literals).
2. **Peaks**: the strongest bin per frame (ties -> lowest bin) — the
   constellation landmark. Amplitude-invariant in effect: scaling the
   clip scales every power by the same factor, so the argmax survives.
3. **Hashes**: each landmark pairs with the landmarks ``delta`` frames
   ahead (the target zone): ``fkey = k1 * 10000 + k2 * 100 + delta``,
   one integer per pair — the combinatorial hash that makes lookups a
   hash JOIN, never a scan.
4. **Match**: clip hashes equi-join corpus hashes on ``fkey``; votes
   accumulate on (clip, track, frame offset); the top-voted offset per
   clip wins (ties -> lowest track, offset). A true match concentrates
   votes at ONE offset; noise spreads thin.

Scale shape (100 TB of audio): fingerprint extraction is per-signal
map-side work (one shuffle onto (signal, frame, bin) groups, two-float
state per group); the corpus fingerprint table is written once and
reused; matching shuffles only hash-key collisions (clip tables are
small by contract) and one tiny vote aggregation. Nothing all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dsp import audio_filterbank_powers


def frame_peaks(
    samples: DataFrame,
    signal_col: str,
    sample_col: str,
    pos_col: str,
    frame_size: int,
    bins: tuple[int, ...],
) -> DataFrame:
    """Strongest Goertzel bin per (signal, frame): the constellation
    landmarks. ``samples`` holds one row per (signal, position)."""
    framed = samples.select(
        F.col(signal_col).alias("_sig"),
        (F.col(pos_col) / frame_size).cast("long").alias("_frame"),
        (F.col(pos_col) % frame_size).alias("_n"),
        F.col(sample_col).alias("_x"),
    )
    # bin fan-out as a generator, not a join: explode of a literal
    # array keeps the stage a single codegen'd map (a broadcast
    # cross-join here plans as BroadcastNestedLoopJoin for no benefit)
    fanned = framed.withColumn(
        "bin", F.explode(F.array(*[F.lit(int(k)) for k in bins]))
    )
    powers = audio_filterbank_powers(
        fanned, ["_sig", "_frame"], "_x", "_n", "bin", frame_size
    )
    w = Window.partitionBy("_sig", "_frame").orderBy(
        F.col("power").desc(), F.col("bin")
    )
    return (
        powers.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_sig").alias(signal_col),
            F.col("_frame").alias("frame"),
            F.col("bin").alias("peak_bin"),
        )
    )


def constellation_hashes(
    peaks: DataFrame,
    signal_col: str,
    deltas: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Pair each landmark with its target zone: (signal, frame, fkey)."""
    out = None
    right = peaks.select(
        F.col(signal_col).alias("_sig2"),
        F.col("frame").alias("_frame2"),
        F.col("peak_bin").alias("_bin2"),
    )
    for d in deltas:
        pairs = peaks.join(
            right,
            (peaks[signal_col] == F.col("_sig2"))
            & (peaks["frame"] + int(d) == F.col("_frame2")),
        ).select(
            F.col(signal_col),
            F.col("frame"),
            (
                F.col("peak_bin") * 10000
                + F.col("_bin2") * 100
                + F.lit(int(d))
            ).alias("fkey"),
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out


def fingerprint_signals(
    samples: DataFrame,
    signal_col: str,
    sample_col: str,
    pos_col: str,
    frame_size: int = 32,
    bins: tuple[int, ...] = tuple(range(2, 10)),
    deltas: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Samples -> constellation hash table (signal, frame, fkey)."""
    peaks = frame_peaks(
        samples, signal_col, sample_col, pos_col, frame_size, bins
    )
    return constellation_hashes(peaks, signal_col, deltas)


def match_clips(
    corpus_fp: DataFrame,
    clip_fp: DataFrame,
    clip_col: str = "clip_id",
    track_col: str = "track_id",
) -> DataFrame:
    """Vote clips onto corpus tracks: equi-join on ``fkey``, count
    votes per (clip, track, frame offset), keep the top-voted
    hypothesis per clip. Output: (clip, track, frame_offset, votes)."""
    c = corpus_fp.select(
        F.col(track_col),
        F.col("frame").alias("_cf"),
        "fkey",
    )
    q = clip_fp.select(
        F.col(clip_col),
        F.col("frame").alias("_qf"),
        "fkey",
    )
    votes = (
        q.join(c, "fkey")
        .groupBy(
            clip_col, track_col, (F.col("_cf") - F.col("_qf")).alias("frame_offset")
        )
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy(clip_col).orderBy(
        F.col("votes").desc(), F.col(track_col), F.col("frame_offset")
    )
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(clip_col, track_col, "frame_offset", "votes")
    )
