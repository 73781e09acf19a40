"""Multimodal column plumbing (beyond-reference, first-class).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this runtime, so the
decode kernels are STUBBED — ``decode_stub=True`` (default) derives a
deterministic fake feature vector from the bytes, ``decode_stub=False``
raises ``NotImplementedError`` where the real library call belongs. The
Spark-side plumbing — schema, batching, partition sizing — is real and
tested; swapping the stub for a codec changes no plan shape.

Scale notes: binary payloads dominate partition size; ``repartition`` by
size-bucket before decode keeps Arrow batches bounded (a 100 MB video and
a 10 kB thumbnail should not share a batch budget). Feature outputs are
small and columnar — the natural handoff to the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_s double"
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest. Always the
    first stage — lets dedup/filtering prune before any decode."""
    p = F.col(payload_col)
    return df.withColumn("n_bytes", F.length(p)).withColumn("digest", F.md5(p))


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: FEATURE_DIM floats derived from
    byte statistics. Replace with a real decode when codecs exist."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    decode_stub: bool = True,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (one Arrow batch at a time).

    Output schema = input columns minus the payload, plus
    ``features array<double>`` — payload is dropped post-decode so the
    shuffle that follows moves features, not bytes.
    """
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this runtime"
                )
            feats = [
                _fake_decode(b if b is not None else b"") for b in pdf[payload_col]
            ]
            out = pdf[keep].copy()
            out[out_col] = [f.tolist() for f in feats]
            yield out

    return df.mapInPandas(kernel, schema)


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
    decode_stub: bool = True,
    out_col: str = "resized",
) -> DataFrame:
    """Resize plumbing: per-row payload -> resized payload + recorded
    target dims, Arrow-batched. Stub 'resize' is a deterministic
    byte-subsample to target w*h bytes (a real implementation replaces the
    kernel body with PIL/ffmpeg; plan shape is identical)."""
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} binary, out_width int, out_height int"
    w, h = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg — not in this runtime"
                )
            outs = []
            for b in pdf[payload_col]:
                b = bytes(b) if b is not None else b""
                n = w * h
                if len(b) == 0:
                    outs.append(b"")
                elif len(b) >= n:
                    step = len(b) // n
                    outs.append(b[:: step][:n])
                else:
                    outs.append((b * (n // len(b) + 1))[:n])
            out = pdf[keep].copy()
            out[out_col] = outs
            out["out_width"] = w
            out["out_height"] = h
            yield out

    return df.mapInPandas(kernel, schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    frame index — the explode pattern a video pipeline needs. Stubbed
    frame extraction (byte-slice stand-in)."""
    n = F.least(
        F.greatest(F.floor(F.length(payload_col) / every_n_bytes), F.lit(1)),
        F.lit(max_frames),
    ).cast("int")
    return (
        df.withColumn("_n_frames", n)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("_n_frames") - 1)))
        .withColumn(
            "frame_bytes",
            F.substring(
                F.col(payload_col), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ),
        )
        .drop("_n_frames")
    )
