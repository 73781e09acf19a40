"""Multimodal column plumbing (beyond-reference, first-class).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time.

Codec policy: PIL is probed at import (``HAS_PIL``).
``decode_stub=True`` (the default) always uses the deterministic
byte-stub — output is a pure function of the bytes, never of the
runtime's installed libraries, which is this engine's reproducibility
contract. ``decode_stub=False`` requires the real PIL codec (raises
``NotImplementedError`` where it's absent — this runtime ships neither
PIL nor ffmpeg). ``decode_stub=None`` opts into auto (real codec when
the DRIVER sees PIL, stub otherwise) for exploratory use; don't put it
in a pipeline whose outputs feed hashes/dedup, and note a
driver-with-PIL / executors-without cluster will surface the gap as a
kernel-side NotImplementedError at task time. The Spark-side plumbing —
schema, batching, partition sizing — is identical in every mode;
swapping kernels changes no plan shape.

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

try:  # probe once; kernels re-import inside the worker process
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def _resolve_stub(decode_stub: bool | None) -> bool:
    """None = auto (real codec when available); True = force stub;
    False = require real codec."""
    if decode_stub is None:
        return not HAS_PIL
    if decode_stub is False and not HAS_PIL:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not in this runtime"
        )
    return bool(decode_stub)

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


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real decode: grayscale pixel values, chunk-meaned to FEATURE_DIM
    (same featurization contract as the stub, real pixels in)."""
    import io

    try:
        import PIL.Image
    except ImportError as e:  # driver had PIL, this executor doesn't
        raise NotImplementedError(
            "real media decode requires PIL on every executor"
        ) from e

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.float64).ravel()
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    decode_stub: bool | None = True,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (one Arrow batch at a time).

    Output schema = input columns minus the payload, plus
    ``features array<double>`` — payload is dropped post-decode so the
    shuffle that follows moves features, not bytes.
    """
    use_stub = _resolve_stub(decode_stub)
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if use_stub else _pil_decode
        for pdf in batches:
            feats = [
                decode(bytes(b) if b is not None else b"") for b in pdf[payload_col]
            ]
            out = pdf[keep].copy()
            out[out_col] = [f.tolist() for f in feats]
            yield out

    return df.mapInPandas(kernel, schema)


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
    decode_stub: bool | None = True,
    out_col: str = "resized",
) -> DataFrame:
    """Resize per-row payload -> resized payload + recorded target dims,
    Arrow-batched. Real mode decodes with PIL, resizes to ``target`` and
    re-encodes PNG; stub 'resize' is a deterministic byte-subsample to
    w*h bytes. Plan shape is identical either way."""
    use_stub = _resolve_stub(decode_stub)
    keep = [c for c in df.columns if c != payload_col]
    schema_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != payload_col)
    schema = f"{schema_fields}, {out_col} binary, out_width int, out_height int"
    w, h = target

    def _stub_resize(b: bytes) -> bytes:
        n = w * h
        if len(b) == 0:
            return b""
        if len(b) >= n:
            step = len(b) // n
            return b[::step][:n]
        return (b * (n // len(b) + 1))[:n]

    def _pil_resize(b: bytes) -> bytes:
        import io

        try:
            import PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                "real media resize requires PIL on every executor"
            ) from e

        if len(b) == 0:
            return b""
        img = PIL.Image.open(io.BytesIO(b)).resize((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize = _stub_resize if use_stub else _pil_resize
        for pdf in batches:
            outs = [resize(bytes(b) if b is not None else b"") for b in pdf[payload_col]]
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
