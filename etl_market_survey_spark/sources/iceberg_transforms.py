"""Iceberg PARTITION TRANSFORMS (spec §Partition Transforms +
Appendix B "32-bit Hash Requirements") — the hidden-partitioning
functions real large Iceberg tables are laid out with:

    bucket[N]    (murmur3_x86_32(serialized value) & Int.MaxValue) % N
    truncate[W]  ints: v - (((v % W) + W) % W); strings: first W chars
    days         days from epoch (int) of a date/timestamp
    hours        hours from epoch (int) of a timestamp
    identity     the value itself

Hash serialization per Appendix B: int/long/date/timestamp all hash as
the 8-byte little-endian LONG value (dates as days from epoch,
timestamps as MICROSECONDS from epoch), strings as raw UTF-8 bytes.
Murmur3 x86 32-bit, seed 0 — implemented here from the public
algorithm (Austin Appleby, public domain) and pinned against the
spec's own golden values in tests (34 -> 2017239379,
"iceberg" -> 1210000089, 2017-11-16 -> -653330422, ...).

Two forms of each transform live here:

- a DRIVER-side Python evaluator (:func:`transform_value`) used for
  manifest partition tuples of collected staging dirs and for
  transform-aware pruning of ``partition_filter`` values (a handful of
  values, metadata-sized);
- a SPARK column expression (:func:`transform_expr`) used by the
  writer's one-job staged shuffle. truncate/days/identity are pure
  Catalyst expressions; bucket needs the spec's exact murmur3, so it is
  an Arrow-batched pandas_udf — int/long buckets vectorize in numpy
  (fixed 8-byte blocks -> two-word murmur3 in uint32 lanes), string
  buckets hash per UNIQUE value with a dict cache.
"""

from __future__ import annotations

import re

import pandas as pd  # annotations of the bucket pandas_udfs resolve here

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit (public domain reference algorithm), signed
    int32 result — the hash the Iceberg spec's bucket transform names."""
    h = seed & _MASK
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK
        h = (h * 5 + 0xE6546B64) & _MASK
    tail = data[n - n % 4:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def parse_transform(t: str) -> tuple[str, int | None]:
    """'bucket[8]' -> ('bucket', 8); 'truncate[4]' -> ('truncate', 4);
    'identity'/'days' -> (kind, None)."""
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", t)
    if m:
        n = int(m.group(2))
        if n < 1:
            raise ValueError(f"bad transform param in {t!r}")
        return m.group(1), n
    if t in ("identity", "days", "hours"):
        return t, None
    raise ValueError(f"unsupported partition transform {t!r}")


def partition_field_name(col: str, kind: str) -> str:
    """The spec's conventional field naming for transformed specs."""
    return {
        "identity": col,
        "bucket": f"{col}_bucket",
        "truncate": f"{col}_trunc",
        "days": f"{col}_day",
        "hours": f"{col}_hour",
    }[kind]


def result_ice_type(kind: str, src_ice_type: str) -> str:
    """Iceberg type of the partition tuple value."""
    if kind == "bucket":
        return "int"
    if kind in ("days", "hours"):
        return "int"  # spec: an int of days/hours from epoch
    return src_ice_type  # identity / truncate preserve the source type


_EPOCH_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _to_hash_long(v, src_ice_type: str) -> int:
    if src_ice_type in ("int", "long"):
        return int(v)
    if src_ice_type == "date":
        import datetime

        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days
        return int(v)
    if src_ice_type in ("timestamp", "timestamptz"):
        import datetime

        if isinstance(v, datetime.datetime):
            ts = v if v.tzinfo else v.replace(tzinfo=datetime.timezone.utc)
            return int(ts.timestamp() * 1_000_000)
        return int(v)
    raise ValueError(f"bucket: unsupported source type {src_ice_type}")


def hash_value(v, src_ice_type: str) -> int:
    """Appendix-B hash of one value."""
    if src_ice_type == "string":
        return murmur3_32(str(v).encode("utf-8"))
    lv = _to_hash_long(v, src_ice_type)
    return murmur3_32((lv & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))


def transform_value(kind: str, param: int | None, v, src_ice_type: str):
    """Driver-side transform of one value (manifest tuples, filter
    pruning). None maps to None (null partitions stay null)."""
    if v is None:
        return None
    if kind == "identity":
        return v
    if kind == "bucket":
        return (hash_value(v, src_ice_type) & 0x7FFFFFFF) % param
    if kind == "truncate":
        if src_ice_type == "string":
            return str(v)[:param]
        iv = int(v)
        return iv - (((iv % param) + param) % param)
    if kind in ("days", "hours"):
        import datetime

        unit = _EPOCH_US if kind == "days" else _HOUR_US
        if isinstance(v, datetime.datetime):
            ts = v if v.tzinfo else v.replace(tzinfo=datetime.timezone.utc)
            us = int(ts.timestamp() * 1_000_000)
            return us // unit
        if isinstance(v, datetime.date):
            d = (v - datetime.date(1970, 1, 1)).days
            return d if kind == "days" else d * 24
        return int(v) // unit
    raise ValueError(f"unsupported transform {kind}")


def _bucket_longs_np(vals, n: int):
    """Vectorized murmur3 of 8-byte little-endian longs (the int/long/
    date/timestamp hash shape) -> bucket ids; numpy uint32 lanes."""
    import numpy as np

    x = vals.astype(np.uint64)
    w0 = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    w1 = (x >> np.uint64(32)).astype(np.uint32)
    h = np.zeros(len(x), dtype=np.uint32)
    c1 = np.uint32(_C1)
    c2 = np.uint32(_C2)
    for w in (w0, w1):
        k = w * c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * c2
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h = h * np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h = h * np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return (h & np.uint32(0x7FFFFFFF)) % np.uint32(n)


def transform_expr(col: str, kind: str, param: int | None,
                   src_ice_type: str):
    """Spark Column computing the transform of ``col`` — the writer's
    staging key. Catalyst expressions wherever possible; bucket is an
    Arrow-batched pandas_udf carrying the spec's exact murmur3."""
    from pyspark.sql import functions as F

    if kind == "identity":
        return F.col(col)
    if kind == "truncate":
        if src_ice_type == "string":
            return F.substring(F.col(col), 1, param)
        w = F.lit(param).cast("long")
        c = F.col(col).cast("long")
        return (c - (((c % w) + w) % w)).cast(
            "long" if src_ice_type == "long" else "int"
        )
    if kind == "days":
        return F.datediff(
            F.col(col).cast("date"), F.lit("1970-01-01").cast("date")
        )
    if kind == "hours":
        # floor division toward -inf for pre-1970 timestamps
        us = F.unix_micros(F.col(col))
        h = F.lit(_HOUR_US).cast("long")
        return ((us - (((us % h) + h) % h)) / h).cast("int")
    if kind == "bucket":
        from pyspark.sql.functions import pandas_udf

        n = param
        if src_ice_type == "string":

            @pandas_udf("int")
            def _bucket_str(s: pd.Series) -> pd.Series:
                cache: dict[str, int] = {}

                def one(v):
                    if v is None:
                        return None
                    b = cache.get(v)
                    if b is None:
                        b = (murmur3_32(v.encode("utf-8"))
                             & 0x7FFFFFFF) % n
                        cache[v] = b
                    return b

                return s.map(one)

            return _bucket_str(F.col(col))

        # int/long/date/timestamp: normalize to the hash long first
        # (days for dates, microseconds for timestamps), JVM-side
        if src_ice_type == "date":
            lcol = F.datediff(
                F.col(col), F.lit("1970-01-01").cast("date")
            ).cast("long")
        elif src_ice_type in ("timestamp", "timestamptz"):
            lcol = F.unix_micros(F.col(col))  # spec: µs from epoch
        else:
            lcol = F.col(col).cast("long")

        @pandas_udf("int")
        def _bucket_long(s: pd.Series) -> pd.Series:
            import numpy as np

            mask = s.notna()
            out = pd.Series([None] * len(s), dtype="object")
            if mask.any():
                vals = s[mask].to_numpy(dtype=np.int64)
                out[mask] = _bucket_longs_np(vals, n).astype("int64")
            return out.astype("Int32")

        return _bucket_long(lcol)
    raise ValueError(f"unsupported transform {kind}")
