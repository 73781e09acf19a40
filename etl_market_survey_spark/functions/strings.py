"""Measurement-name grammar + string/date scalar functions (SURVEY §2.8
X1-X5 and §2.2 F5; reference measurements.py:11-53,117,260-267 and
utils.py:51-52).

Name grammar: ``YYYYmmddHHMMSS_<tokens>`` where device tokens start with
'MS' and sweep sub-measurements end in ``_<int>V``. All pure JVM
expressions (regexp/when-chains), usable at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VOLTAGE_RE = "_([0-9]+)V$"
DEVICE_TOKEN_RE = "(MS[0-9A-Za-z]+)"
TS_PREFIX_FMT = "yyyyMMddHHmmss"


def voltage_from_name(c: str | Column) -> Column:
    """X1 — trailing ``_<int>V`` token -> int (utils.py:51-52)."""
    col = F.col(c) if isinstance(c, str) else c
    v = F.regexp_extract(col, VOLTAGE_RE, 1)
    return F.when(v != "", v.cast("int"))


def device_tokens(c: str | Column) -> Column:
    """X2 — all 'MS*' tokens from a measurement name
    (measurements.py:260-267)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(
        F.split(col, "_"), lambda t: t.rlike("^MS[0-9A-Za-z]+$")
    )


def when_from_name(c: str | Column) -> Column:
    """X3 — timestamp from the 14-char name prefix (measurements.py:117).
    Malformed prefixes -> NULL (try_: ANSI mode would raise)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.try_to_timestamp(F.substring(col, 1, 14), F.lit(TS_PREFIX_FMT))


def classify_measurement(
    c: str | Column,
    has_beta_subdir: Column | None = None,
    has_iv_subdir: Column | None = None,
) -> Column:
    """F5 — ordered substring rules -> measurement type
    (measurements.py:37-53). Filesystem probes become catalog columns
    (``has_*_subdir``) supplied by the catalog builder."""
    col = F.lower(F.col(c) if isinstance(c, str) else c)
    beta = col.contains("betascan") | col.contains("beta scan")
    sweep = col.contains("sweeping") & col.contains("voltage")
    iv = col.contains("iv") & (col.contains("curve") | col.contains("iv_curve"))
    probe = col.contains("probe") & col.contains("station")
    scan1d = col.contains("1dscan") | col.contains("1d scan")
    result = (
        F.when(beta & sweep, "beta voltage scan")
        .when(beta, "beta fixed voltage")
        .when(probe & iv, "IV curve probe station")
        .when(iv, "IV curve")
        .when(scan1d & sweep, "TCT 1D scan sweeping bias voltage")
        .when(scan1d, "TCT 1D scan fixed voltage")
    )
    if has_beta_subdir is not None:
        result = result.when(has_beta_subdir, "beta voltage scan")
    if has_iv_subdir is not None:
        result = result.when(has_iv_subdir, "IV curve")
    return result.otherwise("unknown")


def flattened_stat_name(col_name: str, stat: str) -> str:
    """X5 — the reference's ``"{col} {stat}"`` naming (utils.py:145)."""
    return f"{col_name} {stat}"


def ts_plus_seconds(ts: str | Column, seconds: str | Column) -> Column:
    """X8 — timestamp + per-row seconds offset
    (convert_probe_station_measurement_to_our_format.py:60)."""
    t = F.col(ts) if isinstance(ts, str) else ts
    s = F.col(seconds) if isinstance(seconds, str) else seconds
    return F.timestamp_micros(
        F.unix_micros(t) + (s * F.lit(1_000_000.0)).cast("long")
    )
