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
    has_iv_subdir: Column | None = None,
    has_scan_1d_subdir: Column | None = None,
    has_scan_1d_sweeping_subdir: Column | None = None,
) -> Column:
    """F5 — the reference's ordered classifier rules, faithfully
    (measurements.py:28-53; docstring golden at measurements.py:14-35):

    1. 'beta' in lower(name): 'beta fixed voltage' unless 'sweeping'
       ('beta voltage scan' when 'sweeping_bias_voltage', bare 'beta'
       otherwise).
    2. elif ('iv' AND 'curve' in lower) OR 'IV' in name (case-sensitive)
       OR an iv_curve subdir exists: 'IV curve'.
    3. then 'probe' AND 'station' OVERRIDE everything -> probe station;
    4. elif '1DScan' in name (case-sensitive) AND scan_1D subdir;
    5. elif 'sweeping_bias_voltage' AND scan_1D_sweeping... subdir.

    Filesystem probes arrive as catalog columns (``has_*_subdir``);
    pass ``F.lit(False)`` when the directory layout is unknown.
    """
    raw = F.col(c) if isinstance(c, str) else c
    low = F.lower(raw)
    f = F.lit(False)
    has_iv = has_iv_subdir if has_iv_subdir is not None else f
    has_1d = has_scan_1d_subdir if has_scan_1d_subdir is not None else f
    has_1d_sweep = (
        has_scan_1d_sweeping_subdir if has_scan_1d_sweeping_subdir is not None else f
    )

    beta = low.contains("beta")
    base = (
        F.when(beta & ~low.contains("sweeping"), "beta fixed voltage")
        .when(beta & low.contains("sweeping_bias_voltage"), "beta voltage scan")
        .when(beta, "beta")
        .when(
            (low.contains("iv") & low.contains("curve"))
            | raw.contains("IV")
            | has_iv,
            "IV curve",
        )
        .otherwise("unknown")
    )
    probe = low.contains("probe") & low.contains("station")
    return (
        F.when(probe, "IV curve probe station")
        .when(raw.contains("1DScan") & has_1d, "TCT 1D scan fixed voltage")
        .when(
            low.contains("sweeping_bias_voltage") & has_1d_sweep,
            "TCT 1D scan sweeping bias voltage",
        )
        .otherwise(base)
    )


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
