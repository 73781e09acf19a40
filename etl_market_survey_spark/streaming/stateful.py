"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-key running aggregator (count / sum / max seen so far) that emits
an updated row per key per micro-batch — the canonical shape for
dedup-on-stream, running calibration, or drift counters.

Works on any keyed stream; state is a single small tuple per key, so
state-store size is O(distinct keys). With watermarked input, expired
keys can be dropped via timeout (GroupStateTimeout.ProcessingTimeTimeout
variant left to callers that need eviction).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

STATE_SCHEMA = "n long, total double, mx double"
OUTPUT_SCHEMA = "key string, n long, total double, mx double"


def _update(key, pdfs: Iterable[pd.DataFrame], state):
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].astype(float)
        n += len(vals)
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"key": [key[0]], "n": [n], "total": [total], "mx": [mx]}
    )


def running_stats(keyed_stream, key_col: str = "event_type", value_col: str = "value"):
    """Per-key running (count, sum, max) over a stream.

    ``keyed_stream``: streaming DataFrame with ``key_col`` and ``value_col``.
    Output mode must be 'update'.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = keyed_stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
