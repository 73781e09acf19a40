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


CUSUM_STATE_SCHEMA = "s double, n long, alarms long"
CUSUM_OUTPUT_SCHEMA = "key string, n_seen long, cusum double, n_alarms long"


def streaming_cusum(
    keyed_stream,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    k: float,
    h: float,
):
    """Per-key streaming CUSUM drift detector (Page 1954) —
    ``s = max(0, s + (x - k))``, alarm counted when ``s > h`` — carried
    across micro-batches in one (s, n, alarms) state tuple per key.
    Rows are folded in (ts, id) order within each batch; with the
    file-replay source's ordered delivery the fold equals the batch
    recurrence bit-for-bit (IEEE double + / max), which is what the
    q320 gate proves against the recursive-CTE oracle.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    kf, hf = float(k), float(h)

    def update(key, pdfs: Iterable[pd.DataFrame], state):
        s, n, alarms = state.get if state.exists else (0.0, 0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "rid"], kind="mergesort")
            for x in pdf["value"].astype(float).tolist():
                s = max(0.0, s + (x - kf))
                n += 1
                if s > hf:
                    alarms += 1
        state.update((s, n, alarms))
        yield pd.DataFrame(
            {"key": [key[0]], "n_seen": [n], "cusum": [s], "n_alarms": [alarms]}
        )

    prepared = keyed_stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(id_col).cast("long").alias("rid"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
