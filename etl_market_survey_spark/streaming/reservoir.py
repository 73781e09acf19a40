"""Streaming weighted reservoir sampling (A-ES over a stream).

The streaming counterpart of ``operators.sampling.weighted_sample_k``:
per group, keep the k rows with the largest Efraimidis-Spirakis keys
``ln(u)/w`` seen so far, where u is the deterministic portable hash rank
— NOT an RNG. Because the key is a pure function of (seed, ids, weight),
the drained stream's reservoir is bit-identical to the batch top-k over
the same rows, however the rows are split into micro-batches and however
tasks are scheduled; the parity test asserts exactly that.

State per group is the bounded reservoir itself (4 arrays of length
<= k), updated by merge-sort-trim each micro-batch — O(k) state,
O(batch + k log k) work, no growth with stream length. Each micro-batch
emits the group's current reservoir (update mode) tagged with ``n_seen``
so consumers can pick the latest emission per group.

Key/tie columns are computed JVM-side with the same expressions as the
batch operator (shared helper); Python only merges small sorted lists.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
STATE_SCHEMA = (
    "n_seen long, ids array<string>, ws array<double>, "
    "keys array<double>, ties array<string>"
)
OUTPUT_SCHEMA = (
    "grp string, id string, weight double, es_key double, "
    "es_rank int, n_seen long"
)


def weighted_reservoir_stream(
    stream: DataFrame,
    k: int,
    weight_col: str,
    id_cols: Sequence[str],
    seed: int = 42,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Per group (``by``, else global): streaming top-k by the A-ES key.
    Output one row per reservoir slot per micro-batch (update mode);
    ``id`` is the ``_SEP``-joined id columns."""
    from ..operators.sampling import _hash_rank

    h = _hash_rank(id_cols, seed)
    u = (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(float(16**13))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    grp = F.concat_ws(_SEP, *by) if by else F.lit("__all__")

    prepared = stream.select(
        grp.cast("string").alias("grp"),
        F.concat_ws(_SEP, *[F.col(c).cast("string") for c in id_cols]).alias("id"),
        F.col(weight_col).cast("double").alias("weight"),
        key.alias("es_key"),
        h.alias("tie"),
    )

    def update(group_key, pdfs: Iterable[pd.DataFrame], state):
        if state.exists:
            n_seen, ids, ws, keys, ties = state.get
            rows = list(zip(ids, ws, keys, ties))
        else:
            n_seen, rows = 0, []
        for pdf in pdfs:
            n_seen += len(pdf)
            rows.extend(
                zip(pdf["id"], pdf["weight"], pdf["es_key"], pdf["tie"])
            )
        rows.sort(key=lambda r: (-r[2], r[3]))
        del rows[k:]
        state.update(
            (
                n_seen,
                [r[0] for r in rows],
                [float(r[1]) for r in rows],
                [float(r[2]) for r in rows],
                [r[3] for r in rows],
            )
        )
        yield pd.DataFrame(
            {
                "grp": [group_key[0]] * len(rows),
                "id": [r[0] for r in rows],
                "weight": [float(r[1]) for r in rows],
                "es_key": [float(r[2]) for r in rows],
                "es_rank": list(range(1, len(rows) + 1)),
                "n_seen": [n_seen] * len(rows),
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return prepared.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
