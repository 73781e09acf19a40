"""Funnel / event-sequence matching (MATCH_RECOGNIZE-lite).

Per key, match an ordered stage sequence (e.g. view -> click ->
purchase) greedily on event time: the funnel advances at the EARLIEST
event of the next stage strictly after the previous stage's match. This
is the standard product-analytics funnel, and the greedy-earliest match
is exactly the cascade ``t1 = min(ts | stage1)``, ``t2 = min(ts | stage2,
ts > t1)``, ... — which is what the DuckDB oracle replays.

Implementation is a single-pass automaton, not a join cascade: one
shuffle on the key, ``array_sort(collect_list(struct(ts, type)))`` per
key, then an ``F.aggregate`` fold whose state is (stage index, last
match ts, match times). A k-stage cascade of joins would be k shuffles
of the event table; this is one, and the fold is a JVM expression (no
Python). Per-key event counts bound the array — the same contract as
every per-key window here; skewed keys split by AQE on the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_match(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Per key: ``n_completed`` (stages matched, 0..len(stages)) and
    ``stage_ts`` (array of match timestamps, one per completed stage).
    ``ts_col`` must be integral (e.g. epoch-µs)."""
    key_cols, stages = list(key_cols), list(stages)
    n = len(stages)
    if n == 0:
        raise ValueError("stages must be non-empty")
    stage_arr = F.array(*[F.lit(s) for s in stages])

    ev = events.filter(F.col(type_col).isin(stages)).select(
        *key_cols,
        F.struct(
            F.col(ts_col).cast("long").alias("ts"), F.col(type_col).alias("t")
        ).alias("e"),
    )
    per_key = ev.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list("e")).alias("_evs")
    )

    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("long").alias("last"),
        F.array().cast("array<long>").alias("times"),
    )

    def step(acc, x):
        advance = (
            (acc["stage"] < F.lit(n))
            & (x["t"] == F.element_at(stage_arr, acc["stage"] + 1))
            & ((acc["stage"] == 0) | (x["ts"] > acc["last"]))
        )
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"),
                x["ts"].alias("last"),
                F.concat(acc["times"], F.array(x["ts"])).alias("times"),
            ),
        ).otherwise(acc)

    folded = per_key.select(
        *key_cols, F.aggregate("_evs", init, step).alias("_st")
    )
    return folded.select(
        *key_cols,
        F.col("_st.stage").alias("n_completed"),
        F.col("_st.times").alias("stage_ts"),
    )
