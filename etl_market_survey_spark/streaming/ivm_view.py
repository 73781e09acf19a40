"""Streaming maintained aggregate view: CDC deltas -> bucketed IVM state.

The 100 TB close of the IVM story (operators/ivm.py): a rollup you never
recompute. Each micro-batch of change rows (inserts, plus retractions
carried as ``sign = -1``) is reduced to mergeable partial states — one
shuffle over the DELTA only — and merged into the materialized view with
the join-form combine against a table stored BUCKETED on the view key,
so the base side of every refresh is read in its on-disk hash layout
with ZERO exchange (``operators.ivm.bucketed_refresh`` pins the two
planner heuristics that could silently reintroduce one). Refresh cost is
therefore O(delta + touched view partitions), independent of base size.

Exactly-once via batch-id versioning (same discipline as streaming/cdc):
batch N merges the newest committed version < N into ``{table}_v{N}``
(a bucketed managed table; CREATE OR REPLACE semantics make replays
convergent — a crashed batch N re-reads the same base and rewrites the
same table). Readers take the highest version and ``finalize`` it into
the user-facing (n, sum, avg) frame. Partials are exact decimal sums, so
batch boundaries, merge order, and replays can never change a bit
(q115's gate property, now end-to-end under Structured Streaming).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ivm import (
    bucketed_refresh,
    finalize,
    merge_partials_join,
    sum_partials,
)
from ..sources.writers import write_bucketed


def view_versions(spark: SparkSession, table: str) -> list[int]:
    """Committed view versions (ascending) — catalog tables named
    ``{table}_v<N>``."""
    pat = re.compile(re.escape(table) + r"_v(\d+)$")
    out = []
    for row in spark.sql(f"SHOW TABLES LIKE '{table}_v*'").collect():
        m = pat.match(row.tableName)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_view(
    spark: SparkSession, table: str, cols: Sequence[str]
) -> DataFrame | None:
    """Latest committed view, finalized to ``(keys…, n, sum_*, avg_*)``."""
    versions = view_versions(spark, table)
    if not versions:
        return None
    return finalize(spark.table(f"{table}_v{versions[-1]}"), list(cols))


def ivm_refresh_writer(
    spark: SparkSession,
    table: str,
    keys: Sequence[str],
    cols: Sequence[str],
    n_buckets: int = 32,
    sign_col: str | None = None,
    plan_log: list[str] | None = None,
    retain: int = 2,
):
    """``foreachBatch`` function maintaining the bucketed partial-state
    view. ``sign_col`` (±1) marks retractions; ``plan_log`` (if given)
    collects the physical plan of every join-form refresh so callers can
    assert the zero-exchange property. After each committed refresh, all
    but the newest ``retain`` versions are dropped (>= 2 so a replaying
    batch always finds its base and an in-flight reader of the previous
    snapshot is never yanked) — without retention a long stream
    accumulates O(batches x view) dead storage."""
    keys, cols = list(keys), list(cols)
    retain = max(2, int(retain))

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_id = int(batch_id)
        sign = F.col(sign_col) if sign_col else None
        # NEVER drop _n == 0 groups from the DELTA: a same-batch update
        # (retract old value + insert new value for one key) nets a zero
        # signed row count with a NONZERO signed sum — filtering it here
        # would lose the update. Empty-group dropping belongs only on the
        # merged STATE, where (for a consistent feed) n == 0 implies the
        # sums are zero too; merge_partials_join already applies it.
        delta = sum_partials(batch_df, keys, cols, sign=sign)
        prior = [v for v in view_versions(spark, table) if v < batch_id]
        with bucketed_refresh(spark):
            if prior:
                base = spark.table(f"{table}_v{prior[-1]}")
                merged = merge_partials_join(base, delta, keys, cols)
                if plan_log is not None:
                    plan_log.append(
                        merged._jdf.queryExecution().executedPlan().toString()
                    )
            else:
                merged = delta
            write_bucketed(merged, f"{table}_v{batch_id}", keys, n_buckets=n_buckets)
        live = view_versions(spark, table)
        for v in live[:-retain]:
            spark.sql(f"DROP TABLE IF EXISTS {table}_v{v}")

    return apply


def write_stream_ivm_view(
    df: DataFrame,
    table: str,
    checkpoint: str,
    keys: Sequence[str],
    cols: Sequence[str],
    n_buckets: int = 32,
    sign_col: str | None = None,
    available_now: bool = True,
    plan_log: list[str] | None = None,
    retain: int = 2,
):
    """Start (and with ``available_now`` drain) a maintained-view stream.
    Returns the StreamingQuery."""
    writer = (
        df.writeStream.foreachBatch(
            ivm_refresh_writer(
                df.sparkSession,
                table,
                keys,
                cols,
                n_buckets=n_buckets,
                sign_col=sign_col,
                plan_log=plan_log,
                retain=retain,
            )
        )
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
