"""Streaming deduplication with watermark-bounded state (beyond
reference — the streaming face of the dedup family in operators/dedup).

``dropDuplicatesWithinWatermark`` keeps the first arrival per key and
holds each key in state only until the event-time watermark passes
key_time + delay — so state is O(keys per watermark window), not O(all
keys ever), which is what makes streaming dedup viable on an unbounded
100 TB/day feed. The tradeoff is semantic: a duplicate arriving later
than ``delay`` after its first occurrence is re-emitted. Pick ``delay``
= the max plausible duplicate lag (for exactly-once upstream retries,
minutes; for cross-datacenter replays, hours).

Batch frames take the same call and degrade to plain ``dropDuplicates``
(global exact dedup — no state bound needed when the input is finite),
so one pipeline definition serves both execution modes, mirroring
``streaming/events.windowed_counts``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "event_time",
    delay: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins dedup on ``keys``; streaming state evicted once
    the watermark passes ``delay`` behind a key's event time."""
    keys = list(keys)
    if df.isStreaming:
        return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
