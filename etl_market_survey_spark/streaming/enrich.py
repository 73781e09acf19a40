"""Stream-static enrichment (the most common streaming join).

A live stream joined against a slowly-changing dimension snapshot:
Spark broadcasts the static side into every micro-batch — no state
store, no watermark, exactly the per-batch plan the same join would
have in batch mode (batch/stream parity asserted in tests). For dims
too big to broadcast, Spark falls back to a per-batch shuffle join —
the dim should then be bucketed (sources/writers.write_bucketed) so the
repeated join is exchange-free on the dim side.

The stream side may be arbitrarily late/out-of-order: enrichment is
stateless per row, so correctness doesn't depend on event time at all —
which is exactly why this shape needs no watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Join each micro-batch against the broadcast dimension snapshot.
    ``how='left'`` keeps unmatched stream rows (dim gaps surface as
    NULLs for monitoring rather than dropping events); ``'inner'``
    filters to known keys."""
    return stream_df.join(F.broadcast(dim), on, how)
