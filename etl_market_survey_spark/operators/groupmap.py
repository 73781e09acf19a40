"""Partition-level replacement for many-small-groups
``groupBy(...).applyInPandas`` (guide §4: amortize per task, not per
group).

``applyInPandas`` builds one pandas frame per GROUP; when groups are
small and plentiful (per-user recurrences, per-doc kernels, per-pair
scorers) the per-group construction/conversion overhead dominates the
kernel itself — measured 2.3-2.6x on a 1500-key recurrence. The same
per-group function can run from a ``mapInPandas`` kernel over
key-contiguous partitions instead: one pandas pipeline per Arrow batch,
group splits done with a single vectorized ``groupby`` inside.

Rows reach the per-group function exactly as the grouped form delivered
them (same columns; kernels that need an order sort internally, which
every converted kernel already did), so results are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_group_map(
    d: DataFrame,
    key_cols,
    schema,
    per_group,
    order_cols=(),
) -> DataFrame:
    """Run ``per_group`` (a pandas fn over ONE key's rows — the exact
    function a ``groupBy(*key_cols).applyInPandas`` would apply) over
    every key, as a partition-level ``mapInPandas``.

    Keys are made partition-contiguous by ``repartition(*key_cols)`` +
    ``sortWithinPartitions(*key_cols, *order_cols)``; the kernel
    buffers the trailing key across Arrow batch boundaries so a key
    split over two batches is processed whole. ``order_cols`` only
    pre-orders rows within a key (kernels re-sort internally; passing
    the kernel's own sort keys makes that re-sort a cheap
    already-sorted pass)."""
    import pandas as pd

    keys = list(key_cols)

    def kernel(batches):
        # Trailing-key rows are buffered as a LIST of batch slices and
        # concatenated once at flush: a hot key spanning B batches moves
        # O(B) bytes, not the O(B^2) a per-batch concat would.
        pend = []

        def flush(pdf):
            outs = [
                per_group(g)
                for _, g in pdf.groupby(keys, sort=False, dropna=False)
            ]
            return pd.concat(outs) if len(outs) > 1 else outs[0]

        def same_key(row_a, row_b):
            for k in keys:
                va, vb = row_a[k], row_b[k]
                na_a, na_b = pd.isna(va), pd.isna(vb)
                if na_a or na_b:
                    if not (na_a and na_b):
                        return False
                elif va != vb:
                    return False
            return True

        for b in batches:
            if len(b) == 0:
                continue
            mask = None
            for k in keys:
                last = b[k].iloc[-1]
                m = b[k].isna() if pd.isna(last) else (b[k] == last)
                mask = m if mask is None else (mask & m)
            head = b[~mask]
            if len(head):
                # The batch's trailing key starts inside this batch, so
                # every buffered slice (plus head) holds only complete
                # keys — flush them; the groupby inside splits any key
                # boundary that fell exactly on a batch edge.
                if pend:
                    head = pd.concat(pend + [head])
                    pend = []
                yield flush(head)
                pend = [b[mask]]
            else:
                # Whole batch is one key; a key that ended exactly on
                # the previous batch boundary must flush before this
                # one starts accumulating.
                if pend and not same_key(pend[-1].iloc[-1], b.iloc[0]):
                    yield flush(pd.concat(pend) if len(pend) > 1 else pend[0])
                    pend = []
                pend.append(b)
        if pend:
            tail = pd.concat(pend) if len(pend) > 1 else pend[0]
            yield flush(tail)

    part = d.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *keys, *order_cols
    )
    return part.mapInPandas(kernel, schema)
