"""Exact longest common substring for candidate document pairs.

The precision stage after span dedup (ROADMAP item: the suffix-automaton
refinement of operators/spandedup's n-gram relaxation): given candidate
pairs from any blocking stage (LSH, Jaccard, span seeds), compute the
EXACT longest shared character run per pair — the quantity Lee et al.'s
dedup thresholds are really about. N-gram methods bound it from below;
this closes the gap.

Where it runs: candidate pairs are the OUTPUT of a pruning stage, so the
pair set is small relative to the corpus — per-pair work is the right
trade. The kernel is the classic O(|a|·|b|) run-length DP, vectorized
row-wise in numpy inside ``mapInPandas`` (Arrow batches; ~250k int ops
for two 500-char docs), the sanctioned Python path for semantics plain
SQL expressions cannot state. The q128 gate replays it anyway — as a
recursive CTE walking diagonal match-runs (rows = character matches,
each reached once) — proving the kernel exact without trusting it.

Scale shape: one equi-join attaches each pair's two texts, then the
kernel is map-only; no state, no shuffle beyond the join. Skew = the
longest single text pair, not any corpus property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lcs_len(a: str, b: str) -> int:
    """Exact longest-common-substring length (driver/test reference and
    the per-row kernel)."""
    import numpy as np

    if not a or not b:
        return 0
    xa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    xb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.zeros(len(xb) + 1, dtype=np.int64)
    best = 0
    for ca in xa:
        run = np.where(xb == ca, prev[:-1] + 1, 0)
        m = int(run.max())
        if m > best:
            best = m
        prev[1:] = run
        prev[0] = 0
    return best


def lcs_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """``(id_a, id_b, lcs_len)`` for every candidate pair. ``pairs`` has
    ``id_a``/``id_b``; texts join in from ``docs``."""
    a = docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")

    def _kernel(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "lcs_len": [
                        lcs_len(ta, tb) for ta, tb in zip(pdf["_ta"], pdf["_tb"])
                    ],
                }
            )

    return joined.mapInPandas(_kernel, schema="id_a long, id_b long, lcs_len long")
