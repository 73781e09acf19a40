"""KLL quantile sketch — the one-pass MERGEABLE rung of the quantile
ladder (Karnin, Lang & Liberty 2016, "Optimal quantile approximation in
streams").

Where it sits. ``functions/histogram`` already has two exact paths:
the sorted-array quartiles (single reduce, fine below ~1e8 rows) and
``_stats_distributed`` (recursive counted-rank selection, no
single-reducer sort). Both need the full data per query. The KLL sketch
adds what those can't do: a bounded-size summary (O(k·log(n/k)) items)
built in ONE pass that is *mergeable* — per-partition partials combine
associatively, so it works as a grouped aggregate, over streams, and
across days of 100 TB data without re-scanning.

Execution shape (all Spark-side state is bounded):
- ``kll_build``: ``mapInPandas`` builds one partial sketch per task
  (state = the sketch, not the rows), emitting one serialized row each;
  the ~num_tasks tiny rows merge on the driver. No shuffle at all.
- ``kll_build_grouped``: same partial pass keyed by group (per-task
  state = one sketch per observed group), then a ``groupBy(keys)``
  ``applyInPandas`` merge — the only exchange carries sketches, not
  rows.
- ``kll_exact_quantiles``: the sketch-guided EXACT path, same contract
  as the CMS heavy-hitter flow ("the sketch only prunes, never
  decides"): the sketch brackets each target rank conservatively, one
  exact counting pass verifies the bracket (falling back to the full
  range if the sketch lied — correctness is unconditional), and the
  final value is selected by exact counted rank, via distinct-value
  counts inside the bracket or value-domain bisection when the bracket
  is still large. Result is bit-identical to a full sort, for ~3 scans
  whose exchanges never exceed the bucket-count rows.

Determinism: compaction offsets come from an LCG seeded by the number
of compactions — no RNG state outside the sketch, so the same input in
the same partition order gives the same sketch; the exact path's output
is partition-order invariant regardless.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_MIN_LEVEL_CAP = 8
_DECAY = 2.0 / 3.0


class KllSketch:
    """Weighted-item quantile sketch; level i items carry weight 2**i."""

    __slots__ = ("k", "levels", "n", "_compactions")

    def __init__(self, k: int = 512):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._compactions = 0

    # -- capacity / compaction ------------------------------------------------

    def _cap(self, level: int) -> int:
        top = len(self.levels) - 1
        return max(_MIN_LEVEL_CAP, int(self.k * _DECAY ** (top - level)))

    def _size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _total_cap(self) -> int:
        return sum(self._cap(i) for i in range(len(self.levels)))

    def _compact(self) -> None:
        while self._size() > self._total_cap():
            for i, lv in enumerate(self.levels):
                if len(lv) > self._cap(i):
                    lv.sort()
                    # deterministic LCG bit: which parity survives
                    self._compactions += 1
                    off = (self._compactions * 2862933555777941757 + 3037000493) >> 62 & 1
                    kept = lv[off::2]
                    if i + 1 == len(self.levels):
                        self.levels.append([])
                    self.levels[i + 1].extend(kept)
                    self.levels[i] = []
                    break
            else:
                break  # over total cap but no level over its own cap: legal

    # -- updates --------------------------------------------------------------

    def update_many(self, values: np.ndarray) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        step = max(self.k, 1024)
        for i in range(0, len(vals), step):
            self.levels[0].extend(vals[i : i + step].tolist())
            self.n += min(step, len(vals) - i)
            self._compact()

    def merge(self, other: "KllSketch") -> "KllSketch":
        out = KllSketch(min(self.k, other.k))
        out.n = self.n + other.n
        out._compactions = self._compactions + other._compactions
        depth = max(len(self.levels), len(other.levels))
        out.levels = [[] for _ in range(depth)]
        for src in (self, other):
            for i, lv in enumerate(src.levels):
                out.levels[i].extend(lv)
        out._compact()
        return out

    # -- queries --------------------------------------------------------------

    def _weighted_items(self) -> list[tuple[float, int]]:
        items = [
            (v, 1 << i) for i, lv in enumerate(self.levels) for v in lv
        ]
        items.sort(key=lambda t: t[0])
        return items

    def value_at_rank(self, r: int) -> float:
        """Sketch-estimated value whose rank is ~r (1-based, clipped)."""
        items = self._weighted_items()
        if not items:
            raise ValueError("empty sketch")
        r = max(1, min(r, self.n))
        cum = 0
        for v, w in items:
            cum += w
            if cum >= r:
                return v
        return items[-1][0]

    def quantile(self, q: float) -> float:
        """quantile_disc-style estimate: value at rank ceil(q*n)."""
        return self.value_at_rank(int(math.ceil(q * self.n)) or 1)

    def rank_slack(self) -> int:
        """Conservative rank-error bound used to bracket exact ranks.

        KLL's w.h.p. error is ~1.7·n/k; 6·n/k + top-level weight covers
        the constant and the unlucky tail at small n. The exact path
        verifies the bracket with true counts, so this only sizes the
        refinement work — correctness never depends on it.
        """
        return int(math.ceil(6.0 * self.n / self.k)) + (1 << (len(self.levels) - 1))

    # -- serialization --------------------------------------------------------

    def to_row(self) -> tuple[int, list[float], list[int]]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            items.extend(lv)
            weights.extend([1 << i] * len(lv))
        return self.n, items, weights

    @classmethod
    def from_row(cls, k: int, n: int, items: Sequence[float], weights: Sequence[int]):
        sk = cls(k)
        sk.n = int(n)
        for v, w in zip(items, weights):
            lvl = int(w).bit_length() - 1
            while len(sk.levels) <= lvl:
                sk.levels.append([])
            sk.levels[lvl].append(float(v))
        sk._compact()
        return sk


_SKETCH_FIELDS = [
    StructField("n", LongType()),
    StructField("items", ArrayType(DoubleType())),
    StructField("weights", ArrayType(LongType())),
]


def kll_build(df: DataFrame, col: str, k: int = 512) -> KllSketch:
    """One-pass global sketch: per-task partials via ``mapInPandas``
    (bounded state), merged on the driver (~num_tasks tiny rows)."""

    schema = StructType(_SKETCH_FIELDS)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = KllSketch(k)
        for pdf in batches:
            sk.update_many(pdf[col].to_numpy(dtype=np.float64, na_value=np.nan))
        if sk.n:
            n, items, weights = sk.to_row()
            yield pd.DataFrame({"n": [n], "items": [items], "weights": [weights]})

    rows = df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        partial, schema
    ).collect()
    out = KllSketch(k)
    for r in rows:
        out = out.merge(KllSketch.from_row(k, r["n"], r["items"], r["weights"]))
    return out


def kll_build_grouped(
    df: DataFrame, group_cols: Sequence[str], col: str, k: int = 256
) -> DataFrame:
    """Per-group sketches as a DataFrame: ``(group..., n, items,
    weights)``. Partial pass keeps one sketch per observed group per
    task; the merge shuffle carries sketches only."""
    group_cols = list(group_cols)
    gfields = [df.schema[c] for c in group_cols]
    schema = StructType(gfields + _SKETCH_FIELDS)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[tuple, KllSketch] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = KllSketch(k)
                sk.update_many(sub[col].to_numpy(dtype=np.float64, na_value=np.nan))
        recs = []
        for key, sk in sketches.items():
            if sk.n:
                n, items, weights = sk.to_row()
                recs.append((*key, n, items, weights))
        if recs:
            yield pd.DataFrame(recs, columns=group_cols + ["n", "items", "weights"])

    partials = df.select(
        *group_cols, F.col(col).cast("double").alias(col)
    ).mapInPandas(partial, schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KllSketch(k)
        for _, r in pdf.iterrows():
            sk = sk.merge(KllSketch.from_row(k, r["n"], r["items"], r["weights"]))
        n, items, weights = sk.to_row()
        return pd.DataFrame(
            [(*[pdf.iloc[0][c] for c in group_cols], n, items, weights)],
            columns=group_cols + ["n", "items", "weights"],
        )

    return partials.groupBy(*group_cols).applyInPandas(merge_group, schema)


def grouped_quantile_estimates(
    sketches: DataFrame, group_cols: Sequence[str], qs: Sequence[float]
) -> DataFrame:
    """Evaluate quantile estimates from a ``kll_build_grouped`` frame."""
    group_cols = list(group_cols)
    qs = list(qs)
    gfields = [sketches.schema[c] for c in group_cols]
    schema = StructType(
        gfields
        + [StructField("n", LongType())]
        + [StructField(f"q{int(q * 100):02d}", DoubleType()) for q in qs]
    )

    def evaluate(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf.iloc[0]
        sk = KllSketch.from_row(1 << 20, r["n"], r["items"], r["weights"])
        vals = [sk.quantile(q) for q in qs]
        return pd.DataFrame(
            [(*[r[c] for c in group_cols], sk.n, *vals)], columns=schema.names
        )

    return sketches.groupBy(*group_cols).applyInPandas(evaluate, schema)


# ---------------------------------------------------------------------------
# Sketch-guided EXACT quantiles ("the sketch only prunes").
# ---------------------------------------------------------------------------


def kll_exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    k: int = 512,
    max_distinct_collect: int = 100_000,
    n_buckets: int = 1024,
    sketch: KllSketch | None = None,
) -> dict[float, float]:
    """Exact quantile_disc values (value at rank ceil(q*n), 1-based)
    for every q in ``qs`` — bit-identical to a full sort, computed as:
    sketch pass -> bracket verify/count pass -> per-rank selection by
    distinct-count collect or value-domain bisection. ~3 scans; no
    exchange carries more than bucket/sketch rows.

    ``sketch``: pass a prebuilt sketch of the SAME data (e.g. the
    merged streaming partials from ``streaming/quantiles``) to skip the
    build pass; the bracket-verification still makes the result exact
    even if the sketch is stale or wrong — a bad sketch only costs a
    wider refinement."""
    vals = df.select(F.col(col).cast("double").alias("_x")).na.drop()
    sk = sketch if sketch is not None else kll_build(vals, "_x", k)
    if sketch is not None and sk.n != vals.count():
        # stale sketch: ranks must come from the actual data size
        sk = kll_build(vals, "_x", k)
    if sk.n == 0:
        raise ValueError("no rows")
    n = sk.n
    slack = sk.rank_slack()

    targets = {}
    for q in qs:
        r = max(1, min(int(math.ceil(q * n)), n))
        lo = sk.value_at_rank(r - slack) if r - slack >= 1 else -math.inf
        hi = sk.value_at_rank(r + slack) if r + slack <= n else math.inf
        targets[q] = (r, lo, hi)

    # one exact counting pass for all brackets
    aggs = []
    for i, (q, (r, lo, hi)) in enumerate(targets.items()):
        aggs.append(
            F.sum(F.when(F.col("_x") < F.lit(lo), 1).otherwise(0))
            .cast("long")
            .alias(f"lt{i}")
        )
        aggs.append(
            F.sum(
                F.when((F.col("_x") >= F.lit(lo)) & (F.col("_x") <= F.lit(hi)), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"in{i}")
        )
    counts = vals.agg(*aggs).collect()[0]

    out: dict[float, float] = {}
    for i, (q, (r, lo, hi)) in enumerate(targets.items()):
        c_lt, c_in = counts[f"lt{i}"], counts[f"in{i}"]
        if not (c_lt < r <= c_lt + c_in):  # sketch lied (should not happen)
            lo, hi = -math.inf, math.inf
            c_lt, c_in = 0, n
        out[q] = _select_rank(
            vals, r - c_lt, lo, hi, c_in, max_distinct_collect, n_buckets
        )
    return out


def _select_rank(
    vals: DataFrame,
    offset: int,
    lo: float,
    hi: float,
    c_in: int,
    max_distinct_collect: int,
    n_buckets: int,
) -> float:
    """Value at 1-based rank ``offset`` among rows in [lo, hi] — exact
    counted-rank selection; bisection passes scan only in-bracket rows."""
    def bracket_cond(lo_: float, hi_: float):
        conds = F.lit(True)
        if not math.isinf(lo_):
            conds = conds & (F.col("_x") >= F.lit(lo_))
        if not math.isinf(hi_):
            conds = conds & (F.col("_x") <= F.lit(hi_))
        return conds

    in_bracket = bracket_cond(lo, hi)
    while True:
        if c_in <= max_distinct_collect:
            rows = (
                vals.filter(in_bracket)
                .groupBy("_x")
                .agg(F.count("*").cast("long").alias("_c"))
                .orderBy("_x")
                .collect()
            )
            cum = 0
            for r in rows:
                cum += r["_c"]
                if cum >= offset:
                    return r["_x"]
            return rows[-1]["_x"]
        # distinct pileup guard: huge bracket but few distinct values
        nd = vals.filter(in_bracket).select("_x").distinct().count()
        if nd <= max_distinct_collect:
            c_in = 0  # force the collect branch (bounded by nd rows)
            max_distinct_collect = max(max_distinct_collect, 1)
            continue
        # bisect the value domain: one bucket-count pass over the bracket
        blo = lo if not math.isinf(lo) else vals.agg(F.min("_x")).collect()[0][0]
        bhi = hi if not math.isinf(hi) else vals.agg(F.max("_x")).collect()[0][0]
        if blo == bhi:
            return blo
        w = (bhi - blo) / n_buckets
        bucket = F.least(
            F.greatest(F.floor((F.col("_x") - F.lit(blo)) / F.lit(w)).cast("int"), F.lit(0)),
            F.lit(n_buckets - 1),
        )
        bcounts = (
            vals.filter(in_bracket)
            .groupBy(bucket.alias("_b"))
            .agg(F.count("*").cast("long").alias("_c"))
            .orderBy("_b")
            .collect()
        )
        cum = 0
        for r in bcounts:
            if cum + r["_c"] >= offset:
                b = r["_b"]
                offset -= cum
                new_lo, new_hi = blo + b * w, blo + (b + 1) * w
                # clip to closed interval; keep exactness via counted offset
                lo, hi, c_in = new_lo, min(new_hi, bhi), r["_c"]
                in_bracket = bracket_cond(lo, hi)
                break
            cum += r["_c"]
        else:  # numeric edge: fall back to whole bracket collect-by-distinct
            c_in = 0
            continue
