"""Benchmark decontamination: drop training documents that share word
n-grams with an evaluation/benchmark set.

The canonical training-data hygiene step (GPT-3 §C / PaLM / Llama data
cards all describe it): a training document is *contaminated* if any of
its word n-grams (n≈8..13 for real corpora; configurable) also occurs in
a benchmark document. Relational shape = an n-gram-level semi-join:

    train --explode shingles--> (id, shingle)
                                    semi-join  (broadcast: bench shingles)
    bench --explode+distinct--> (shingle)

Scale architecture (the part that matters at 100 TB): benchmark suites
are tiny relative to the corpus (MBs of eval sets vs TBs of training
text), so the distinct benchmark-shingle set broadcasts — the corpus
side streams through a map-side BroadcastHashJoin(LeftSemi) with NO
shuffle of corpus data. The only shuffled rows are the matched
(contaminated) doc ids, a vanishingly small set. With
``hash_mode='xxhash64'`` the broadcast carries 8-byte hashes instead of
shingle strings (~10x smaller, JVM-native hashing); 'text' mode keeps
raw shingles so a DuckDB oracle can replay values bit-for-bit.

Beyond-reference operator (training-data pipeline family, first-class
per BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table


def _shingle_keys(
    df: DataFrame, id_col: str, text_col: str, n: int, hash_mode: str
) -> DataFrame:
    sh = shingle_table(df, id_col, text_col, n)
    if hash_mode == "xxhash64":
        return sh.select(id_col, F.xxhash64("shingle").alias("shingle"))
    if hash_mode == "text":
        return sh
    raise ValueError(f"unknown hash_mode: {hash_mode!r}")


def contaminated_ids(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    hash_mode: str = "text",
) -> DataFrame:
    """Distinct ``id_col`` values of train docs sharing >= 1 word n-gram
    with any bench doc. One column, named ``id_col``."""
    bench_sh = (
        _shingle_keys(bench, id_col, text_col, n, hash_mode)
        .select("shingle")
        .distinct()
    )
    train_sh = _shingle_keys(train, id_col, text_col, n, hash_mode)
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    hash_mode: str = "text",
) -> DataFrame:
    """Training rows with contaminated documents removed (left_anti on the
    contaminated-id set, which is small enough to broadcast)."""
    bad = contaminated_ids(train, bench, id_col, text_col, n, hash_mode)
    return train.join(F.broadcast(bad), id_col, "left_anti")
