"""Unicode canonicalization (UAX #15) for text pipelines — beyond
reference. Canonical-form normalization is step zero of corpus
deduplication: visually-identical strings with different codepoint
sequences ("e\\u0301" vs "\\u00e9") hash apart, splitting dup clusters
and double-counting tokens.

Spark has no built-in normalizer, so this is a sanctioned Arrow-batched
kernel over Python's stdlib ``unicodedata`` (the reference UAX #15
implementation): NFC/NFD/NFKC/NFKD per batch, no per-row Python. The
oracle replays NFC with DuckDB's ``nfc_normalize`` — two independent
UAX #15 implementations pinned equal (q361).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Column normalized to the given Unicode form (nulls pass through)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}")
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(c)
