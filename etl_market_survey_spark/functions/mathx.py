"""Scalar special functions shared bit-for-bit between Spark and DuckDB.

X7 (SURVEY §2.8): the reference applies ``scipy.special.erf`` as a plain
column transform (fit_erf_and_calculate_calibration_factor.py:19-23).
Neither engine in this runtime ships SQL ``erf``, so the first-class
scalar here is the Abramowitz & Stegun 7.1.26 rational approximation
(|error| <= 1.5e-7) spelled out as ONE shared SQL expression template —
both engines execute the identical IEEE-double arithmetic, and a final
``ROUND(.., 9)`` absorbs any libm last-ulp drift in ``exp`` (the
tfidf/relevance discipline), making the result hash-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A&S 7.1.26 coefficients (public handbook values)
_T = "(1.0 / (1.0 + 0.3275911 * ABS({x})))"
_POLY = (
    "((((1.061405429 * {t} - 1.453152027) * {t} + 1.421413741) * {t}"
    " - 0.284496736) * {t} + 0.254829592) * {t}"
)
_ERF_TEMPLATE = (
    "ROUND((CASE WHEN ({x}) < 0.0 THEN -1.0 ELSE 1.0 END) * "
    "(1.0 - (" + _POLY + ") * EXP(-(ABS({x}) * ABS({x})))), 9)"
)


def sql_erf(expr: str) -> str:
    """The erf expression over any SQL sub-expression — valid in both
    Spark SQL and DuckDB (only CASE/ABS/EXP/ROUND and arithmetic)."""
    t = _T.format(x=expr)
    return _ERF_TEMPLATE.format(x=expr, t=t)


def erf_expr(col_name: str) -> Column:
    """Spark Column form of :func:`sql_erf` — same expression text, so
    the engines cannot diverge structurally."""
    return F.expr(sql_erf(col_name))
