"""URL structure functions — domain-level curation primitives.

Web-corpus curation reasons about URLs constantly: per-domain document
caps (a handful of boilerplate-heavy domains otherwise dominate the
corpus), domain blocklists, path-depth heuristics (deep paths are
often paginated listings), query-string stripping for canonical URLs.
These are pure string expressions (JVM-side, SQL-replayable — q275
hash-matches every field), plus a hash-ranked per-domain cap whose
xxhash64 order replays through the closed hashLong form.

The registrable-domain extraction is the standard last-two-labels
heuristic — a full public-suffix list is a broadcast lookup swap, same
plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"
_PORT_RE = r"^[a-z][a-z0-9+.-]*://[^/:?#]+:([0-9]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_host(c: str | Column) -> Column:
    s = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract(s, _HOST_RE, 1)


def url_port(c: str | Column) -> Column:
    s = F.col(c) if isinstance(c, str) else c
    p = F.regexp_extract(s, _PORT_RE, 1)
    return F.when(p != "", p.cast("int"))


def url_path(c: str | Column) -> Column:
    s = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract(s, _PATH_RE, 1)


def url_query(c: str | Column) -> Column:
    s = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract(s, _QUERY_RE, 1)


def url_domain(c: str | Column) -> Column:
    """Registrable domain: last two dot-labels of the host."""
    host = url_host(c)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, n - 1), F.element_at(parts, n)),
    ).otherwise(host)


def path_depth(c: str | Column) -> Column:
    """Number of non-empty path segments."""
    p = url_path(c)
    return F.size(F.filter(F.split(p, "/"), lambda x: x != ""))


def n_query_params(c: str | Column) -> Column:
    q = url_query(c)
    return F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    id_col: str,
    max_per_domain: int,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain,
    selected by xxhash64(id) order (ties by id) — deterministic,
    content-independent, and SQL-replayable (the q241 heavy-user-cap
    recipe applied to domains). Adds ``domain`` and ``kept``."""
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    out = df.withColumn("domain", url_domain(url_col))
    w = Window.partitionBy("domain").orderBy(
        F.xxhash64(F.col(id_col)), F.col(id_col)
    )
    return out.withColumn(
        "kept", F.row_number().over(w) <= max_per_domain
    )
