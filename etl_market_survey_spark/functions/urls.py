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


def canonical_url(c: str | Column) -> Column:
    """Canonical form for dedup keys: lowercase scheme/host, default
    ports dropped, fragment dropped, tracking params (utm_*, gclid,
    fbclid, ref) dropped, remaining query params sorted, trailing
    path slashes stripped (root stays '/'). Keep in lockstep with
    :func:`sql_canonical_url`."""
    s = F.col(c) if isinstance(c, str) else c
    scheme = F.lower(F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    port = F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    raw_path = F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    path = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(s, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("gclid=")
            & ~p.startswith("fbclid=")
            & ~p.startswith("ref="),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB mirror of :func:`canonical_url` — keep in lockstep."""
    scheme = f"lower(regexp_extract({expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = (
        f"lower(regexp_extract({expr},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))"
    )
    port = (
        f"regexp_extract({expr},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1)"
    )
    raw_path = (
        f"regexp_extract({expr},"
        f" '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)"
    )
    path = (
        f"(CASE WHEN regexp_replace({raw_path}, '/+$', '') = '' THEN '/'"
        f" ELSE regexp_replace({raw_path}, '/+$', '') END)"
    )
    q = f"regexp_extract({expr}, '\\?([^#]*)', 1)"
    params = (
        f"array_to_string(list_sort(list_filter(string_split({q}, '&'),"
        f" p -> p <> '' AND NOT starts_with(p, 'utm_')"
        f" AND NOT starts_with(p, 'gclid=')"
        f" AND NOT starts_with(p, 'fbclid=')"
        f" AND NOT starts_with(p, 'ref='))), '&')"
    )
    keep_port = (
        f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80')"
        f" AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    return (
        f"({scheme} || '://' || {host}"
        f" || (CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END)"
        f" || {path}"
        f" || (CASE WHEN {params} <> '' THEN '?' || {params} ELSE '' END))"
    )
