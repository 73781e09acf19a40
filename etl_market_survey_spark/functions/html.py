"""HTML text extraction — the WARC-payload -> training-text step.

Library-free tag stripping as pure column expressions (JVM regex,
SQL-replayable): drop script/style/comment blocks, replace remaining
tags with spaces, decode the common entities, collapse runs of spaces.
Title and href extraction ride the same regex layer.

Pattern discipline: every regex used here behaves identically under
Java regex (Spark) and RE2 (DuckDB) — lazy quantifiers, (?s), and
negated classes only; notably NO ``\\s`` (Java includes \\x0B, RE2
does not), whitespace is normalized explicitly. q276 hash-matches the
whole extraction on both engines.

A real boilerplate-removal model (trafilatura-class) is a Pandas-UDF
swap on the same plumbing; this is the deterministic first-pass strip
every pipeline runs before or instead of it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCKS = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_COMMENTS = r"(?s)<!--.*?-->"
_TAGS = r"<[^>]+>"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last: avoid double-decoding &amp;lt;
]


def strip_html(c: str | Column) -> Column:
    s = F.col(c) if isinstance(c, str) else c
    s = F.regexp_replace(s, _BLOCKS, " ")
    s = F.regexp_replace(s, _COMMENTS, " ")
    s = F.regexp_replace(s, _TAGS, " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, "[ \t\r\n]+", " ")
    return F.trim(s)


def sql_strip_html(expr: str) -> str:
    s = f"regexp_replace({expr}, '{_BLOCKS}', ' ', 'g')"
    s = f"regexp_replace({s}, '{_COMMENTS}', ' ', 'g')"
    s = f"regexp_replace({s}, '{_TAGS}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    s = f"regexp_replace({s}, '[ \t\r\n]+', ' ', 'g')"
    return f"trim({s})"


def html_title(c: str | Column) -> Column:
    s = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract(s, r"(?s)<title[^>]*>(.*?)</title>", 1)


def sql_html_title(expr: str) -> str:
    return f"regexp_extract({expr}, '(?s)<title[^>]*>(.*?)</title>', 1)"


def html_links(c: str | Column) -> Column:
    """All href targets, in document order."""
    s = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(s, F.lit(r'href="([^"]*)"'), F.lit(1))


def sql_html_links(expr: str) -> str:
    return f"regexp_extract_all({expr}, 'href=\"([^\"]*)\"', 1)"
