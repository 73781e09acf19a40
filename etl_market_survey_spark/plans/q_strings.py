"""Name-grammar + JSON queries (SURVEY §2.8 X1-X4, F5).

q31_name_grammar — synthesize measurement names from orders, then parse
    them back with the engine's grammar expressions (voltage token X1,
    device tokens X2, timestamp prefix X3, type classifier F5).
q32_json_props   — JSON side-channel extraction on events.props.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.strings import (
    classify_measurement,
    device_tokens,
    voltage_from_name,
    when_from_name,
)
from .registry import load, register

_NAME_SQL = (
    "strftime(o_orderdate, '%Y%m%d%H%M%S') || '_MS' || CAST(o_custkey AS VARCHAR)"
    " || (CASE WHEN o_orderstatus = 'F' THEN '_BetaScan' ELSE '_IV_Curve' END)"
    " || '_' || CAST(CAST(o_orderkey % 500 AS INT) AS VARCHAR) || 'V'"
)

_Q31_ORACLE = f"""
WITH named AS (SELECT {_NAME_SQL} AS name, o_orderkey FROM orders)
SELECT o_orderkey, name,
  CAST(strptime(substr(name, 1, 14), '%Y%m%d%H%M%S') AS TIMESTAMP) AS measured_when,
  CAST(regexp_extract(name, '_([0-9]+)V$', 1) AS INT) AS voltage,
  list_filter(string_split(name, '_'), t -> regexp_matches(t, '^MS[0-9A-Za-z]+$')) AS devices,
  CASE
    WHEN contains(lower(name), 'betascan') THEN 'beta fixed voltage'
    WHEN contains(lower(name), 'iv') AND contains(lower(name), 'curve') THEN 'IV curve'
    ELSE 'unknown'
  END AS mtype
FROM named ORDER BY o_orderkey
"""


@register("q31_name_grammar", _Q31_ORACLE)
def q31_name_grammar(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    name = F.concat(
        F.date_format("o_orderdate", "yyyyMMddHHmmss"),
        F.lit("_MS"),
        F.col("o_custkey").cast("string"),
        F.when(F.col("o_orderstatus") == "F", F.lit("_BetaScan")).otherwise(
            F.lit("_IV_Curve")
        ),
        F.lit("_"),
        (F.col("o_orderkey") % 500).cast("int").cast("string"),
        F.lit("V"),
    )
    named = orders.select("o_orderkey", name.alias("name"))
    return named.select(
        "o_orderkey",
        "name",
        when_from_name("name").alias("measured_when"),
        voltage_from_name("name").alias("voltage"),
        device_tokens("name").alias("devices"),
        classify_measurement("name").alias("mtype"),
    ).orderBy("o_orderkey")


_Q32_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("q32_json_props", _Q32_ORACLE)
def q32_json_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.max(k).cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q235 — soundex-blocked phonetic candidate pairs (operators/phonetic)
# over distinct part names: names sharing an American Soundex code are
# candidates, exact levenshtein decides. The oracle replays the soundex
# AUTOMATON itself in SQL (functions/soundexsql — recursive-CTE fold
# pinned bit-exact against F.soundex, incl. the H/W-skip-no-reset and
# non-letter-reset rules), so the phonetic blocking chain is gated end
# to end despite DuckDB shipping no soundex.
# ---------------------------------------------------------------------------


def _q235_oracle() -> str:
    from ..functions.soundexsql import sql_soundex_cte

    return f"""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL
),
{sql_soundex_cte('names')},
keyed AS (SELECT s AS name, sdx_code FROM sdx)
SELECT a.name AS name_a, b.name AS name_b, a.sdx_code,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM keyed a JOIN keyed b
  ON a.sdx_code = b.sdx_code AND a.name < b.name
ORDER BY name_a, name_b
"""


@register("q235_soundex_blocking", _q235_oracle())
def q235_soundex_blocking(spark, sf_dir):
    from ..operators.phonetic import soundex_blocked_pairs

    part = load(spark, sf_dir, "part")
    return soundex_blocked_pairs(part, "p_name").orderBy("name_a", "name_b")


# ---------------------------------------------------------------------------
# q236 — Jaro-Winkler name-similarity pairs (operators/phonetic) over
# distinct part names, all-pairs baseline mode on the bounded distinct-
# name set (the soundex-blocked mode is the scale path, recall-pinned in
# tests). The Arrow kernel is calibrated bit-compatible with DuckDB's
# jaro_winkler_similarity (empty-string zero, boost threshold 0.7,
# prefix cap 4), both sides rounded to 6 — so an approximate-looking
# fuzzy matcher is still an exactly-gated function.
# ---------------------------------------------------------------------------

_Q236_T = 0.6

_Q236_ORACLE = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
SELECT a.name AS name_a, b.name AS name_b,
       ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS jw
FROM names a JOIN names b ON a.name < b.name
WHERE ROUND(jaro_winkler_similarity(a.name, b.name), 6) >= {_Q236_T}
ORDER BY name_a, name_b
"""


@register("q236_jaro_winkler", _Q236_ORACLE)
def q236_jaro_winkler(spark, sf_dir):
    from ..operators.phonetic import jaro_winkler_pairs

    part = load(spark, sf_dir, "part")
    return jaro_winkler_pairs(part, "p_name", threshold=_Q236_T, block="all").orderBy(
        "name_a", "name_b"
    )


# ---------------------------------------------------------------------------
# q368 — higher-order array-function surface (SQL-surface completion):
# per order, the sorted quantity array flows through transform (x2),
# filter (> 40), aggregate (fold-sum), element_at head/tail — the
# lambda-expression algebra Catalyst evaluates WITHOUT leaving codegen
# (no UDFs anywhere). DuckDB replays with list_transform/list_filter/
# list_sum/list_sort and native subscripts. Thinned to orderkey % 501.
# ---------------------------------------------------------------------------

_Q368_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey AS k,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
  FROM lineitem GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(len(qs) AS INT) AS n_items,
       qs[1] AS q_min,
       qs[-1] AS q_max,
       CAST(COALESCE(list_sum(list_filter(list_transform(qs, x -> x * 2),
                                          y -> y > 40)), 0) AS BIGINT)
         AS big_doubled_sum
FROM per_order WHERE k % 501 = 0 ORDER BY k
"""


@register("q368_higher_order_arrays", _Q368_ORACLE)
def q368_higher_order_arrays(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    per = li.groupBy("k").agg(F.array_sort(F.collect_list("q")).alias("qs"))
    doubled = F.transform("qs", lambda x: x * 2)
    big = F.filter(doubled, lambda y: y > 40)
    return (
        per.filter(F.col("k") % 501 == 0)
        .select(
            F.col("k").cast("bigint").alias("k"),
            F.size("qs").cast("int").alias("n_items"),
            F.element_at("qs", 1).alias("q_min"),
            F.element_at("qs", -1).alias("q_max"),
            F.coalesce(
                F.aggregate(big, F.lit(0).cast("bigint"), lambda a, x: a + x),
                F.lit(0).cast("bigint"),
            ).alias("big_doubled_sum"),
        )
        .orderBy("k")
    )
