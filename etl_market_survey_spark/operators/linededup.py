"""Document-frequency segment pruning (beyond reference — corpus prep).

CCNet-style boilerplate removal generalized over the segment separator:
split every document into segments (lines for ``sep='\\n'`` — the CCNet
case; words for ``sep=' '`` — the classic TF-IDF document-frequency
cutoff), drop every segment that occurs in more than ``max_doc_freq``
distinct documents, and reassemble the surviving segments IN ORIGINAL
ORDER. Headers, navigation chrome, and license boilerplate repeat across
a crawl; content doesn't — a pure corpus-frequency test removes the
former without any model.

Shape: one ``posexplode`` (corpus-sized), one doc-frequency groupBy on
the segment (shuffle on segment — skew on hot boilerplate segments is
absorbed by the partial-aggregate map side since the combine is just a
count), one join back (frequency table is segment-distinct and usually
small → broadcast-eligible), one per-document reassembly groupBy. The
reassembly is ``sort_array(collect_list(struct(pos, seg)))`` — order is
part of the struct, so the result is deterministic under any partition
layout (the DuckDB mirror's ``string_agg(... ORDER BY pos)`` replays it
exactly; q143 gates the reassembled TEXT, not just counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def df_prune_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
    max_doc_freq: int,
) -> DataFrame:
    """``(id, pruned_text)`` — ``text_col`` split on the literal ``sep``,
    segments kept iff their distinct-document frequency is at most
    ``max_doc_freq``, rejoined with ``sep`` in original order. Documents
    whose every segment is pruned yield ``''``."""
    import re as _re

    segs = F.split(F.col(text_col), _re.escape(sep), -1)
    l = df.select(
        F.col(id_col).alias("_id"), F.posexplode(segs).alias("_pos", "_seg")
    )
    freq = l.groupBy("_seg").agg(F.count_distinct("_id").alias("_df"))
    kept = l.join(freq, "_seg").filter(F.col("_df") <= max_doc_freq)
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_seg"))),
                lambda s: s["_seg"],
            ),
            sep,
        ).alias("pruned_text")
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("pruned_text", F.lit("")).alias("pruned_text"),
        )
    )


def sql_df_prune_segments(
    table: str, id_expr: str, text_expr: str, sep: str, max_doc_freq: int
) -> str:
    """DuckDB mirror of :func:`df_prune_segments`."""
    s = sep.replace("'", "''")
    return f"""
WITH d AS (
  SELECT {id_expr} AS _id, string_split({text_expr}, '{s}') AS _segs
  FROM {table}
),
idx AS (
  SELECT _id, _segs, unnest(generate_series(1, len(_segs))) AS _pos FROM d
),
l AS (SELECT _id, _pos, _segs[_pos] AS _seg FROM idx),
freq AS (SELECT _seg, COUNT(DISTINCT _id) AS _df FROM l GROUP BY 1),
kept AS (SELECT l._id, l._pos, l._seg FROM l JOIN freq USING (_seg) WHERE _df <= {int(max_doc_freq)}),
r AS (
  SELECT _id, string_agg(_seg, '{s}' ORDER BY _pos) AS pruned_text
  FROM kept GROUP BY _id
)
SELECT d._id AS {id_expr}, COALESCE(r.pruned_text, '') AS pruned_text
FROM d LEFT JOIN r USING (_id)
"""
