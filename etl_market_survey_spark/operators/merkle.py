"""Merkle-tree dataset fingerprinting (beyond reference — dataset
versioning and integrity).

Content-addresses a table bottom-up: leaf = md5(id | payload digest),
each level hashes ``fanout`` ordered children into one node, up to a
single root. Two snapshots with equal roots are byte-identical; a
changed row flips exactly one path of log_fanout(n) hashes, so a
top-down diff of two trees localizes changed buckets without comparing
rows — the content-addressing scheme behind dataset registries and
lakehouse manifest verification.

Scale shape: level L has n / fanout^L nodes — one map-side-combined
aggregation per level on integer bucket keys, no shuffle wider than the
level itself; the driver loop runs log_fanout(n) rounds on
geometrically shrinking frames. Order inside a node comes from
``array_sort(collect_list(struct(idx, hash)))`` — partition-layout
independent — and ids map to dense leaf indices via the two-phase
``prefix.distributed_rank`` (no single-reducer window). Everything is
md5 over strings: engine-portable, q219 hash-gates the full tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merkle_tree(
    df: DataFrame,
    id_col: str,
    payload: Column,
    fanout: int = 16,
) -> DataFrame:
    """Full tree: (level, idx, hash) rows — level 0 = leaves in
    ``id_col`` order (dense indices), the top level a single root."""
    from .prefix import distributed_rank

    leaf_hash = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.md5(payload))
    )
    base = df.select(F.col(id_col).alias("_id"), leaf_hash.alias("hash"))
    ranked = distributed_rank(base, "_id", [], out="_rk")
    cur = ranked.select(
        (F.col("_rk") - 1).cast("long").alias("idx"), "hash"
    ).localCheckpoint(eager=True)
    levels = [cur.withColumn("level", F.lit(0))]
    n = cur.count()
    lvl = 0
    while n > 1:
        lvl += 1
        parent = (
            cur.groupBy(F.expr(f"idx div {fanout}").alias("idx"))
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("idx", "hash"))
                            ),
                            lambda x: x["hash"],
                        ),
                        "",
                    )
                ).alias("hash")
            )
        ).localCheckpoint(eager=True)
        levels.append(parent.withColumn("level", F.lit(lvl)))
        cur = parent
        n = cur.count()
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        F.col("level").cast("int").alias("level"),
        F.col("idx").cast("long").alias("idx"),
        "hash",
    )


def sql_merkle_tree(
    table: str,
    id_expr: str,
    payload_expr: str,
    n_leaves: int,
    fanout: int = 16,
) -> str:
    """DuckDB mirror — levels unrolled for ``n_leaves`` (the oracle
    knows its scale; the engine loop does not need to)."""
    sql = f"""
WITH lvl0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_expr}) - 1 AS idx,
         md5(CAST({id_expr} AS VARCHAR) || '|' || md5({payload_expr})) AS hash
  FROM {table}
)"""
    n, lvl = n_leaves, 0
    while n > 1:
        lvl += 1
        sql += f""",
lvl{lvl} AS (
  SELECT idx // {fanout} AS idx,
         md5(string_agg(hash, '' ORDER BY idx)) AS hash
  FROM lvl{lvl - 1} GROUP BY 1
)"""
        n = -(-n // fanout)
    selects = [
        f"SELECT CAST({i} AS INT) AS level, CAST(idx AS BIGINT) AS idx, hash FROM lvl{i}"
        for i in range(lvl + 1)
    ]
    return sql + "\n" + "\nUNION ALL ".join(selects)
