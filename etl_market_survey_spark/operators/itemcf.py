"""Item-item collaborative filtering from implicit feedback (beyond
reference — the co-occurrence recommender next to the content-based
similarity operators).

Classic item-CF over a (user, item) interaction table: similarity of
two items = cooc(a, b) / sqrt(pop(a) * pop(b)) (cosine over binary
user vectors), computed from one self-join of the per-user item lists —
never a dense item matrix. Top-k neighbors per item via the
WindowGroupLimit-friendly row_number pattern.

Scale shape: the pair stage explodes per-user item PAIRS, so cost is
sum over users of |items|^2 — the standard CF bound, governed by
capping per-user history (``max_user_items``, heavy users truncated by
deterministic hash order; the lever every production CF applies).
Exactness: integer co-occurrence and popularity counts, one double
division + round-9 per pair — the DuckDB oracle replays bit-for-bit
(q241).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_cf_topk(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 10,
    min_cooc: int = 2,
    max_user_items: int | None = None,
) -> DataFrame:
    """(item_a, item_b, cooc, sim, rank): for every item, its top-``k``
    most similar items by cosine over binary user vectors (both
    directions emitted; ties broken by item id). Pairs below
    ``min_cooc`` users are dropped before scoring."""
    ui = interactions.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
    ).distinct()
    if max_user_items is not None:
        w = Window.partitionBy("_u").orderBy(F.xxhash64("_i"), F.col("_i"))
        ui = (
            ui.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_user_items)
            .drop("_rk")
        )
    pop = ui.groupBy(F.col("_i").alias("item")).agg(
        F.count("*").alias("pop")
    )
    a = ui.select(F.col("_u"), F.col("_i").alias("item_a"))
    b = ui.select(F.col("_u"), F.col("_i").alias("item_b"))
    cooc = (
        a.join(b, "_u")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    scored = (
        cooc.join(pop.select(F.col("item").alias("item_a"), F.col("pop").alias("_pa")), "item_a")
        .join(pop.select(F.col("item").alias("item_b"), F.col("pop").alias("_pb")), "item_b")
        .withColumn(
            "sim",
            F.round(
                F.col("cooc").cast("double")
                / F.sqrt(
                    F.col("_pa").cast("double") * F.col("_pb").cast("double")
                ),
                9,
            ),
        )
    )
    wr = Window.partitionBy("item_a").orderBy(
        F.col("sim").desc(), F.col("item_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "item_a",
            "item_b",
            F.col("cooc").cast("long").alias("cooc"),
            "sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sql_item_cf_topk(
    interactions_cte: str,
    k: int,
    min_cooc: int,
) -> str:
    """DuckDB mirror over a CTE exposing distinct ``(u, i)`` — keep in
    lockstep. Emits ``cf_out(item_a, item_b, cooc, sim, rank)``."""
    return f"""
cf_pop AS (SELECT i AS item, COUNT(*) AS pop FROM {interactions_cte} GROUP BY 1),
cf_cooc AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS cooc
  FROM {interactions_cte} a JOIN {interactions_cte} b
    ON a.u = b.u AND a.i <> b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_cooc}
),
cf_scored AS (
  SELECT c.item_a, c.item_b, c.cooc,
         ROUND(CAST(c.cooc AS DOUBLE)
               / SQRT(CAST(pa.pop AS DOUBLE) * CAST(pb.pop AS DOUBLE)), 9) AS sim
  FROM cf_cooc c
  JOIN cf_pop pa ON c.item_a = pa.item
  JOIN cf_pop pb ON c.item_b = pb.item
),
cf_out AS (
  SELECT item_a, item_b, CAST(cooc AS BIGINT) AS cooc, sim,
         CAST(row_number() OVER (
           PARTITION BY item_a ORDER BY sim DESC, item_b) AS INT) AS rank
  FROM cf_scored
  QUALIFY rank <= {k}
)"""
