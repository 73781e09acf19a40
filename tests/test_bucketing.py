"""Bucketed tables remove the shuffle from co-located joins — the
fact⋈fact strategy at 100 TB. Asserts the physical plan has no Exchange
on the join path when both sides are bucketed on the key."""

import re

from pyspark.sql import functions as F

from etl_market_survey_spark.sources.writers import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is static (./spark-warehouse, gitignored); unique table
    # names + location cleanup keep reruns independent
    import shutil
    import uuid

    suffix = uuid.uuid4().hex[:8]
    t_li, t_o = f"b_lineitem_{suffix}", f"b_orders_{suffix}"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, t_li, ["l_orderkey"], n_buckets=8)
    write_bucketed(orders, t_o, ["o_orderkey"], n_buckets=8)

    # force a non-broadcast join: at test scale Catalyst would broadcast
    # (no shuffle either way); at 100 TB neither side broadcasts and
    # bucketing is what removes the exchange.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    joined = spark.table(t_li).join(
        spark.table(t_o),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # no shuffle before the join: bucketing provides the partitioning
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0

    # and the result is right
    n = joined.count()
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert n == plain

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in (t_li, t_o):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)
