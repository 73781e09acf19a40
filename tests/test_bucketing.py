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


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned layout: a date filter must become a
    PartitionFilter (directory pruning — zero I/O for excluded dates),
    not a post-scan row filter."""
    from etl_market_survey_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    # ts is epoch-nano; derive a coarse partition key
    day = (F.col("ts") / F.lit(3_600_000_000_000 * 24)).cast("long")
    out = str(tmp_path / "events_by_day")
    ev.withColumn("day", day).write.partitionBy("day").parquet(out)

    days = sorted(r["day"] for r in spark.read.parquet(out).select("day").distinct().collect())
    assert len(days) > 1
    pick = days[0]
    q = spark.read.parquet(out).filter(F.col("day") == pick)
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1)  # filter reached the directory level
    # and the scan enumerates only the matching partition's files
    m2 = re.search(r"InMemoryFileIndex[^,]*", plan)
    n = q.count()
    full = spark.read.parquet(out).filter(F.col("day") == pick).count()
    assert n == full > 0
    # partition column never read from data files
    m3 = re.search(r"ReadSchema: struct<([^>\n]*)", plan)
    assert m3 and "day" not in m3.group(1)


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """DPP: when the pruning key arrives at runtime from a FILTERED dim
    join (not a literal), the fact scan must still prune directories —
    the plan carries a dynamicpruning expression in PartitionFilters,
    populated from the broadcast side at execution. This is the 100 TB
    star-join shape: fact partitioned by day, dim filter selects a few
    days, I/O is proportional to the selected days only."""
    from etl_market_survey_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    day = (F.col("ts") / F.lit(3_600_000_000_000 * 24)).cast("long")
    out = str(tmp_path / "events_by_day_dpp")
    ev.withColumn("day", day).write.partitionBy("day").parquet(out)

    days = sorted(r["day"] for r in spark.read.parquet(out).select("day").distinct().collect())
    assert len(days) > 2
    dim = spark.createDataFrame(
        [(d, "keep" if d in days[:2] else "drop") for d in days], "day long, flag string"
    )
    fact = spark.read.parquet(out)
    joined = fact.join(F.broadcast(dim.filter(F.col("flag") == "keep")), "day")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dynamicpruning" in m.group(1)
    # correctness: identical to the statically-pruned result
    want = fact.filter(F.col("day").isin([int(d) for d in days[:2]])).count()
    assert joined.count() == want > 0
