"""Deployment-catalog materialization (ROADMAP item 8).

The oracle gate reads raw parquet — correct, but every fact⋈fact join
pays its shuffle each run. A deployment registers the facts ONCE as
bucketed managed tables so joins and aggregations on the bucket key are
co-located on disk and plan with zero Exchange forever after. This tool
materializes the driver testdata that way and then PROVES the payoff by
comparing physical plans and wall time of a lineitem⋈orders join on raw
parquet vs the bucketed tables.

At 100 TB the same layout decision is the difference between re-shuffling
the fact table on every query and never shuffling it at all; bucket count
scales with data (rule of thumb: target 128–512 MB per bucket file per
partition column value).

Usage: python tools/materialize_catalog.py [warehouse_dir] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="whs_")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("materialize-catalog")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.ui.enabled", "false")
        # disable broadcast so the demo join exercises the bucketed path
        # the way a fact-fact join would (orders at sf0.1 would broadcast)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_market_survey_spark.sources.readers import read_parquet
    from etl_market_survey_spark.sources.writers import write_bucketed

    n_buckets = int(cpus)
    li_raw = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    od_raw = read_parquet(spark, f"{sf_dir}/orders.parquet")

    t0 = time.perf_counter()
    write_bucketed(li_raw, "lineitem_b", ["l_orderkey"], n_buckets, ["l_orderkey"])
    write_bucketed(
        od_raw.withColumnRenamed("o_orderkey", "l_orderkey"),
        "orders_b",
        ["l_orderkey"],
        n_buckets,
        ["l_orderkey"],
    )
    # CBO statistics: with row counts + column NDV/min/max in the
    # catalog, Catalyst sizes joins from stats instead of file sizes
    # (broadcast decisions, join reordering) — part of the same
    # register-once deployment step.
    for t in ("lineitem_b", "orders_b"):
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
    t_mat = time.perf_counter() - t0

    def demo_join(li, od):
        return (
            li.join(od, on="l_orderkey")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    raw = demo_join(li_raw, od_raw.withColumnRenamed("o_orderkey", "l_orderkey"))
    bucketed = demo_join(spark.table("lineitem_b"), spark.table("orders_b"))

    def exchanges(df) -> int:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum("Exchange" in line and "reused" not in line for line in plan.splitlines())

    def timed(df) -> float:
        t = time.perf_counter()
        df.collect()
        return time.perf_counter() - t

    ex_raw, ex_b = exchanges(raw), exchanges(bucketed)
    t_raw, t_b = timed(raw), timed(bucketed)
    # The join itself must be exchange-free on the bucketed path: the only
    # remaining exchange is the final tiny groupBy(o_orderpriority).
    assert ex_b < ex_raw, (ex_b, ex_raw)
    rows_match = sorted(map(tuple, raw.collect())) == sorted(map(tuple, bucketed.collect()))
    assert rows_match

    print(
        {
            "warehouse": warehouse,
            "materialize_s": round(t_mat, 3),
            "exchanges_raw": ex_raw,
            "exchanges_bucketed": ex_b,
            "join_raw_s": round(t_raw, 3),
            "join_bucketed_s": round(t_b, 3),
            "results_match": rows_match,
        }
    )


if __name__ == "__main__":
    main()
