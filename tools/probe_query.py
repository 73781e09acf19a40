"""Split one registry query's wall time into build / plan / execute.

Usage: python tools/probe_query.py q97_pagerank [more...]

build   = calling the plan function (driver-side; includes any eager
          counts/persists the plan performs)
plan    = queryExecution().executedPlan() forcing analysis+optimization
exec    = the noop materialize that follows (runs the physical plan)

Measurement tool only (guide §1); prints per-query rows, changes
nothing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_market_survey_spark.plans import registry
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).limit(1).collect()

    sc = spark.sparkContext
    for name in sys.argv[1:]:
        spark.catalog.clearCache()
        sc.setJobDescription(f"probe:{name}")
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        print(
            f"{name}: total {t3 - t0:6.2f}s = build {t1 - t0:6.2f}s "
            f"+ plan {t2 - t1:5.2f}s + exec {t3 - t2:5.2f}s"
        )
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
