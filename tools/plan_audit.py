"""Plan-quality audit: for every registered query, inspect the physical
plan for the properties that matter at 100 TB:

- parquet scans carry PushedFilters / pruned ReadSchema (no full-width scans)
- dimension joins are BroadcastHashJoin (no shuffle joins against dims)
- no CartesianProduct except deliberate broadcast cross joins
- WholeStageCodegen spans exist (expressions stay JVM-side)
- count of Exchanges (shuffles) per query

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from etl_market_survey_spark.plans import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # AQE wraps the plan in AdaptiveSparkPlan(isFinalPlan=false) before
        # execution, which hides codegen spans from toString — audit the
        # static plan instead (bench/tests keep AQE on; shape is identical
        # modulo runtime coalescing).
        .config("spark.sql.adaptive.enabled", "false")
        # default 100-char metadata truncation cuts ReadSchema mid-struct,
        # which would let the scan regex run across lines
        .config("spark.sql.maxMetadataStringLength", "4000")
        .appName("plan-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    problems_total = 0
    for name, fn in registry.QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            simple = df._jdf.queryExecution().simpleString()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            problems_total += 1
            continue
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        # codegen spans appear as "*(n)" operator prefixes; count distinct
        # span ids (a span covers many operators).
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        scans = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        notes = []
        if n_cart:
            notes.append(f"CARTESIAN x{n_cart}")
        wide = [s for s in scans if s.count(",") >= 9]
        if wide:
            notes.append(f"wide scan ({wide[0].count(',') + 1} cols)")
        flag = " <-- " + ", ".join(notes) if notes else ""
        print(
            f"{name}: exchanges={n_exchange} bhj={n_bhj} smj={n_smj} "
            f"codegen={n_wsc} scans={len(scans)}{flag}"
        )
        problems_total += 1 if n_cart else 0
    return 1 if problems_total else 0


if __name__ == "__main__":
    sys.exit(main())
