"""Run any registered query from the command line.

    python tools/run_query.py q01_pricing_summary
    python tools/run_query.py q19_minhash_lsh --sf-dir /root/testdata/sf0.1 \
        --limit 50 --explain
    python tools/run_query.py q48_corpus_curation --out /tmp/out --format jsonl

``--list`` prints every registered query (with * marking exact-gated
ones). Results print as a table by default; ``--out`` writes parquet /
csv / jsonl via the engine's sinks instead.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--limit", type=int, default=20, help="rows to print (table mode)")
    ap.add_argument("--out", help="write results to this path instead of printing")
    ap.add_argument("--format", default="parquet", choices=["parquet", "csv", "jsonl"])
    ap.add_argument("--explain", action="store_true", help="print the formatted plan")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    from etl_market_survey_spark.plans import registry

    if args.list or not args.query:
        for name in sorted(registry.QUERIES):
            mark = "*" if name in registry.ORACLE else " "
            print(f"{mark} {name}")
        return 0

    if args.query not in registry.QUERIES:
        print(f"unknown query {args.query!r}; --list shows all", file=sys.stderr)
        return 2

    from etl_market_survey_spark.session import get_spark

    spark = get_spark(f"run-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    df = registry.QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.out:
        from etl_market_survey_spark.sources.writers import (
            write_csv,
            write_jsonl,
            write_parquet,
        )

        {"parquet": write_parquet, "csv": write_csv, "jsonl": write_jsonl}[
            args.format
        ](df, args.out)
        n = spark.read.format(
            "json" if args.format == "jsonl" else args.format
        ).load(args.out).count() if args.format != "csv" else None
        print(f"wrote {args.out} [{args.format}] in {time.time() - t0:.2f}s"
              + (f" ({n} rows)" if n is not None else ""))
    else:
        df.show(args.limit, truncate=40)
        print(f"[{df.count()} rows in {time.time() - t0:.2f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
