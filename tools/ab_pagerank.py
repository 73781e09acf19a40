"""Same-session interleaved A/B for the PageRank family (VERDICT r4
item 7): r3's ``undirected_edges`` (no cache on the symmetrize input)
vs r4's (``pairs.cache()``), q97 + q243 at sf0.1, best-of-3 per arm,
ABBA-interleaved so ambient drift hits both arms equally.

Run: python tools/ab_pagerank.py [sf_dir]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import etl_market_survey_spark.operators.pagerank as pr  # noqa: E402
from etl_market_survey_spark.plans.registry import QUERIES  # noqa: E402
import __spark_entry__  # noqa: E402,F401 — populates the registry


def undirected_edges_r3(pairs, src: str, dst: str):
    """The r3 body: no cache — both union branches recompute `pairs`."""
    a = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    b = pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return a.unionByName(b).distinct()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    r4_impl = pr.undirected_edges
    arms = {"r3_nocache": undirected_edges_r3, "r4_cache": r4_impl}
    queries = ["q97_pagerank", "q243_personalized_pagerank"]

    # warm the JVM + file cache once per query (not attributed to an arm)
    for q in queries:
        QUERIES[q](spark, sf_dir).count()

    times = {(q, a): [] for q in queries for a in arms}
    for rep in range(3):
        order = list(arms) if rep % 2 == 0 else list(arms)[::-1]  # ABBA
        for arm in order:
            pr.undirected_edges = arms[arm]
            for q in queries:
                spark.catalog.clearCache()
                t0 = time.monotonic()
                QUERIES[q](spark, sf_dir).count()
                times[(q, arm)].append(time.monotonic() - t0)
    pr.undirected_edges = r4_impl

    print(f"{'query':<28} {'arm':<12} best    median  runs")
    for q in queries:
        for arm in arms:
            ts = times[(q, arm)]
            print(
                f"{q:<28} {arm:<12} {min(ts):.3f}   "
                f"{statistics.median(ts):.3f}  "
                + " ".join(f"{t:.3f}" for t in ts)
            )
    spark.stop()


if __name__ == "__main__":
    main()
