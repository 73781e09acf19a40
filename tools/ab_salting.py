"""Skew A/B for hot-key join salting (operators/salting; VERDICT r4
item 8 follow-through): a deliberately skewed name corpus — one soundex
block holding a quadratic share of the candidate volume — joined with
and without salting, ABBA-interleaved best-of-3, plus the pair-identity
check at full scale.

Corpus: HOT names 'smith<i>' (all soundex S530 -> one block with
C(n_hot, 2) candidate pairs in ONE task when unsalted) + COLD names
with base-26 letter prefixes spreading across blocks.

Run: python tools/ab_salting.py [n_hot] [n_cold] [n_salt]
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from etl_market_survey_spark.operators.phonetic import (  # noqa: E402
    soundex_blocked_pairs,
)


def corpus(spark, n_hot: int, n_cold: int):
    hot = spark.range(n_hot).select(
        F.concat(F.lit("smith"), F.col("id").cast("string")).alias("author")
    )
    # three base-26 letters from the id spread cold names over many codes
    cold = spark.range(n_cold).select(
        F.concat(
            F.char(F.lit(65) + F.col("id") % 26),
            F.char(F.lit(65) + (F.col("id") / 26).cast("long") % 26),
            F.char(F.lit(65) + (F.col("id") / 676).cast("long") % 26),
            F.lit("name"),
            F.col("id").cast("string"),
        ).alias("author")
    )
    return hot.unionByName(cold)


def main():
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n_cold = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    n_salt = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark, n_hot, n_cold).persist()
    n = df.count()
    print(f"corpus: {n} names ({n_hot} in one hot soundex block)")

    def run(salt):
        t0 = time.monotonic()
        out = soundex_blocked_pairs(
            df, "author", max_dist=2, salt=salt, hot_threshold=1000
        )
        c = out.count()
        return time.monotonic() - t0, c

    # pair-identity at full scale (once, untimed)
    base_pairs = soundex_blocked_pairs(df, "author", max_dist=2)
    salt_pairs = soundex_blocked_pairs(
        df, "author", max_dist=2, salt=n_salt, hot_threshold=1000
    )
    diff = (
        base_pairs.exceptAll(salt_pairs).count()
        + salt_pairs.exceptAll(base_pairs).count()
    )
    print(f"pair identity: symmetric diff = {diff}")
    assert diff == 0

    times = {"unsalted": [], f"salted_{n_salt}": []}
    arms = [1, n_salt]
    for rep in range(3):
        order = arms if rep % 2 == 0 else arms[::-1]
        for s in order:
            spark.catalog.clearCache()
            df.persist().count()
            t, c = run(s)
            times["unsalted" if s == 1 else f"salted_{n_salt}"].append(t)
    for arm, ts in times.items():
        print(
            f"{arm:<12} best {min(ts):.3f}s median {statistics.median(ts):.3f}s "
            f"runs {' '.join(f'{t:.3f}' for t in ts)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
