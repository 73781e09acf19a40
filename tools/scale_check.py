"""sf1 scale spot-check (VERDICT r2 item 7): synthesize a 10x corpus
from the driver's sf0.1 tables, bench the heaviest queries at both
scales, and verify near-linear scaling — catching any hidden
superlinear path the toy scale masks.

Synthesis (deterministic, no RNG): each fact/entity table is replicated
FACTOR times with key-space shifts that preserve the join topology and
per-key group sizes (each replica is a disjoint copy of the world):

- customer/orders/lineitem: custkey/orderkey shifted per replica,
  lineitem rides its orders; part/supplier/nation/region stay (broadcast
  dims — their fan-in grows linearly, like TPC-H's fixed region/nation)
- events: event_id/user_id shifted — per-user timelines identical, so
  sessionization/interval-join state stays per-key constant
- customer: c_name gets a 3-char replica tag (cross-replica edit
  distance >= 3) so edit-distance joins scale 10x, not quadratically
  over phantom duplicate-name clusters
- documents: doc_id shifted and EVERY token tagged with the replica id
  (cross-replica Jaccard ~ 0) so set-similarity joins see 10x the
  work; within-replica pair structure is preserved exactly
- embeddings: vec_id shifted; replicas _r > 0 get INDEPENDENT
  hash-seeded coordinates (pmod(xxhash64(vec_id, dim), grid) mapped to
  [-1, 1]) instead of the r4 one-coordinate nudge, whose cross-replica
  cosine ~ 1 created phantom near-dup pairs and forced q299/q326 out
  of the 10x table (VERDICT r4 item 3). Independent replicas make
  cross-replica cosine ~ 0 and pHash/SRP band collisions random, so
  pair-generating embedding operators can finally be measured.

Usage: python tools/scale_check.py [--factor 10] [--out /tmp/...]
Writes the per-query timing table to stdout as JSON; paste into
SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "q194_bfs_hops",
    "q26_bootstrap_hash",
    "q189_kmeans_lloyd",
    "q114_editdist_join",
    "q139_maintained_view",
    "q96_similarity_join",
    # r3 heavy additions (VERDICT r3 item 6): never saw 10x data before
    "q243_personalized_pagerank",
    "q239_holt_smoothing",
    "q241_item_cf",
    "q247_markov_attribution",
    # r4 additions with per-row/per-doc linear shapes. (q259 spatial and
    # q281 temporal-BFS are deliberately EXCLUDED: the synthesis shifts
    # keys but keeps the coordinate grid / co-presence buckets fixed, so
    # 10x points legitimately produce ~100x neighbor pairs / contact
    # edges — a density effect of the synthetic world, not an operator
    # flaw; a faithful scale test for them needs a 10x-larger space.)
    "q258_aho_corasick_scan",
    "q265_right_maximal_repeats",
    # r5 (VERDICT r4 item 3): the two pairwise embedding operators the
    # nudged-replica synthesis used to exclude — measurable now that
    # replicas carry independent embeddings — plus the new bitext ANN
    # scale path (q354 splits the corpus in half, so both sides grow).
    "q299_phash_neardup",
    "q354_bitext_margin_ivf",
    # r5 continuation: the terasort-shaped global index (range shuffle +
    # local windows — should be ~n log n) and the SCD2 window fold
    # (per-key state, expected linear). q360 block-matmul is EXCLUDED:
    # the synthesis shifts keys mod-space, so matrix DIMENSIONS stay
    # fixed and only cell counts grow — a density effect, not a scale
    # test of the tiling.
    "q362_global_sort_index",
    "q363_scd2_history",
    # r6: lakehouse write paths that scale with orders — the
    # copy-on-write MERGE (stats-pruned rewrite) and the merge-on-read
    # equality-delete read (anti-join scoped by sequence number)
    "q375_delta_merge",
    "q373_iceberg_equality_deletes",
    "q381_delta_zorder",
    # r7: the grouped-rank trio rewritten off the 3-value-key window
    # sorts onto the range-partitioned grouped_sort_index kernel — the
    # 10x runs certify the sort now parallelizes (expected ~n log n,
    # same class as q362)
    "q80_ntile_deciles",
    "q148_weighted_median",
    "q150_spearman",
    "q08_ecdf",
    # r7 lakehouse additions: CDF sidecar MERGE (write+pair+read),
    # bucket-transform write + pruned read, 3-column Z-curve OPTIMIZE
    "q382_delta_cdf_sidecar",
    "q383_iceberg_bucket_transform",
    "q384_delta_zorder3",
    # r7 continuation: the predicate DML verbs (DV/rewrite routing,
    # CDF sidecars; Iceberg positions never touch the driver)
    "q386_delta_delete_where",
    "q387_delta_update_where",
    "q388_iceberg_delete_where",
]

SRC = "/root/testdata/sf0.1"


def synthesize(spark, out_dir: str, factor: int,
               tables: set[str] | None = None) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    def want(name):
        return tables is None or name in tables
    rep = spark.range(factor).select(F.col("id").cast("long").alias("_r"))

    def load(name):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(f"{SRC}/{name}.parquet")

    def save(df, name):
        if not want(name):
            return
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    for dim in ["region", "nation", "part", "supplier"]:
        save(load(dim), dim)
    # heavy tables are independent below except orders->customer key
    # spans; guard each block so --tables synthesizes only what the
    # requested queries read (the 100x runs would otherwise spend
    # minutes replicating documents/embeddings nobody scans)

    cust = load("customer")
    c_span = cust.agg(F.max("c_custkey")).first()[0] + 1
    save(
        cust.crossJoin(rep)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("_r") * c_span)
        # names must differ by >(typical edit threshold) across replicas,
        # or replica copies form exact-duplicate clusters and pairwise
        # operators (q114) go quadratic for a reason the real corpus
        # doesn't have: a 3-char replica tag keeps cross-replica distance
        # >= 3 while preserving within-replica name structure exactly
        .withColumn(
            "c_name",
            F.when(F.col("_r") == 0, F.col("c_name")).otherwise(
                F.concat(
                    F.col("c_name"),
                    F.lit(" "),
                    F.concat_ws(
                        "",
                        F.col("_r").cast("string"),
                        F.col("_r").cast("string"),
                        F.col("_r").cast("string"),
                    ),
                )
            ),
        )
        .drop("_r"),
        "customer",
    )

    orders = load("orders")
    o_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    save(
        orders.crossJoin(rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r") * o_span)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("_r") * c_span)
        .drop("_r"),
        "orders",
    )

    li = load("lineitem")
    save(
        li.crossJoin(rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * o_span)
        .drop("_r"),
        "lineitem",
    )

    ev = load("events")
    e_span = ev.agg(F.max("event_id")).first()[0] + 1
    u_span = ev.agg(F.max("user_id")).first()[0] + 1
    save(
        ev.crossJoin(rep)
        .withColumn("event_id", F.col("event_id") + F.col("_r") * e_span)
        .withColumn("user_id", F.col("user_id") + F.col("_r") * u_span)
        .drop("_r"),
        "events",
    )

    docs = load("documents")
    d_span = docs.agg(F.max("doc_id")).first()[0] + 1
    save(
        docs.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * d_span)
        # tag EVERY token with the replica id: cross-replica token sets
        # become disjoint (Jaccard ~ 0), so set-similarity operators
        # (q96) see 10x the work, not 100x phantom near-dup pairs the
        # real corpus wouldn't have; within-replica structure — token
        # counts, lengths, frequencies — is preserved exactly
        .withColumn(
            "text",
            F.when(F.col("_r") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit("(\\S+)"),
                    F.concat(F.lit("$1x"), F.col("_r").cast("string")),
                )
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_r"),
        "documents",
    )

    emb = load("embeddings")
    v_span = emb.agg(F.max("vec_id")).first()[0] + 1
    save(
        emb.crossJoin(rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("_r") * v_span)
        # replica 0 is the original corpus; replicas > 0 get fully
        # independent hash-seeded coordinates in [-1, 1] so cross-replica
        # cosine ~ 0 — no phantom near-dup pairs (VERDICT r4 item 3)
        .withColumn(
            "embedding",
            F.when(F.col("_r") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), i), F.lit(2000001)
                        ).cast("double")
                        / 1000000.0
                        - 1.0
                    ).cast("float"),
                )
            ),
        )
        .drop("_r"),
        "embeddings",
    )


def bench(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    from etl_market_survey_spark.plans import registry

    out = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
        print(f"# {sf_dir} {name}: {out[name]}s", file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--queries", nargs="*", help="subset of HEAVY to run")
    ap.add_argument("--tables", nargs="*",
                    help="synthesize only these tables (default all)")
    args = ap.parse_args()
    heavy = args.queries or HEAVY

    from etl_market_survey_spark.session import get_spark

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_gen:
        t0 = time.time()
        synthesize(spark, args.out, args.factor,
                   set(args.tables) if args.tables else None)
        print(f"# synthesized x{args.factor} in {time.time()-t0:.1f}s", file=sys.stderr)

    small = bench(spark, SRC, heavy)
    big = bench(spark, args.out, heavy)
    report = {
        "factor": args.factor,
        "queries": {
            n: {
                "sf0.1_s": small[n],
                "sf1_s": big[n],
                "ratio": round(big[n] / small[n], 2) if small[n] else None,
            }
            for n in heavy
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
