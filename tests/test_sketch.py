"""Count-min sketch unit tests: overestimate guarantee and pruning-only
candidate semantics."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[A-Za-z]+|[0-9]+"), F.lit(0))
        ).alias("token")
    )


def test_cms_never_underestimates(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    sketch = cms_build(toks, "token", depth=4, width=64)  # narrow: force collisions
    truth = toks.groupBy("token").agg(F.count("*").alias("true_cnt"))
    est = truth.withColumn("est", cms_estimate(F.col("token"), sketch))
    assert est.filter(F.col("est") < F.col("true_cnt")).count() == 0


def test_cms_total_mass_per_row(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    n = toks.count()
    sketch = cms_build(toks, "token", depth=3, width=32)
    assert all(sum(row) == n for row in sketch)


def test_cms_heavy_hitters_equals_plain_groupby(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    for width in (16, 1024):  # heavy collisions and none: result identical
        got = {
            (r.token, r.cnt)
            for r in cms_heavy_hitters(toks, "token", threshold=50, width=width).collect()
        }
        want = {
            (r.token, r.cnt)
            for r in toks.groupBy(F.col("token"))
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") >= 50)
            .collect()
        }
        assert got == want


# --- KMV / theta distinct sketch -------------------------------------------

from etl_market_survey_spark.operators.sketch import KmvSketch, kmv_build  # noqa: E402


def test_kmv_small_set_is_exact(spark):
    df = spark.range(500).select((F.col("id") % 200).alias("v"))
    sk = kmv_build(df, "v", k=1024)
    assert sk.estimate() == 200.0
    assert sk.theta == 1.0


def test_kmv_estimate_within_error_bound(spark):
    # KMV rse ~ 1/sqrt(k-2); assert < 4 sigma (deterministic: xxhash64)
    n = 50_000
    df = spark.range(4 * n).select((F.col("id") % n).alias("v"))
    k = 1024
    sk = kmv_build(df, "v", k=k)
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(sk.estimate() - n) / n < 4 * rse


def test_kmv_build_deterministic(spark):
    df = spark.range(30_000).select(F.col("id").alias("v"))
    a = kmv_build(df, "v", k=256)
    b = kmv_build(df.repartition(13), "v", k=256)  # partitioning-invariant
    assert a.hashes == b.hashes


def test_kmv_set_operations(spark):
    k = 1024
    a = kmv_build(spark.range(0, 60_000).select(F.col("id").alias("v")), "v", k=k)
    b = kmv_build(spark.range(40_000, 100_000).select(F.col("id").alias("v")), "v", k=k)
    rse = 1.0 / (k - 2) ** 0.5
    assert abs(a.union(b).estimate() - 100_000) / 100_000 < 4 * rse
    # intersection/jaccard error scales with 1/jaccard; allow a loose band
    assert abs(a.intersect_estimate(b) - 20_000) / 20_000 < 0.15
    assert abs(a.jaccard(b) - 0.2) / 0.2 < 0.15


def test_kmv_union_merges_sorted_prefix():
    a = KmvSketch(4, [10, 20, 30, 40])
    b = KmvSketch(4, [15, 20, 35, 50])
    assert a.union(b).hashes == [10, 15, 20, 30]


# --- grouped KMV DataFrame aggregate ----------------------------------------


def test_kmv_grouped_unsaturated_is_exact(spark):
    # every group has < k distinct values -> estimate is the exact count
    from etl_market_survey_spark.operators.sketch import (
        kmv_estimate_col,
        kmv_grouped,
    )

    rows = [(g, f"v{g}_{i % (10 * (g + 1))}") for g in range(4) for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v string").repartition(8)
    sk = kmv_grouped(df, ["g"], "v", k=256)
    got = {
        r["g"]: r["est"]
        for r in sk.select("g", kmv_estimate_col(F.col("hs"), 256).alias("est")).collect()
    }
    assert got == {g: float(10 * (g + 1)) for g in range(4)}


def test_kmv_grouped_saturated_error_bound(spark):
    from etl_market_survey_spark.operators.sketch import (
        kmv_estimate_col,
        kmv_grouped,
    )

    n_distinct = 20_000
    df = spark.createDataFrame(
        [(1, f"x{i}") for i in range(n_distinct)], "g int, v string"
    ).repartition(16)
    k = 512
    est = (
        kmv_grouped(df, ["g"], "v", k=k)
        .select(kmv_estimate_col(F.col("hs"), k).alias("est"))
        .collect()[0]["est"]
    )
    # KMV relative error ~ 1/sqrt(k-2) ≈ 4.4%; allow 5 sigma
    assert abs(est - n_distinct) / n_distinct < 5 / (k - 2) ** 0.5


def test_kmv_grouped_set_ops_exact_when_unsaturated(spark):
    from etl_market_survey_spark.operators.sketch import kmv_grouped, kmv_set_ops_col

    # A = {0..99}, B = {50..179}: |A∪B| = 180, |A∩B| = 50, J = 50/180
    rows = [("a", f"k{i}") for i in range(100)] + [("b", f"k{i}") for i in range(50, 180)]
    df = spark.createDataFrame(rows, "side string, v string").repartition(4)
    sk = kmv_grouped(df, ["side"], "v", k=1024)
    a = sk.filter(F.col("side") == "a").select(F.col("hs").alias("a"))
    b = sk.filter(F.col("side") == "b").select(F.col("hs").alias("b"))
    u, i, j = kmv_set_ops_col(F.col("a"), F.col("b"), 1024)
    row = a.crossJoin(b).select(
        u.alias("u"), i.alias("i"), j.alias("j")
    ).collect()[0]
    assert row["u"] == 180.0
    assert row["i"] == 50.0
    assert abs(row["j"] - 50 / 180) < 1e-12


def test_kmv_grouped_matches_driver_sketch(spark):
    # the distributed aggregate and the driver-side kmv_build must agree
    # on the identical hash set (same k, same input)
    from etl_market_survey_spark.operators.sketch import kmv_build, kmv_grouped

    df = spark.createDataFrame(
        [(1, f"v{i % 3000}") for i in range(10_000)], "g int, v string"
    ).repartition(8)
    k = 128
    grouped_hs = kmv_grouped(df, ["g"], "v", k=k).collect()[0]["hs"]
    driver_sk = kmv_build(df, "v", k=k)
    assert list(grouped_hs) == list(driver_sk.hashes)


def test_kmv_merge_agg_equals_rebuild(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — exactly, saturated
    or not (the property that lets one sketch pass serve every rollup
    level)."""
    from pyspark.sql import functions as F

    from etl_market_survey_spark.operators.sketch import kmv_grouped, kmv_merge_agg

    rows = [(f"g{i % 7}", f"v{i % 401}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, v string")
    for k in (16, 4096):  # saturated and unsaturated
        fine = kmv_grouped(df, ["g"], "v", k=k)
        merged = sorted(
            fine.agg(kmv_merge_agg("hs", k).alias("hs")).collect()[0].hs
        )
        rebuilt = sorted(
            kmv_grouped(df.withColumn("g", F.lit("all")), ["g"], "v", k=k)
            .collect()[0]
            .hs
        )
        assert merged == rebuilt, k
