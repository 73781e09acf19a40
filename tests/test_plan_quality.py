"""Plan-shape regression tests: the properties that matter at 100 TB,
asserted on flagship queries so a refactor can't silently lose them
(`tools/plan_audit.py` is the ad-hoc版; this is the CI gate).

- parquet scans push filters / prune columns
- dimension joins broadcast
- no CartesianProduct anywhere in the flagship set
- whole-stage codegen spans exist (expressions stay JVM-side)
"""

import re

import pytest

from etl_market_survey_spark.plans import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def static_plan(spark):
    """Plan text with AQE off (AdaptiveSparkPlan hides codegen spans in
    the pre-execution toString) and metadata untruncated."""
    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.maxMetadataStringLength": spark.conf.get(
            "spark.sql.maxMetadataStringLength"
        ),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")

    def get(name):
        df = registry.QUERIES[name](spark, SF)
        return df._jdf.queryExecution().executedPlan().toString()

    yield get
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_q01_pushdown_and_pruning(static_plan):
    plan = static_plan("q01_pricing_summary")
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "PushedFilters: [" in scan and "IsNotNull" in scan or "LessThan" in scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m, scan
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    # 16-column fact, single-digit projection
    assert 0 < len(cols) <= 8, cols
    assert "l_comment" not in cols


def test_q04_dim_join_broadcasts(static_plan):
    plan = static_plan("q04_join_enrich")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "q04_join_enrich",
        "q13_delta_t",
        "q19_minhash_lsh",
        "q38_time_resolution_pipeline",
        "q96_similarity_join",
        "q114_editdist_join",
        "q140_pack_sequences",
        "q143_df_prune",
    ],
)
def test_no_cartesian_and_codegen(static_plan, name):
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    # codegen spans show as "*(n) Operator" in the concise plan string
    assert re.search(r"\*\(\d+\)", plan), name


def test_q24_exact_topk_never_shuffles_corpus(static_plan):
    # the exact cosine baseline's contract: corpus side is map-only —
    # the only exchange feeds the final small top-k reduction
    plan = static_plan("q24_cosine_topk")
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    # map-side WindowGroupLimit prunes per-partition top-k, then one hash
    # shuffle on query_id + one range shuffle for the output sort; the
    # corpus itself is never re-partitioned, queries arrive broadcast
    assert len(shuffles) <= 2, plan[:1500]
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle
