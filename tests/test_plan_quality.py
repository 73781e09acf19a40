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


# ---------------------------------------------------------------------------
# round-2 additions: TPC-H completion + ML/behavior batches
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "q174_volume_shipping",
        "q176_product_profit",
        "q182_large_orders",
        "q183_disjunctive_join",
        "q185_waiting_supplier",
        "q187_min_cost_supplier",
        "q191_grouped_ols",
        "q195_cumulative_users",
        "q197_markov_transitions",
        "q201_dsir_selection",
        "q212_rrf_fusion",
        "q213_target_encoding",
        "q215_ks_test",
        "q217_bpe_pair_stats",
        "q221_ab_test",
    ],
)
def test_r2_no_cartesian_and_codegen(static_plan, name):
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name


def test_q176_all_dims_broadcast(static_plan):
    # part, supplier, nation are all broadcast; only the orderkey
    # fact-fact join may shuffle
    plan = static_plan("q176_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_q182_aggregates_fact_before_joins(static_plan):
    # the HAVING rollup must prune the lineitem scan to exactly the two
    # columns the pre-aggregation needs — proof the fact is reduced
    # before the orders/customer joins see it
    plan = static_plan("q182_large_orders")
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    li_scan = next(ln for ln in scans if "l_orderkey" in ln)
    m = re.search(r"ReadSchema: struct<([^>]*)>", li_scan)
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert sorted(cols) == ["l_orderkey", "l_quantity"], cols


def test_q183_disjunction_stays_residual_filter(static_plan):
    # OR-of-triples must NOT become a union of scans: one broadcast
    # equi-join on partkey, a single lineitem scan, predicate residual
    plan = static_plan("q183_disjunctive_join")
    assert "BroadcastHashJoin" in plan
    li_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "l_quantity" in ln
    ]
    assert len(li_scans) == 1, plan[:2000]


def test_q189_assignment_is_jvm_only(static_plan):
    # k-means assignment/update must stay whole-stage-codegen column
    # algebra — no Python evaluation anywhere in the plan
    plan = static_plan("q189_kmeans_lloyd")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's InjectRuntimeFilter must add a might_contain probe on the
    fact side when the dim side is selectively filtered — the automatic
    counterpart of operators/bloom's explicit semi-join pruning. At
    100 TB this is the knob that keeps a 0.1%-selective dim filter from
    shuffling the whole fact; thresholds here simulate that geometry
    (creation side under the max, application side over the min)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # the probe must land on the FACT (lineitem) branch
        probe = next(ln for ln in plan.splitlines() if "might_contain" in ln)
        assert "l_orderkey" in probe
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# round-3 additions: graph/ts/IR/CF/phonetic batches
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "q234_sssp",
        "q235_soundex_blocking",
        "q237_theil_sen",
        "q238_seasonal_decompose",
        "q240_phrase_search",
        "q241_item_cf",
        "q243_personalized_pagerank",
        "q244_mann_kendall",
        "q245_bh_fdr",
    ],
)
def test_r3_no_cartesian_and_codegen(static_plan, name):
    # (q236's all-pairs baseline mode deliberately cross-joins the
    # bounded distinct-name set and is excluded; its soundex-blocked
    # scale mode joins on the code.)
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name


def test_q240_postings_filter_reaches_scan(static_plan):
    # phrase search must filter to the phrase's tokens BEFORE the
    # groupBy(doc) shuffle: the exploded token stream is filtered by an
    # IN list, so the aggregation input is posting-sized, not corpus-
    # token-sized
    plan = static_plan("q240_phrase_search")
    assert "CartesianProduct" not in plan
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    # one shuffle on doc_id for the position-set aggregation (plus the
    # output sort's range exchange)
    assert len(shuffles) <= 2, plan[:1500]


def test_q250_single_scan_moment_kernel(static_plan):
    # the correlation matrix must be a TRUE single-pass kernel: one
    # parquet scan, one aggregate, six rows generated from the single
    # moment row (VERDICT r3: the union-of-selects shape re-scanned the
    # fact 6x because exchange reuse never fired across union branches)
    plan = static_plan("q250_corr_matrix")
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 1, plan[:2000]
    assert "Generate inline" in plan or "Generate" in plan, plan[:2000]


@pytest.mark.parametrize("name", ["q78_upsert", "q79_snapshot_diff"])
def test_merge_family_base_cached_single_scan(spark, name):
    # the merge-family inputs are self-referential (updates derived from
    # the base), so the base is cache()d: every reference must go through
    # the cache (InMemoryTableScan / TableCacheQueryStage), which computes
    # the underlying parquet scan ONCE per action. (FileScan lines in the
    # toString are the cached relation's plan reprinted under each cache
    # node, not separate executions.)
    df = registry.QUERIES[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_cache_refs = plan.count("InMemoryTableScan")
    assert n_cache_refs >= 3, plan[:2000]
    spark.catalog.clearCache()


# round-4 additions: no cartesian products; whole-stage codegen spans
# exist; BroadcastNestedLoopJoin appears ONLY where it is the intended
# plan — a broadcast crossJoin of a bounded-by-contract frame (cluster
# centroids, query sets, one-row global aggregates)
_R4_BOUNDED_BNLJ = {
    "q262_simplified_silhouette",  # 2^planes cluster rows
    "q273_ndcg_mrr",               # 5-query literal set
    "q277_sq8_quantized_topk",     # 5 queries + 1-row dim stats
    "q282_cuped",                  # 1-row pooled moments
}


@pytest.mark.parametrize(
    "name",
    [
        "q258_aho_corasick_scan",
        "q259_spatial_neighbor_join",
        "q261_sax_motifs",
        "q262_simplified_silhouette",
        "q263_bpe_encode",
        "q264_feature_hashing",
        "q266_interval_coalesce",
        "q273_ndcg_mrr",
        "q275_url_domain_cap",
        "q276_html_extract",
        "q277_sq8_quantized_topk",
        "q282_cuped",
        "q283_diff_in_diff",
        "q284_quantile_treatment_effects",
        "q286_rolling_ols_slope",
    ],
)
def test_r4_no_cartesian_and_codegen(static_plan, name):
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name
    if name not in _R4_BOUNDED_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, name


_R4B_BOUNDED_BNLJ = {
    "q293_lm_perplexity",        # 1-row (n, vocab) scalars
    "q294_pmi_collocations",     # 1-row token/bigram totals
    "q295_naive_bayes_langid",   # 5-row class priors + 1-row totals
    "q296_hits",                 # 1-row L1 normalizers per round
    "q297_decision_stump",       # 1-row (n, positives) totals
    "q302_cv_ridge",             # 1-row total-stats row
    "q303_gbdt_stumps",          # 1-row stump/total rows per round
    "q305_dtw_series",           # 1-row day bounds + series pair join
    "q306_shapley_attribution",  # 16-row literal coalition lattice
    "q308_bradley_terry",        # 1-row normalizer
    "q309_logistic_newton",      # 1-row coefficient row per step
    "q310_minhash_quality",      # 1-row metric counts
    "q311_als_round",            # 1-row fit row
    "q312_woe_iv",               # 1-row totals + IV scalar
    "q313_huber_irls",           # 1-row coefficient rows
    "q315_periodogram",          # 1-row day-bound grid row
    "q316_ransac_line",          # 16-row candidate broadcast
    "q317_auc_bootstrap_ci",     # 1-row metric/percentile rows
    "q319_skyline",              # bounded staircase anti-join
    "q322_regression_discontinuity",  # 1-row side-fit rows
    "q323_polygon_metrics",      # per-nation anchor broadcast
    "q324_croston_forecast",     # pinned 5-part series
    "q325_team_draft_interleave",  # 1-row ranking-list state
    "q326_bitext_margin_mining",   # bounded-half dot table (ANN-swappable)
    "q328_mann_whitney_u",         # 1-row stat row
    "q329_raking_ipf",             # broadcast margin tables
    "q330_good_turing",            # 1-row totals
    "q331_heaps_law",              # 1-row OLS stats
    "q336_span_corruption",        # 1-row nothing (guard)
    "q337_hard_negative_mining",   # 1-row corpus stats
    "q344_js_divergence",          # source-dimension broadcast
    "q345_fairness_audit",         # 1-row global extremes
    "q346_cohens_kappa",           # 1-row contingency row
    "q340_referential_integrity",  # 1-row per-edge child-count rows
    "q347_psm_att",                # ~50-level propensity table pairing
    "q348_oaxaca_blinder",         # 1-row group-fit rows
    "q350_overdispersion",         # 1-row day bounds
    "q351_srm_check",              # 1-row contingency
    "q352_mixture_fit",            # 1-row w / residual rows
}


@pytest.mark.parametrize(
    "name",
    [
        "q292_aipw_ate",
        "q293_lm_perplexity",
        "q294_pmi_collocations",
        "q295_naive_bayes_langid",
        "q296_hits",
        "q297_decision_stump",
        "q298_ridge_closed_form",
        "q299_phash_neardup",
        "q300_winnowing",
        "q301_cdc_chunk_dedup",
        "q302_cv_ridge",
        "q303_gbdt_stumps",
        "q306_shapley_attribution",
        "q307_textrank_keywords",
        "q308_bradley_terry",
        "q309_logistic_newton",
        "q310_minhash_quality",
        "q311_als_round",
        "q312_woe_iv",
        "q313_huber_irls",
        "q314_bilinear_resize",
        "q315_periodogram",
        "q316_ransac_line",
        "q317_auc_bootstrap_ci",
        "q319_skyline",
        "q321_l_diversity",
        "q322_regression_discontinuity",
        "q323_polygon_metrics",
        "q324_croston_forecast",
        "q325_team_draft_interleave",
        "q326_bitext_margin_mining",
        "q327_url_canonicalize",
        "q328_mann_whitney_u",
        "q329_raking_ipf",
        "q330_good_turing",
        "q331_heaps_law",
        "q333_degree_assortativity",
        "q334_s_stemmer",
        "q335_hist_equalize",
        "q336_span_corruption",
        "q337_hard_negative_mining",
        "q338_tokenizer_fertility",
        "q339_dialogue_flatten",
        "q340_referential_integrity",
        "q341_sequence_gaps",
        "q343_bot_regularity",
        "q344_js_divergence",
        "q345_fairness_audit",
        "q346_cohens_kappa",
        "q347_psm_att",
        "q348_oaxaca_blinder",
        "q349_ngram_novelty",
        "q350_overdispersion",
        "q351_srm_check",
        "q352_mixture_fit",
    ],
)
def test_r4b_no_cartesian_and_codegen(static_plan, name):
    """Session additions: every scalar 'join' is a broadcast of a
    one-row (or literal-bounded) aggregate — never a cartesian; and
    expressions stay inside whole-stage codegen."""
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name
    if name not in _R4B_BOUNDED_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "q353_bitext_margin_srp",
        "q354_bitext_margin_ivf",
        "q355_jpeg_progressive_roundtrip",
        "q356_delta_log_protocol",
        "q357_rollup_hierarchy",
        "q358_cube_priority_status",
        "q359_grouping_sets",
        "q360_block_matmul",
    ],
)
def test_r5_no_cartesian_and_codegen(static_plan, name):
    """Round-5 additions: no cartesian products, expressions stay in
    whole-stage codegen."""
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name
    if name == "q354_bitext_margin_ivf":
        # r6: the frozen IVF codebook is attached as ONE single-row
        # broadcast array<struct> DataFrame (replacing 4k-literal
        # expression trees that cost ~8s of py4j/Catalyst per run).
        # The attach subtree is re-referenced per consumer in the
        # formatted plan, so we assert SHAPE, not count: every BNLJ
        # must be the bounded BuildRight cross-attach of that 1-row
        # broadcast — same class as the _R4B_BOUNDED_BNLJ stitches.
        n = plan.count("BroadcastNestedLoopJoin")
        assert n == plan.count("BroadcastNestedLoopJoin BuildRight, Cross"), name
    else:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q357_rollup_single_scan_expand(static_plan):
    """The rollup levels must come from ONE Expand over one scan —
    never unioned re-aggregations (that is the whole point of the
    operator at scale)."""
    plan = static_plan("q357_rollup_hierarchy")
    assert plan.count("Expand") >= 1
    assert plan.count("FileScan parquet") <= 3  # customer+nation+region once
    assert "Union" not in plan


def test_q360_block_pairing_is_equi_join(static_plan):
    """Tile pairing joins on the inner block index (SortMergeJoin or
    hash join on k) — a cross join of tiles would be quadratic in the
    block grid."""
    plan = static_plan("q360_block_matmul")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


_R5B_BOUNDED_BNLJ = {
    "q364_table_profile",  # 1-row x 1-row stitch of the two agg passes
}


@pytest.mark.parametrize(
    "name",
    [
        "q361_unicode_nfc",
        "q362_global_sort_index",
        "q363_scd2_history",
        "q364_table_profile",
        "q366_iceberg_protocol",
        "q367_calendar_functions",
        "q368_higher_order_arrays",
        "q369_delta_data_skipping",
    ],
)
def test_r5b_no_cartesian_and_codegen(static_plan, name):
    """Round-5 continuation (q365 excluded: the expectations runner
    evaluates rules eagerly, so its returned frame is a local table)."""
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name
    if name not in _R5B_BOUNDED_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q362_no_single_partition_exchange(static_plan):
    """The operator's reason to exist: global ranks WITHOUT the
    Exchange SinglePartition a bare ROW_NUMBER() window forces."""
    plan = static_plan("q362_global_sort_index")
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan


def test_q368_lambdas_stay_in_codegen(static_plan):
    """Higher-order functions are Catalyst expressions — the plan must
    contain NO Python evaluation nodes at all."""
    plan = static_plan("q368_higher_order_arrays")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "transform" in plan and "filter" in plan


@pytest.mark.parametrize(
    "name",
    ["q80_ntile_deciles", "q148_weighted_median", "q150_spearman", "q08_ecdf"],
)
def test_grouped_rank_is_range_partitioned(static_plan, name):
    """The r6 verdict's named scale-killer: a rank window partitioned by
    a bounded-cardinality key (3-value l_returnflag / event_type) is a
    single-task sort of n/k rows. These queries must route ranks through
    the range-partitioned grouped_sort_index kernel: the plan carries a
    rangepartitioning exchange (the parallel sort), no SinglePartition
    exchange, and every window's partition spec includes the kernel's
    _pid column (never the bare group key over the full scan)."""
    plan = static_plan(name)
    assert "rangepartitioning" in plan, name
    assert "SinglePartition" not in plan, name
    for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "_pid" in spec, f"{name}: window not sliced by _pid: {spec}"


def test_q383_bucket_pruning_never_reads_other_buckets(spark):
    """Hidden partitioning's scan contract: a source-value filter over
    a bucket[8] spec lists ONLY files of the transformed buckets."""
    from etl_market_survey_spark.plans import registry
    from etl_market_survey_spark.sources.iceberg_transforms import (
        transform_value,
    )

    df = registry.QUERIES["q383_iceberg_bucket_transform"](spark, SF)
    df.collect()  # materialize so the table exists on disk
    import hashlib

    from etl_market_survey_spark.sources.iceberg import (
        read_iceberg, snapshot_files,
    )

    path = f"/tmp/spark_graft_icebkt_{hashlib.md5(SF.encode()).hexdigest()[:10]}"
    keys = [1000, 3000]
    want = {transform_value("bucket", 8, k, "long") for k in keys}
    pruned = read_iceberg(spark, path, partition_filter={"k": keys})
    files = pruned.inputFiles()
    assert files and all(
        any(f"k_bucket={b}/" in f for b in want) for f in files
    )
    assert len(files) < len(snapshot_files(path))


@pytest.mark.parametrize(
    "name",
    [
        "q370_delta_deletion_vectors",
        "q371_iceberg_position_deletes",
        "q373_iceberg_equality_deletes",
        "q375_delta_merge",
        "q376_iceberg_upsert",
        "q377_delta_change_feed",
        "q378_iceberg_changelog",
        "q379_delta_lite_datasource",
        "q380_iceberg_lite_datasource",
        "q381_delta_zorder",
        "q382_delta_cdf_sidecar",
        "q383_iceberg_bucket_transform",
        "q384_delta_zorder3",
        "q385_delta_cdf_stream",
        "q386_delta_delete_where",
        "q387_delta_update_where",
        "q388_iceberg_delete_where",
        "q389_iceberg_update_where",
        "q390_iceberg_compaction",
    ],
)
def test_r6_no_cartesian_and_codegen(static_plan, name):
    """Round-6/7 lakehouse batch (VERDICT r6 item 5): the returned
    frame's plan must stay JVM-side with no cartesian and no
    unsanctioned nested-loop join. (q372/q374 are codec round-trips
    whose gates return local comparison tables — no scan plan to
    assert.)"""
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q154_rotation_stays_out_of_generated_code(static_plan):
    """VERDICT r7 item 2: the OPQ rotation must travel as task data,
    not as a ~1024-literal expression tree — the literal form overflows
    the JVM generated-method limit and silently drops the scan stage to
    interpreted eval. Gate: no rotation coefficient appears in the plan
    text, the rotation runs inside the Arrow kernel (MapInPandas), and
    the surrounding stages keep whole-stage-codegen spans."""
    from etl_market_survey_spark.plans.q_dedup import _q154_setup

    blocks, _, _ = _q154_setup()
    plan = static_plan("q154_rotated_pq_topk")
    assert repr(blocks[0][0][0]) not in plan
    assert repr(blocks[0][0][1]) not in plan
    assert "MapInPandas" in plan
    assert re.search(r"\*\(\d+\)", plan)
    assert "CartesianProduct" not in plan


def test_q407_bq_candidate_stage_is_bits_only(static_plan):
    """Binary-quantization ANN contract: the candidate pass reduces the
    corpus to (id, one BIGINT) before the broadcast cross with the
    queries — the embedding array must NOT travel through the Hamming
    window shuffle; full vectors are fetched only for the broadcast
    candidate list. Both window stages keep the map-side
    WindowGroupLimit partial top-k, and nothing is cartesian."""
    plan = static_plan("q407_bq_hamming_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert plan.count("WindowGroupLimit") >= 4  # partial+final, both stages
    # the hamming shuffle carries no array column: every non-broadcast
    # exchange row is (query_id, vec_id, ...) scalars
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "_cv" not in ln and "_qvec" not in ln and "embedding" not in ln
    assert re.search(r"\*\(\d+\)", plan)


@pytest.mark.parametrize(
    "name",
    [
        "q408_iceberg_zorder",
        "q409_dp_release",
        "q410_iceberg_wap",
        "q411_iceberg_metadata_tables",
        "q412_delta_zorder_incremental",
        "q413_iceberg_wap_audit_fix",
        "q414_audio_fingerprint",
        "q415_label_propagation",
    ],
)
def test_r10c_no_cartesian_and_codegen(static_plan, name):
    """Round-10 continuation batch: returned frames stay JVM-side with
    no cartesian product and no unsanctioned nested-loop join."""
    plan = static_plan(name)
    assert "CartesianProduct" not in plan, name
    assert re.search(r"\*\(\d+\)", plan), name
    assert "BroadcastNestedLoopJoin" not in plan, name
