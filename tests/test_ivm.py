"""Incremental view maintenance: merge-equals-recompute, retraction
exactness, batch-split invariance, empty-group drop."""

import random

from etl_market_survey_spark.operators.ivm import (
    finalize,
    merge_partials,
    sum_partials,
)
from pyspark.sql import functions as F


def _collect(df):
    return {
        tuple(r[k] for k in sorted(r.asDict())) for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, x double")


def test_merge_equals_recompute(spark):
    rng = random.Random(3)
    rows = [(rng.choice("abc"), rng.uniform(-100, 100)) for _ in range(400)]
    full = _mk(spark, rows)
    a, b = _mk(spark, rows[:123]), _mk(spark, rows[123:])
    merged = merge_partials(
        sum_partials(a, ["k"], ["x"]), sum_partials(b, ["k"], ["x"]), ["k"], ["x"]
    )
    assert _collect(finalize(merged, ["x"])) == _collect(
        finalize(sum_partials(full, ["k"], ["x"]), ["x"])
    )


def test_batch_split_invariance(spark):
    rng = random.Random(9)
    rows = [(rng.choice("ab"), float(rng.randint(0, 50))) for _ in range(200)]
    view = sum_partials(_mk(spark, rows[:50]), ["k"], ["x"])
    # apply the rest in 3 uneven batches vs 1 batch — same final view
    v3 = view
    for lo, hi in ((50, 60), (60, 150), (150, 200)):
        v3 = merge_partials(v3, sum_partials(_mk(spark, rows[lo:hi]), ["k"], ["x"]), ["k"], ["x"])
    v1 = merge_partials(view, sum_partials(_mk(spark, rows[50:]), ["k"], ["x"]), ["k"], ["x"])
    assert _collect(finalize(v3, ["x"])) == _collect(finalize(v1, ["x"]))


def test_retraction_exact(spark):
    rows = [("a", 1.5), ("a", 2.25), ("a", -3.125), ("b", 7.0)]
    view = sum_partials(_mk(spark, rows), ["k"], ["x"])
    # retract one row; result must equal recompute without it
    retr = sum_partials(_mk(spark, [rows[1]]), ["k"], ["x"], sign=F.lit(-1))
    got = _collect(finalize(merge_partials(view, retr, ["k"], ["x"]), ["x"]))
    want = _collect(
        finalize(sum_partials(_mk(spark, [rows[0], rows[2], rows[3]]), ["k"], ["x"]), ["x"])
    )
    assert got == want


def test_empty_group_dropped(spark):
    rows = [("a", 1.0), ("b", 2.0)]
    view = sum_partials(_mk(spark, rows), ["k"], ["x"])
    retr = sum_partials(_mk(spark, [("b", 2.0)]), ["k"], ["x"], sign=F.lit(-1))
    out = merge_partials(view, retr, ["k"], ["x"])
    assert [r.k for r in out.select("k").collect()] == ["a"]


def test_min_max_insert_only(spark):
    a = _mk(spark, [("a", 5.0), ("a", 1.0)])
    b = _mk(spark, [("a", 9.0)])
    merged = merge_partials(
        sum_partials(a, ["k"], ["x"], min_max=True),
        sum_partials(b, ["k"], ["x"], min_max=True),
        ["k"],
        ["x"],
        min_max=True,
    )
    row = finalize(merged, ["x"], min_max=True).collect()[0]
    assert (row.min_x, row.max_x, row.n) == (1.0, 9.0, 3)


def test_join_merge_equals_union_merge(spark):
    from etl_market_survey_spark.operators.ivm import merge_partials_join

    rng = random.Random(23)
    rows = [(rng.choice("abcd"), rng.uniform(-50, 50)) for _ in range(300)]
    view = sum_partials(_mk(spark, rows[:200]), ["k"], ["x"])
    # delta includes retractions
    ins = sum_partials(_mk(spark, rows[200:]), ["k"], ["x"])
    ret = sum_partials(_mk(spark, rows[:30]), ["k"], ["x"], sign=F.lit(-1))
    delta = merge_partials(ins, ret, ["k"], ["x"], drop_empty=False)
    a = _collect(finalize(merge_partials(view, delta, ["k"], ["x"]), ["x"]))
    b = _collect(finalize(merge_partials_join(view, delta, ["k"], ["x"]), ["x"]))
    assert a == b


def test_bucketed_view_merges_without_base_exchange(spark, tmp_path):
    import uuid

    from etl_market_survey_spark.operators.ivm import (
        bucketed_refresh,
        merge_partials_join,
    )
    from etl_market_survey_spark.sources.writers import write_bucketed

    rng = random.Random(29)
    rows = [(f"k{rng.randint(0, 99)}", rng.uniform(0, 10)) for _ in range(2000)]
    view = sum_partials(_mk(spark, rows), ["k"], ["x"])
    t = f"ivm_view_{uuid.uuid4().hex[:8]}"
    # bucket count matches shuffle partitions so the planner never sees a
    # layout mismatch it could "fix" with a shuffle
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed(view, t, ["k"], n_buckets=n_buckets)
    try:
        with bucketed_refresh(spark):
            base = spark.table(t)
            delta = sum_partials(_mk(spark, rows[:100]), ["k"], ["x"])
            merged = merge_partials_join(base, delta, ["k"], ["x"])
            # run first: under AQE the final physical plan only exists
            # after execution (isFinalPlan=true)
            merged.collect()
            plan = merged._jdf.queryExecution().executedPlan().toString()
            got = _collect(finalize(merged, ["x"]))
        # the bucketed base scan feeds the join with its on-disk hash
        # layout: no Exchange anywhere on the base branch (the ":-"
        # child of the join); the delta side keeps its own aggregation
        # exchanges, which is the whole point — refresh cost is O(delta)
        assert "Bucketed: true" in plan, plan[:2000]
        base_branch = [ln for ln in plan.splitlines() if ln.lstrip().startswith(":")]
        assert base_branch and not any("Exchange" in ln for ln in base_branch), plan[:2000]
        # and the merge is still correct
        want = _collect(
            finalize(
                merge_partials(view, delta, ["k"], ["x"]), ["x"]
            )
        )
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
