"""Table profiler + expectations (operators/profile): stat correctness
on a hand-built frame, the single-scan plan property, and each rule
kind's violation counting."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.profile import (
    check_expectations,
    profile_table,
)


def _df(spark):
    rows = [
        (1, "alpha", 10.0),
        (2, "beta", 20.0),
        (2, None, 30.0),
        (4, "gamma", None),
        (5, "alpha", 50.0),
    ]
    return spark.createDataFrame(rows, "k long, name string, v double")


class TestProfile:
    def test_stats(self, spark):
        prof = {r["column"]: r for r in profile_table(_df(spark)).collect()}
        assert set(prof) == {"k", "name", "v"}
        assert all(r["n_rows"] == 5 for r in prof.values())
        assert prof["name"]["n_null"] == 1 and prof["v"]["n_null"] == 1
        assert prof["k"]["n_distinct"] == 4  # countDistinct skips nothing here
        assert prof["name"]["n_distinct"] == 3  # nulls excluded
        assert prof["k"]["min_value"] == "1" and prof["k"]["max_value"] == "5"
        assert prof["v"]["avg_len"] is None
        assert abs(prof["name"]["avg_len"] - (5 + 4 + 5 + 5) / 4) < 1e-9

    def test_two_scan_split(self, spark, tmp_path):
        # exactly TWO scans by design: a plain min/max/null/len pass
        # over unexpanded rows + a fixed-width multi-distinct pass —
        # measured 4x faster than one mixed agg (SortAggregate trap)
        p = str(tmp_path / "t")
        _df(spark).write.parquet(p)
        df = spark.read.parquet(p)
        plan = (
            profile_table(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("FileScan parquet") == 2
        assert "Expand" in plan  # the multi-distinct strategy
        # the aggregate ABOVE the Expand (the x(2n+1)-row side) must be
        # hash-based — that's the point of the split; the plain pass may
        # stay SortAggregate (key=[] over unexpanded rows: no sort)
        head = plan[: plan.rindex("Expand")]
        assert head.rfind("HashAggregate") > head.rfind("SortAggregate")

    def test_column_subset(self, spark):
        out = profile_table(_df(spark), columns=["k"])
        assert [r["column"] for r in out.collect()] == ["k"]


class TestExpectations:
    def test_all_kinds(self, spark):
        res = {
            (r["rule"], r["column"]): (r["violations"], r["passed"])
            for r in check_expectations(
                _df(spark),
                [
                    {"kind": "not_null", "column": "name"},
                    {"kind": "unique", "columns": ["k"]},
                    {"kind": "in_range", "column": "v", "lo": 0, "hi": 25},
                    {"kind": "in_set", "column": "name",
                     "values": ["alpha", "beta"]},
                    {"kind": "matches", "column": "name", "pattern": "^[ab]"},
                ],
            ).collect()
        }
        assert res[("not_null", "name")] == (1, False)
        assert res[("unique", "k")] == (2, False)      # k=2 appears twice
        assert res[("in_range", "v")] == (2, False)    # 30 and 50 out of range
        assert res[("in_set", "name")] == (1, False)   # gamma
        assert res[("matches", "name")] == (1, False)  # gamma
        # nulls never count as violations for value rules
        clean = check_expectations(
            _df(spark).filter(F.col("k") == 1),
            [{"kind": "unique", "columns": ["k"]}],
        ).collect()[0]
        assert clean["violations"] == 0 and clean["passed"]

    def test_scalar_rules_fold_into_one_job(self, spark, monkeypatch):
        # N scalar rules must cost ONE aggregate job (one table scan),
        # plus one groupBy job per `unique` rule — twenty expectations
        # on a 100 TB table must not mean twenty full passes
        df = _df(spark)
        cls = type(df)  # the concrete (classic) DataFrame class
        agg_calls = []
        orig_agg = cls.agg

        def counting_agg(self, *exprs):
            agg_calls.append(len(exprs))
            return orig_agg(self, *exprs)

        monkeypatch.setattr(cls, "agg", counting_agg)
        rules = [
            {"kind": "not_null", "column": "name"},
            {"kind": "in_range", "column": "v", "lo": 0, "hi": 25},
            {"kind": "in_set", "column": "name", "values": ["alpha", "beta"]},
            {"kind": "matches", "column": "name", "pattern": "^[ab]"},
            {"kind": "not_null", "column": "v"},
            {"kind": "unique", "columns": ["k"]},
        ]
        res = check_expectations(df, rules)
        # one agg carrying ALL five scalar rules, plus the unique rule's
        # grouped count + its final coalesce-sum agg
        assert agg_calls[0] == 5, agg_calls
        scans = [n for n in agg_calls if n == 5]
        assert len(scans) == 1
        # ordering of the result rows still follows the rule list
        assert [r["rule"] for r in res.collect()] == [
            "not_null", "in_range", "in_set", "matches", "not_null", "unique"
        ]
