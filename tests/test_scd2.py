"""SCD Type-2 history (operators/merge.scd2_apply / scd2_as_of):
version intervals, idempotent replay, incremental == full rebuild, and
as-of reads."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.merge import scd2_apply, scd2_as_of

EOT = 2**62


def _hist_rows(df):
    return {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


class TestScd2:
    def _obs(self, spark, rows):
        return spark.createDataFrame(rows, "k long, seg string, ts long")

    def test_versions_and_current_flag(self, spark):
        obs = self._obs(
            spark,
            [(1, "bronze", 10), (1, "silver", 20), (1, "gold", 30), (2, "bronze", 15)],
        )
        hist = scd2_apply(None, obs, ["k"], ["seg"], "ts")
        assert _hist_rows(hist) == {
            (1, "bronze", 10, 20, False),
            (1, "silver", 20, 30, False),
            (1, "gold", 30, EOT, True),
            (2, "bronze", 15, EOT, True),
        }

    def test_duplicate_observations_collapse(self, spark):
        obs = self._obs(
            spark,
            [(1, "a", 10), (1, "a", 12), (1, "a", 14), (1, "b", 20), (1, "b", 25)],
        )
        hist = scd2_apply(None, obs, ["k"], ["seg"], "ts")
        assert _hist_rows(hist) == {
            (1, "a", 10, 20, False),
            (1, "b", 20, EOT, True),
        }

    def test_incremental_equals_full_rebuild(self, spark):
        first = self._obs(spark, [(1, "a", 10), (2, "x", 10)])
        later = self._obs(spark, [(1, "b", 20), (2, "x", 30), (3, "z", 25)])
        hist1 = scd2_apply(None, first, ["k"], ["seg"], "ts")
        incr = scd2_apply(hist1, later, ["k"], ["seg"], "ts")
        full = scd2_apply(
            None, first.unionByName(later), ["k"], ["seg"], "ts"
        )
        assert _hist_rows(incr) == _hist_rows(full)
        # the unchanged re-observation of (2, 'x') opened no new version
        assert incr.filter("k = 2").count() == 1

    def test_as_of_reads(self, spark):
        obs = self._obs(
            spark, [(1, "a", 10), (1, "b", 20), (1, "c", 30)]
        )
        hist = scd2_apply(None, obs, ["k"], ["seg"], "ts")
        assert [r["seg"] for r in scd2_as_of(hist, 25).collect()] == ["b"]
        assert [r["seg"] for r in scd2_as_of(hist, 10).collect()] == ["a"]
        assert scd2_as_of(hist, 5).count() == 0  # before first version
        assert [r["seg"] for r in scd2_as_of(hist, 10**9).collect()] == ["c"]

    def test_no_single_partition_exchange(self, spark):
        obs = self._obs(spark, [(i, "s", 10) for i in range(100)])
        plan = (
            scd2_apply(None, obs, ["k"], ["seg"], "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" not in plan  # windows are per-key only
