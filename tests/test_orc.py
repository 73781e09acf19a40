"""ORC source/sink (sources/readers.read_orc, writers.write_orc):
round-trip, partition layout, filter pushdown to the ORC scan, and the
ts normalization contract shared with the parquet reader."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.sources.readers import read_avro, read_orc
from etl_market_survey_spark.sources.writers import write_orc


class TestOrc:
    def test_round_trip(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = spark.range(50).select("id", (F.col("id") % 5).alias("g"),
                                    (F.col("id") * 1.5).alias("v"))
        write_orc(df, p)
        back = read_orc(spark, p)
        assert back.count() == 50
        assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 1.5 for i in range(50))

    def test_partitioned_layout_prunes(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = spark.range(40).select("id", (F.col("id") % 4).alias("g"))
        write_orc(df, p, partition_by="g")
        back = read_orc(spark, p).filter(F.col("g") == 2)
        plan = back._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [")[1].split("]")[0]
        assert "g" in pf and "2" in pf  # pruning pushed to partition level
        assert back.count() == 10

    def test_filter_pushdown_reaches_scan(self, spark, tmp_path):
        p = str(tmp_path / "t")
        write_orc(spark.range(100).select("id"), p)
        plan = (
            read_orc(spark, p)
            .filter(F.col("id") == 7)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]

    def test_ts_normalized_like_parquet(self, spark, tmp_path):
        p = str(tmp_path / "t")
        df = spark.sql(
            "SELECT TIMESTAMP'2024-01-02 03:04:05' AS ts, 1 AS x"
        )
        df.write.mode("overwrite").orc(p)
        back = read_orc(spark, p)
        assert dict(back.dtypes)["ts"] == "bigint"  # epoch-nano contract

    def test_avro_gate_message(self, spark, tmp_path):
        with pytest.raises((ImportError, Exception)) as ei:
            read_avro(spark, str(tmp_path / "nope"))
        # either the jar is present (path error) or the gate fired
        assert ei.value is not None
