"""Streaming A-ES reservoir: the drained stream's per-group reservoir is
bit-identical to the batch weighted_sample_k over the same rows."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.sampling import weighted_sample_k
from etl_market_survey_spark.streaming.events import EVENT_SCHEMA
from etl_market_survey_spark.streaming.reservoir import weighted_reservoir_stream

_K = 7


def test_streaming_reservoir_matches_batch(spark, sf_dir, tmp_path):
    from etl_market_survey_spark.sources.readers import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet").filter(F.col("value") > 0)
    # three files -> three micro-batches, split unevenly on purpose
    for i, cond in enumerate(
        [F.col("event_id") % 4 == 0, F.col("event_id") % 4 == 1, F.col("event_id") % 4 >= 2]
    ):
        ev.filter(cond).write.parquet(str(tmp_path / "in" / f"{i}.parquet"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
        .filter(F.col("value") > 0)
    )
    q = (
        weighted_reservoir_stream(
            stream, _K, "value", ["event_id"], seed=11, by=["event_type"]
        )
        .writeStream.format("memory")
        .queryName("t_reservoir")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    # latest emission per group = rows tagged with that group's max n_seen
    final = spark.sql(
        """SELECT grp, id, es_key, es_rank FROM (
             SELECT *, max(n_seen) OVER (PARTITION BY grp) AS last_seen
             FROM t_reservoir) WHERE n_seen = last_seen"""
    ).collect()
    got = {(r["grp"], r["es_rank"]): (r["id"], r["es_key"]) for r in final}

    batch = weighted_sample_k(
        ev, _K, "value", ["event_id"], seed=11, by=["event_type"]
    ).collect()
    want = {
        (r["event_type"], r["es_rank"]): str(r["event_id"]) for r in batch
    }

    assert set(g for g, _ in got) == set(g for g, _ in want)
    assert len(got) == len(want)
    for gk, (id_, _key) in got.items():
        assert want[gk] == id_, gk

    # n_seen totals: every input row was offered to its group's reservoir
    totals = {
        r["grp"]: r["m"]
        for r in spark.sql(
            "SELECT grp, max(n_seen) AS m FROM t_reservoir GROUP BY grp"
        ).collect()
    }
    counts = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert totals == counts
