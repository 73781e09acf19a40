

def test_inline_observation_metrics(spark):
    from pyspark.sql import functions as F

    from etl_market_survey_spark.operators.audit import with_inline_metrics

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id long, v string"
    )
    observed, obs = with_inline_metrics(
        df,
        "audit",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.sum(F.col("v").isNull().cast("long")),
            "max_id": F.max("id"),
        },
    )
    assert observed.count() == 3  # the consuming action
    got = obs.get
    assert got == {"n_rows": 3, "n_null_v": 2, "max_id": 3}
