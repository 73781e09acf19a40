

def test_coalesce_intervals_touch_and_gap(spark):
    from etl_market_survey_spark.operators.intervals import coalesce_intervals

    rows = [
        # key 1: [0,10] + [10,20] touch -> one island; [25,30] separate
        (1, 0, 10), (1, 10, 20), (1, 25, 30),
        # key 2: containment [0,100] swallows [5,8]; [101,102] separate
        (2, 0, 100), (2, 5, 8), (2, 101, 102),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        (r["k"], r["island_id"]): (r["start"], r["end"], r["n_merged"])
        for r in coalesce_intervals(df, "k", "s", "e").collect()
    }
    assert got == {
        (1, 0): (0, 20, 2),
        (1, 1): (25, 30, 1),
        (2, 0): (0, 100, 2),
        (2, 1): (101, 102, 1),
    }
