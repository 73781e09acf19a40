"""Schema evolution on the columnar store: mergeSchema reads across
generations of a dataset directory (the add-a-column migration every
long-lived 100 TB table goes through)."""

from pyspark.sql import functions as F


def test_merge_schema_unions_generations(spark, tmp_path):
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, value double"
    )
    v1.write.parquet(base + "/gen=1")
    v2 = spark.createDataFrame(
        [(3, 30.0, "c")], "id long, value double, label string"
    )
    v2.write.parquet(base + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert sorted(merged.columns) == ["gen", "id", "label", "value"]
    rows = {r.id: (r.value, r.label) for r in merged.collect()}
    # old-generation rows surface the new column as NULL, not an error
    assert rows[1] == (10.0, None) and rows[3] == (30.0, "c")
    # predicate on the evolved column still pushes down cleanly
    assert merged.filter(F.col("label").isNotNull()).count() == 1


def test_without_merge_schema_first_footer_wins(spark, tmp_path):
    base = str(tmp_path / "plain")
    spark.createDataFrame([(1,)], "id long").write.parquet(base + "/gen=1")
    spark.createDataFrame([(2, "x")], "id long, extra string").write.parquet(
        base + "/gen=2"
    )
    cols = set(spark.read.parquet(base).columns)
    # without the option Spark picks one footer's schema — the evolved
    # column may be absent; the test pins the contract that mergeSchema
    # is REQUIRED for generation-spanning reads
    assert "id" in cols and "gen" in cols
