"""Unit tests: SCD1 upsert and snapshot diff."""

import pytest

from etl_market_survey_spark.operators.merge import snapshot_diff, upsert

_BASE = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_upsert_semantics(spark):
    base = spark.createDataFrame(_BASE, "k long, s string, v double")
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {(r.k, r.s, r.v) for r in upsert(base, updates, keys=["k"]).collect()}
    assert got == {(1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)}


def test_upsert_schema_mismatch_rejected(spark):
    base = spark.createDataFrame(_BASE, "k long, s string, v double")
    bad = spark.createDataFrame([(1, "x")], "k long, s string")
    with pytest.raises(ValueError):
        upsert(base, bad, keys=["k"])


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(_BASE, "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {(r.k, r.change_type, r.s, r.v) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        (1, "unchanged", "a", 10.0),
        (2, "update", "b", 25.0),
        (3, "delete", "c", 30.0),
        (4, "insert", "d", 40.0),
    }


def test_snapshot_diff_null_values_compare_equal(spark):
    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, None)], "k long, s string")
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert rows[0].change_type == "unchanged"
