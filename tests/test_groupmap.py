"""Parity tests for per_group_map vs groupBy().applyInPandas.

The default 10k-row Arrow batches mean ordinary tests only exercise the
single-batch path; these set spark.sql.execution.arrow.maxRecordsPerBatch
tiny so keys genuinely span batch boundaries, covering:
- one hot key spanning many batches (the O(B) buffered-slices path),
- a key ending exactly on a batch edge,
- multi-column keys,
- null keys (dropna=False parity with applyInPandas).

Kernels are built inside each test (closures) so cloudpickle ships them
by value — the test module itself is not importable on executors.
"""

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_market_survey_spark.operators.groupmap import per_group_map

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("t", LongType()),
        StructField("cum", DoubleType()),
    ]
)

SCHEMA2 = StructType(
    [
        StructField("k1", StringType()),
        StructField("k2", LongType()),
        StructField("t", LongType()),
        StructField("cum", DoubleType()),
    ]
)


def _make_kernel(key_names):
    import pandas as pd

    def kernel(g):
        g = g.sort_values("t", kind="mergesort")
        out = {k: g[k] for k in key_names}
        out["t"] = g["t"]
        out["cum"] = g["v"].astype("float64").cumsum()
        return pd.DataFrame(out)

    return kernel


@pytest.fixture()
def tiny_batches(spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "3")
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def _parity(df, keys, schema, kernel):
    nonefirst = lambda r: tuple((v is not None, v) for v in r)
    got = sorted(
        per_group_map(df, keys, schema, kernel, order_cols=("t",)).collect(),
        key=nonefirst,
    )
    want = sorted(
        df.groupBy(*keys).applyInPandas(kernel, schema).collect(),
        key=nonefirst,
    )
    assert got == want
    return got


def test_hot_key_spans_many_batches(spark, tiny_batches):
    # one key with 40 rows -> >13 three-row Arrow batches in one task
    rows = [("hot", t, float(t % 7)) for t in range(40)]
    rows += [("a", t, float(t)) for t in range(5)]
    df = spark.createDataFrame(rows, "k string, t long, v double").coalesce(1)
    got = _parity(df, ["k"], SCHEMA, _make_kernel(["k"]))
    assert len(got) == 45


def test_key_boundary_on_batch_edge(spark, tiny_batches):
    # group sizes multiples of the 3-row batch: boundaries land exactly
    # on batch edges, exercising the same_key flush in the all-one-key path
    rows = []
    for k, n in [("a", 3), ("b", 6), ("c", 3), ("d", 9)]:
        rows += [(k, t, 1.0 + t) for t in range(n)]
    df = spark.createDataFrame(rows, "k string, t long, v double").coalesce(1)
    _parity(df, ["k"], SCHEMA, _make_kernel(["k"]))


def test_multi_column_and_null_keys(spark, tiny_batches):
    rows = []
    for k1 in ["x", None, "y"]:
        for k2 in [1, None]:
            for t in range(7):
                rows.append((k1, k2, t, float(t)))
    df = spark.createDataFrame(
        rows, "k1 string, k2 long, t long, v double"
    ).coalesce(1)
    got = _parity(df, ["k1", "k2"], SCHEMA2, _make_kernel(["k1", "k2"]))
    assert len(got) == 42


def test_many_partitions_unchanged(spark, tiny_batches):
    # keys spread over several shuffle partitions still match
    rows = [
        (f"k{i % 11}", t, float((i * 7 + t) % 5))
        for i in range(66)
        for t in range(4)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    _parity(df, ["k"], SCHEMA, _make_kernel(["k"]))
