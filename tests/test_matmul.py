"""Distributed matmul (operators/matmul): sparse join-agg path vs tiled
Arrow-GEMM path vs numpy ground truth, including rectangular shapes not
divisible by the block size."""

import numpy as np
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.matmul import block_matmul, coo_matmul


def _to_coo(spark, m):
    rows = [
        (int(i), int(j), float(m[i, j]))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
        if m[i, j] != 0
    ]
    return spark.createDataFrame(rows, "row long, col long, val double")


def _from_df(df, shape):
    out = np.zeros(shape)
    for r in df.collect():
        out[r["row"], r["col"]] = r["val"]
    return out


def _rand(rng, shape, density=0.4):
    m = rng.integers(1, 9, size=shape).astype(float)
    m[rng.random(shape) > density] = 0.0
    return m


class TestMatmul:
    def test_paths_agree_and_match_numpy(self, spark):
        rng = np.random.default_rng(7)
        a = _rand(rng, (13, 9))   # deliberately not multiples of bs=4
        b = _rand(rng, (9, 11))
        truth = a @ b
        got_coo = _from_df(coo_matmul(_to_coo(spark, a), _to_coo(spark, b)),
                           truth.shape)
        got_blk = _from_df(
            block_matmul(_to_coo(spark, a), _to_coo(spark, b), bs=4),
            truth.shape,
        )
        np.testing.assert_allclose(got_coo, truth, rtol=0, atol=1e-9)
        np.testing.assert_allclose(got_blk, truth, rtol=0, atol=1e-9)

    def test_identity(self, spark):
        eye = np.eye(6)
        m = np.arange(36, dtype=float).reshape(6, 6) + 1
        got = _from_df(
            block_matmul(_to_coo(spark, eye), _to_coo(spark, m), bs=4), m.shape
        )
        np.testing.assert_allclose(got, m)

    def test_empty_side_yields_empty(self, spark):
        a = _to_coo(spark, np.ones((3, 3)))
        empty = spark.createDataFrame([], "row long, col long, val double")
        assert coo_matmul(a, empty).count() == 0
        assert block_matmul(a, empty, bs=2).count() == 0

    def test_block_join_is_on_inner_index(self, spark):
        # the block pairing must join on the shared inner block index —
        # never a cross join of all tiles
        rng = np.random.default_rng(3)
        a = _to_coo(spark, _rand(rng, (16, 16)))
        b = _to_coo(spark, _rand(rng, (16, 16)))
        plan = (
            block_matmul(a, b, bs=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
