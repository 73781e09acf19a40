"""Bitext margin mining (operators/bitext.py — VERDICT r4 item 2).

The DuckDB oracle gate covers q326 (exact mode) and q353 (banded-SRP
ANN, replayed candidate set) bit-for-bit; these units pin the operator
itself: exact-mode parity with a numpy brute force, the candidate-stage
contract (ANN candidate volume strictly below all-pairs), and the
threshold/mutuality invariants every mode must satisfy.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.bitext import bitext_margin_mine

SPLIT = 25
K = 4
M = 1.05


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )
    return df


def _numpy_mine(rows, split=SPLIT, k=K, m=M):
    """Driver-side brute force on the same integer grid."""
    ids = np.array([r["vec_id"] for r in rows])
    G = np.array(
        [np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6) for r in rows],
        dtype=np.int64,
    )
    sx, tx = ids < split, ids >= split
    xs, ys = ids[sx], ids[tx]
    D = G[sx] @ G[tx].T  # (|src|, |tgt|) int64
    out = []
    for i, x in enumerate(xs):
        j = np.lexsort((ys, -D[i]))[0]
        # mutual argmax (ties by partner id asc)
        i2 = np.lexsort((xs, -D[:, j]))[0]
        if i2 != i:
            continue
        ax = np.sort(D[i])[::-1][:k].sum() / k
        ay = np.sort(D[:, j])[::-1][:k].sum() / k
        margin = 2.0 * float(D[i, j]) / (ax + ay)
        if margin >= m:
            out.append((int(x), int(ys[j]), round(margin, 9)))
    return sorted(out)


def test_exact_mode_matches_numpy(spark, emb):
    rows = emb.collect()
    expected = _numpy_mine(rows)
    got = bitext_margin_mine(
        emb.filter(F.col("vec_id") < SPLIT),
        emb.filter(F.col("vec_id") >= SPLIT),
        k=K, margin_threshold=M, method="ivf", n_cells=4, nprobe=None,
    ).collect()
    got = sorted((r["src_id"], r["tgt_id"], r["margin"]) for r in got)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expected]
    for (_, _, g), (_, _, e) in zip(got, expected):
        assert math.isclose(g, e, rel_tol=0, abs_tol=1e-9)


def test_ann_candidate_volume_below_all_pairs(spark, emb):
    """The point of the r5 rewrite: nprobe < n_cells must generate
    strictly fewer candidate pairs than |src| x |tgt|."""
    from etl_market_survey_spark.operators.bitext import (
        _grid,
        _ivf_candidates,
        _srp_candidates,
        _to_double,
    )

    src = emb.filter(F.col("vec_id") < SPLIT)
    tgt = emb.filter(F.col("vec_id") >= SPLIT)
    sv = src.select(
        F.col("vec_id").alias("x"), _grid(F.col("embedding")).alias("gx"),
        _to_double(F.col("embedding")).alias("_xv"),
    )
    tv = tgt.select(
        F.col("vec_id").alias("y"), _grid(F.col("embedding")).alias("gy"),
        _to_double(F.col("embedding")).alias("_yv"),
    )
    n_all = src.count() * tgt.count()
    pool = src.select("embedding").unionByName(tgt.select("embedding"))
    n_ivf = _ivf_candidates(sv, tv, pool, "embedding", 8, 2, 42).count()
    n_srp = _srp_candidates(sv, tv, 16, 4, 42).count()
    assert 0 < n_ivf < n_all
    assert 0 < n_srp < n_all
    # exact mode generates every pair exactly once
    exact = _ivf_candidates(sv, tv, pool, "embedding", 4, 4, 42)
    assert exact.count() == n_all
    assert exact.distinct().count() == n_all


@pytest.mark.parametrize("kwargs", [
    dict(method="ivf", n_cells=8, nprobe=2),
    dict(method="srp", n_planes=16, n_bands=4),
])
def test_ann_modes_respect_threshold_and_mutuality(spark, emb, kwargs):
    got = bitext_margin_mine(
        emb.filter(F.col("vec_id") < SPLIT),
        emb.filter(F.col("vec_id") >= SPLIT),
        k=K, margin_threshold=M, **kwargs,
    ).collect()
    assert got, "ANN mode mined nothing at toy scale"
    assert all(r["margin"] >= M for r in got)
    # mutual argmax => each src_id and each tgt_id appears at most once
    srcs = [r["src_id"] for r in got]
    tgts = [r["tgt_id"] for r in got]
    assert len(srcs) == len(set(srcs))
    assert len(tgts) == len(set(tgts))
