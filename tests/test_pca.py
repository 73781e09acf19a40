"""PCA: exact covariance, axis recovery, JVM-side projection; and
temperature-scaled mixture weights."""

import math
import random

import pytest

from etl_market_survey_spark.operators.mixing import temperature_weights
from etl_market_survey_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
)


def _aniso(spark, n=300, seed=5):
    # dominant variance along (1,1,0)/sqrt(2), tiny elsewhere
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        t = rng.gauss(0, 3.0)
        rows.append(
            (
                i,
                [
                    t / math.sqrt(2) + rng.gauss(0, 0.1),
                    t / math.sqrt(2) + rng.gauss(0, 0.1),
                    rng.gauss(0, 0.1),
                ],
            )
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_covariance_matches_numpy(spark):
    import numpy as np

    df = _aniso(spark, n=100)
    X = np.array([r.embedding for r in df.collect()])
    want = np.cov(X, rowvar=False)
    got = {(r.i, r.j): r.cov for r in covariance_matrix(df, "embedding", 3).collect()}
    for i in range(3):
        for j in range(i, 3):
            # dsum quantizes moments to the 1e-6 grid -> not bit-equal to
            # numpy, but far inside 1e-3 for O(1)-scale data
            assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-3)


def test_pca_recovers_dominant_axis(spark):
    df = _aniso(spark)
    vals, comps = pca_fit(df, "embedding", 3, 2)
    v = comps[0]
    align = abs(v[0] / math.sqrt(2) + v[1] / math.sqrt(2))
    assert align > 0.99, (vals, comps)
    assert vals[0] > 10 * vals[1]


def test_projection_matches_driver_dot(spark):
    df = _aniso(spark, n=50)
    _, comps = pca_fit(df, "embedding", 3, 2)
    out = {r.vec_id: (r.embedding, r.pc) for r in pca_project(df, "embedding", comps).collect()}
    for vid, (emb, pc) in out.items():
        for k in range(2):
            want = sum(x * w for x, w in zip(emb, comps[k]))
            assert pc[k] == pytest.approx(want, rel=1e-12)


def test_temperature_weights_flatten_and_sharpen():
    w = {"a": 8.0, "b": 2.0}
    flat = temperature_weights(w, 4.0)
    sharp = temperature_weights(w, 0.5)
    assert flat["a"] / flat["b"] < 4.0 / 2.0 < sharp["a"] / sharp["b"]
    ident = temperature_weights(w, 1.0)
    assert ident == w
    with pytest.raises(ValueError):
        temperature_weights(w, 0.0)


def test_auc_matches_sklearn_formula(spark):
    """AUC on a hand-checkable set incl. ties."""
    from etl_market_survey_spark.operators.evalmetrics import auc_mann_whitney
    from pyspark.sql import functions as F

    rows = [  # (score, label): perfect separation -> 1.0
        (0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1),
    ]
    df = spark.createDataFrame([(s, l, "g") for s, l in rows], "s double, y int, g string")
    out = auc_mann_whitney(df, ["g"], "s", "y").collect()[0]
    assert out.auc == 1.0 and out.n == 4 and out.n_pos == 2

    # ties: scores all equal -> AUC 0.5 exactly (average ranks)
    df2 = spark.createDataFrame(
        [(0.5, l, "g") for l in (0, 1, 0, 1)], "s double, y int, g string"
    )
    assert auc_mann_whitney(df2, ["g"], "s", "y").collect()[0].auc == 0.5

    # mixed, verified by hand: scores .1(-) .4(+) .4(-) .9(+)
    # pairs: (+ > -): (.4+ vs .1)=1, (.4+ vs .4-)=0.5, (.9 vs .1)=1, (.9 vs .4-)=1
    # AUC = 3.5/4
    df3 = spark.createDataFrame(
        [(0.1, 0, "g"), (0.4, 1, "g"), (0.4, 0, "g"), (0.9, 1, "g")],
        "s double, y int, g string",
    )
    assert auc_mann_whitney(df3, ["g"], "s", "y").collect()[0].auc == 3.5 / 4


def test_auc_degenerate_single_class_is_nan(spark):
    import math

    from etl_market_survey_spark.operators.evalmetrics import auc_mann_whitney

    df = spark.createDataFrame(
        [(0.1, 1, "g"), (0.9, 1, "g")], "s double, y int, g string"
    )
    out = auc_mann_whitney(df, ["g"], "s", "y").collect()[0]
    # no negatives -> NULL, never a fabricated number
    assert out.auc is None


def test_dbscan_all_noise_when_sparse(spark):
    from etl_market_survey_spark.operators.dbscan import dbscan_star

    # four far-apart points, min_pts=2 -> nobody is core
    df = spark.createDataFrame(
        [(i, [float(i) * 100.0, 0.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    out = dbscan_star(df, "vec_id", "embedding", eps2_scaled=int(1e12), min_pts=2).collect()
    assert all((not r.is_core) and r.cluster is None for r in out)


def test_dbscan_min_pts_one_isolated_point_is_core(spark):
    """ADVICE r2: with min_pts=1 the self-count makes every point core —
    including points with zero eps-neighbors, which the old pair-derived
    degree table silently dropped. Spark and the DuckDB mirror agree."""
    import duckdb

    from etl_market_survey_spark.operators.dbscan import (
        dbscan_star,
        sql_dbscan_star,
    )

    pts = [(1, [0.0, 0.0]), (2, [0.01, 0.0]), (3, [999.0, 0.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: (r.is_core, r.cluster)
        for r in dbscan_star(df, "vec_id", "embedding", int(1e12), 1).collect()
    }
    assert out[3] == (True, 3)  # isolated point: core, own singleton cluster
    assert out[1] == (True, 1) and out[2] == (True, 1)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", pts)
    sql = sql_dbscan_star("t", "vec_id", "embedding", 2, int(1e12), 1)
    oracle = {
        vid: (bool(core), cl) for vid, core, cl in con.execute(sql).fetchall()
    }
    assert oracle == out


def test_dbscan_two_blobs_two_clusters(spark):
    from etl_market_survey_spark.operators.dbscan import dbscan_star

    pts = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (10 + i, [50.0 + 0.01 * i, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = dbscan_star(df, "vec_id", "embedding", eps2_scaled=int(1e12), min_pts=3).collect()
    clusters = {r.vec_id: r.cluster for r in out}
    assert all(r.is_core for r in out)
    assert len({clusters[i] for i in range(5)}) == 1
    assert len({clusters[10 + i] for i in range(5)}) == 1
    assert clusters[0] != clusters[10]


def test_dbscan_blocked_matches_exact(spark):
    import random

    from etl_market_survey_spark.operators.dbscan import (
        dbscan_star,
        dbscan_star_blocked,
    )

    rng = random.Random(21)
    pts = []
    for i in range(60):
        cx = [(1.0, 0.0), (0.0, 1.0), (-1.0, 0.2)][i % 3]
        pts.append(
            (i, [cx[0] + rng.uniform(-0.05, 0.05), cx[1] + rng.uniform(-0.05, 0.05)])
        )
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    eps2 = int(0.05 * 1e12)
    exact = {
        (r.vec_id, r.is_core, r.cluster)
        for r in dbscan_star(df, "vec_id", "embedding", eps2, 3).collect()
    }
    # full-probe blocked run must EQUAL the exact baseline
    full = {
        (r.vec_id, r.is_core, r.cluster)
        for r in dbscan_star_blocked(
            df, "vec_id", "embedding", eps2, 3, n_cells=4, nprobe=4
        ).collect()
    }
    assert full == exact
    # small-probe run on well-separated blobs also recovers it
    blocked = {
        (r.vec_id, r.is_core, r.cluster)
        for r in dbscan_star_blocked(
            df, "vec_id", "embedding", eps2, 3, n_cells=4, nprobe=2
        ).collect()
    }
    assert blocked == exact
