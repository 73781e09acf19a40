"""Round-4 late additions: HITS (q296), winnowing (q300), DTW (q305),
multi-bin Goertzel (q304). Gates cover the corpus paths; units pin the
algorithmic contracts on known inputs."""

import numpy as np
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.dtw import (
    INF,
    dtw_band_asymmetric,
)
from etl_market_survey_spark.operators.hits import UNIT, hits_fixed_point
from etl_market_survey_spark.operators.winnowing import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)


def _brute_dtw(a, b, r):
    """Enumerate every asymmetric-step path (moves (1,0),(1,1),(1,2))
    from (1,1) to (n,n) inside the band; cost = sum |a_i - b_j| over
    visited cells."""
    n = len(a)
    best = [INF]

    def rec(i, j, cost):
        if abs(i - j) > r or j > n:
            return
        cost += abs(a[i - 1] - b[j - 1])
        if i == n:
            if j == n and cost < best[0]:
                best[0] = cost
            return
        for dj in (0, 1, 2):
            rec(i + 1, j + dj, cost)

    rec(1, 1, 0)
    return best[0]


def test_dtw_matches_brute_force():
    rng = np.random.RandomState(7)
    for _ in range(10):
        n = 6
        a = rng.randint(0, 50, size=n).astype(np.int64)
        b = rng.randint(0, 50, size=n).astype(np.int64)
        for r in (1, 2, 5):
            assert dtw_band_asymmetric(a, b, r) == _brute_dtw(
                a.tolist(), b.tolist(), r
            )


def test_dtw_identical_series_zero():
    a = np.array([3, 1, 4, 1, 5, 9], dtype=np.int64)
    assert dtw_band_asymmetric(a, a, r=2) == 0


def test_dtw_shift_cheaper_than_l1():
    # a shifted copy: warping should beat the rigid elementwise distance
    a = np.array([0, 0, 10, 20, 10, 0, 0, 0], dtype=np.int64)
    b = np.array([0, 0, 0, 10, 20, 10, 0, 0], dtype=np.int64)
    l1 = int(np.abs(a - b).sum())
    assert dtw_band_asymmetric(a, b, r=3) < l1


def test_winnowing_shared_run_guarantee(spark):
    # two docs sharing a run of >= w + k - 1 tokens must share >= 1
    # fingerprint (the winnowing guarantee, Schleimer et al. 2003)
    k, w = 3, 4
    run = "alpha beta gamma delta epsilon zeta eta"  # 7 = w + k tokens
    docs = spark.createDataFrame(
        [
            (1, "one two three " + run + " four five six"),
            (2, "seven eight " + run + " nine ten eleven twelve"),
            (3, "unrelated words only here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=k, w=w)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in shared_fingerprint_pairs(fps, min_shared=1, max_df=50).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_density(spark):
    # fingerprints are a strict subsample of the gram positions
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i % 17}" for i in range(60)))],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).collect()
    n_grams = 60 - 3 + 1
    assert 0 < len(fps) < n_grams


def test_hits_star_graph(spark):
    # customers 1..4 all point at supplier 100; 4 also points at 200.
    edges = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (4, 200)],
        "src long, dst long",
    )
    out = {
        (r["kind"], r["node"]): r["score"]
        for r in hits_fixed_point(edges, n_iter=2).collect()
    }
    # the shared supplier dominates authority
    assert out[("authority", 100)] > 3 * out[("authority", 200)]
    # each side's L1 mass is ~UNIT (minus floor noise)
    for kind in ("hub", "authority"):
        total = sum(v for (kd, _), v in out.items() if kd == kind)
        assert abs(total - UNIT) <= 10


def test_filterbank_matches_single_bin(spark):
    from etl_market_survey_spark.operators.dsp import (
        audio_filterbank_powers,
        audio_tone_features,
    )

    n = 64
    rows = []
    for i in range(n):
        v = 1000 if (i // 4) % 2 == 0 else -1000  # period 8 -> bin 8
        rows.append(("c", i, v))
    df = spark.createDataFrame(rows, "key string, n long, x long")
    multi = df.withColumn("k", F.explode(F.expr("array(4, 8)")))
    got = {
        r["k"]: r["power"]
        for r in audio_filterbank_powers(
            multi, ["key"], "x", "n", "k", n
        ).collect()
    }
    single = audio_tone_features(df, ["key"], "x", "n", 8, n).collect()[0][
        "goertzel_power"
    ]
    assert got[8] == single
    assert got[8] > 10 * got[4]


def test_skyline_matches_brute_force(spark):
    import random

    from etl_market_survey_spark.operators.skyline import skyline2

    rng = random.Random(11)
    pts = [(i, rng.randint(0, 40), rng.randint(0, 40)) for i in range(80)]

    def dominated(a, b):  # b dominates a
        return b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])

    truth = {
        p[0] for p in pts if not any(dominated(p, q) for q in pts if q != p)
    }
    df = spark.createDataFrame(pts, "id long, x long, y long")
    for grid in (2, 4, 16):
        got = {r["id"] for r in skyline2(df, "x", "y", grid=grid).collect()}
        assert got == truth, grid


def test_resize_bilinear_matches_numpy(spark):
    from etl_market_survey_spark.operators.imageops import resize_bilinear_int

    rng = np.random.RandomState(3)
    img = rng.randint(-1000, 1000, size=(8, 8)).astype(np.int64)
    rows = [
        (1, y, x, int(img[y, x])) for y in range(8) for x in range(8)
    ]
    df = spark.createDataFrame(rows, "id long, y long, x long, g long")
    h_out = w_out = 11
    got = {
        (r["r"], r["c"]): r["val_scaled"]
        for r in resize_bilinear_int(df, 8, 8, h_out, w_out).collect()
    }
    qy = qx = h_out - 1
    for r in range(h_out):
        for c in range(w_out):
            y0, fy = divmod(r * 7, qy)
            x0, fx = divmod(c * 7, qx)
            y1, x1 = min(y0 + 1, 7), min(x0 + 1, 7)
            want = (
                (qy - fy) * (qx - fx) * img[y0, x0]
                + (qy - fy) * fx * img[y0, x1]
                + fy * (qx - fx) * img[y1, x0]
                + fy * fx * img[y1, x1]
            )
            assert got[(r, c)] == want, (r, c)
    # corners are exact copies (align-corners contract)
    assert got[(0, 0)] == qy * qx * img[0, 0]
    assert got[(10, 10)] == qy * qx * img[7, 7]


def test_canonical_url_rules(spark):
    from etl_market_survey_spark.functions.urls import canonical_url

    cases = [
        ("HTTPS://Example.COM:443/a/b/?b=2&a=1&utm_source=x#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("http://host.com:8080/p?x=1", "http://host.com:8080/p?x=1"),
        ("http://host.com:80/", "http://host.com/"),
        ("https://h.io/path/?utm_campaign=z&gclid=1", "https://h.io/path"),
        ("https://h.io", "https://h.io/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)
