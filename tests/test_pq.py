"""Product quantization: ADC-equals-exact property when codebooks hold
the true subvectors, LUT arithmetic, trained-codebook recall on
clustered data, tie determinism."""

import random

import numpy as np

from etl_market_survey_spark.operators.pq import (
    adc_lut,
    adc_topk,
    assign_codes,
    train_pq_codebooks,
)


def _vecs(rng, n, dim, centers=None):
    if centers is None:
        return [[rng.uniform(-0.5, 0.5) for _ in range(dim)] for _ in range(n)]
    out = []
    for i in range(n):
        c = centers[i % len(centers)]
        out.append([v + rng.gauss(0, 0.02) for v in c])
    return out


def test_adc_exact_when_codebooks_hold_subvectors(spark):
    # k >= n distinct subvectors per subspace -> each vector's code points
    # at its own quantized subvector -> ADC == exact integer L2. Proves
    # the assignment + LUT chain end to end against numpy.
    rng = random.Random(5)
    dim, m, n = 8, 2, 6
    vecs = _vecs(rng, n, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    Xq = np.floor(np.asarray(vecs, dtype=np.float32).astype(np.float64) * 1000.0)
    dsub = dim // m
    books = [
        [[int(x) for x in Xq[i, j * dsub : (j + 1) * dsub]] for i in range(n)]
        for j in range(m)
    ]
    codes = assign_codes(df, "vec_id", "embedding", books, dim)
    q = [int(v) for v in Xq[0]]
    got = {
        (r.vec_id, r.adc_dist)
        for r in adc_topk(codes, [(0, q)], books, k=n).collect()
    }
    want = {
        (i, int(((Xq[i] - Xq[0]) ** 2).sum())) for i in range(n)
    }
    assert got == want


def test_adc_lut_matches_definition():
    books = [[[1, 2], [3, 4]], [[0, 0], [10, -10]]]
    lut = adc_lut([1, 2, 5, 5], books)
    assert lut == [[0, 8], [50, 250]]


def test_code_tie_breaks_to_lowest_index(spark):
    df = spark.createDataFrame(
        [(0, [0.001, 0.001])], "vec_id long, embedding array<float>"
    )
    # two identical codebook entries -> equidistant -> code must be 0
    books = [[[7, 7], [7, 7], [1, 1]]]
    row = assign_codes(df, "vec_id", "embedding", books, 2).collect()[0]
    assert row.code_0 == 2  # nearest is [1,1]
    books_tie = [[[5, 5], [5, 5]]]
    row = assign_codes(df, "vec_id", "embedding", books_tie, 2).collect()[0]
    assert row.code_0 == 0


def test_trained_recall_on_clustered_data(spark):
    rng = random.Random(11)
    dim, m, k = 16, 4, 8
    centers = [[rng.uniform(-0.4, 0.4) for _ in range(dim)] for _ in range(5)]
    vecs = _vecs(rng, 200, dim, centers)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    books = train_pq_codebooks(df, "embedding", m, k, seed=3)
    codes = assign_codes(df, "vec_id", "embedding", books, dim)
    Xq = np.floor(np.asarray(vecs, dtype=np.float32).astype(np.float64) * 1000.0)
    q = [int(v) for v in Xq[17]]
    got = [r.vec_id for r in adc_topk(codes, [(0, q)], books, k=10).collect()]
    exact = np.argsort(((Xq - Xq[17]) ** 2).sum(axis=1), kind="stable")[:10]
    # PQ is lossy; on well-clustered data trained codebooks should still
    # recover most of the true top-10
    assert len(set(got) & set(int(i) for i in exact)) >= 5


def test_arrow_and_expr_impls_identical(spark):
    rng = random.Random(99)
    dim, m, k = 16, 4, 8
    vecs = _vecs(rng, 80, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    books = [
        [[rng.randint(-500, 500) for _ in range(dim // m)] for _ in range(k)]
        for _ in range(m)
    ]
    a = sorted(
        tuple(r) for r in assign_codes(df, "vec_id", "embedding", books, dim, impl="arrow").collect()
    )
    e = sorted(
        tuple(r) for r in assign_codes(df, "vec_id", "embedding", books, dim, impl="expr").collect()
    )
    assert a == e


def test_ivf_pq_full_probe_equals_plain_adc(spark):
    from etl_market_survey_spark.operators.pq import cell_of, ivf_pq_topk

    rng = random.Random(41)
    dim, m, k, ncells = 8, 2, 4, 3
    vecs = _vecs(rng, 60, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    books = [
        [[rng.randint(-400, 400) for _ in range(dim // m)] for _ in range(k)]
        for _ in range(m)
    ]
    cents = [[rng.randint(-300, 300) for _ in range(dim)] for _ in range(ncells)]
    codes = assign_codes(df, "vec_id", "embedding", books, dim)
    cells = assign_codes(df, "vec_id", "embedding", [cents], dim).withColumnRenamed(
        "code_0", "cell"
    )
    index = codes.join(cells, "vec_id")
    queries = [(0, [rng.randint(-400, 400) for _ in range(dim)])]
    full = sorted(
        (r.query_id, r.vec_id, r.adc_dist)
        for r in ivf_pq_topk(index, queries, books, cents, ncells, 10).collect()
    )
    plain = sorted(
        (r.query_id, r.vec_id, r.adc_dist)
        for r in adc_topk(codes, queries, books, 10).collect()
    )
    assert full == plain  # nprobe = all cells -> IVF prunes nothing

    # nprobe monotonicity: results are always drawn from probed cells,
    # and growing nprobe only adds candidates (each vec's ADC is fixed)
    n1 = {r.vec_id for r in ivf_pq_topk(index, queries, books, cents, 1, 60).collect()}
    n2 = {r.vec_id for r in ivf_pq_topk(index, queries, books, cents, 2, 60).collect()}
    assert n1 <= n2
    probe1 = cell_of(queries[0][1], cents)[:1]
    in_cell = {r.vec_id for r in index.filter(index.cell.isin(probe1)).collect()}
    assert n1 == in_cell  # k large enough -> exactly the probed cell


def test_rotation_matches_python_and_is_near_orthonormal(spark):
    import numpy as np

    from etl_market_survey_spark.operators.opq import (
        rotate_query,
        rotated_vec,
        rotation_blocks,
    )

    blocks = rotation_blocks(4, 16, seed=9)
    for b in blocks:
        m = np.array(b)
        assert np.abs(m @ m.T - np.eye(16)).max() < 1e-5  # rounded QR
    rng = random.Random(5)
    vec = [rng.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    got = df.select(rotated_vec("embedding", blocks).alias("r")).collect()[0]["r"]
    # Python replica must match the engine expression bit-for-bit,
    # including the float32 storage round-trip
    f32 = [float(np.float32(v)) for v in vec]
    want = rotate_query(f32, blocks)
    assert got == want


def test_rotate_rows_bit_identical_to_expression_fold():
    """The vectorized kernel rotation (opq.rotate_rows) must reproduce
    the Python/SQL left fold bit-for-bit — it is the serving-path twin
    that keeps the coefficients out of generated code."""
    import numpy as np

    from etl_market_survey_spark.operators.opq import (
        rotate_query,
        rotate_rows,
        rotation_blocks,
    )

    blocks = rotation_blocks(4, 16, seed=154)
    rng = random.Random(11)
    X = np.array(
        [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(50)],
        dtype=np.float32,
    ).astype(np.float64)
    got = rotate_rows(X, blocks)
    for r in range(X.shape[0]):
        want = rotate_query([float(v) for v in X[r]], blocks)
        assert [v for v in got[r]] == want  # exact, not allclose


def test_assign_codes_rotated_matches_expression_rotation(spark):
    """rotate_blocks fused into the Arrow kernel == rotated_vec
    expression feeding the same codebooks (code-for-code)."""
    from etl_market_survey_spark.operators.opq import (
        rotated_vec,
        rotation_blocks,
    )
    from etl_market_survey_spark.operators.pq import (
        assign_codes,
        random_codebooks,
    )

    blocks = rotation_blocks(2, 4, seed=7)
    books = random_codebooks(2, 4, 4, -900, 900, seed=70)
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fused = assign_codes(
        df, "vec_id", "embedding", books, 8, rotate_blocks=blocks
    )
    expr = assign_codes(
        df.select("vec_id", rotated_vec("embedding", blocks).alias("r")),
        "vec_id", "r", books, 8,
    )
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, expr.collect())
    )


def test_opq_trainer_beats_random_rotation(spark):
    """Alternating OPQ on within-block-correlated data must quantize
    better than the seeded random rotation baseline."""
    import random as pyrandom

    import numpy as np

    from etl_market_survey_spark.operators.opq import (
        rotation_blocks,
        train_opq_blocks,
    )

    rng = pyrandom.Random(3)
    rows = []
    for i in range(400):
        t, u = rng.gauss(0, 2.0), rng.gauss(0, 2.0)
        rows.append(
            (i, [t, t + rng.gauss(0, 0.05), u, u + rng.gauss(0, 0.05)])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def mse(blocks):
        X = np.array([r[1] for r in rows])
        total = 0.0
        for j, B in enumerate(blocks):
            B = np.array(B)
            S = X[:, j * 2 : (j + 1) * 2]
            Z = S @ B.T
            # fixed-seed Lloyd in the rotated space, same budget per rotation
            r2 = np.random.RandomState(11)
            cents = Z[r2.choice(len(Z), 4, replace=False)]
            for _ in range(10):
                a = ((Z[:, None, :] - cents[None, :, :]) ** 2).sum(2).argmin(1)
                for c in range(4):
                    if (a == c).any():
                        cents[c] = Z[a == c].mean(0)
            total += ((Z - cents[a]) ** 2).sum()
        return total / len(X)

    trained = train_opq_blocks(df, "embedding", m=2, k=4, sample_n=400)
    baseline = rotation_blocks(m=2, dsub=2)
    assert mse(trained) < mse(baseline), (mse(trained), mse(baseline))
    # blocks stay near-orthonormal after rounding (exact-literal contract)
    for B in trained:
        B = np.array(B)
        assert np.allclose(B @ B.T, np.eye(2), atol=1e-4)


def test_opq_trainer_deterministic(spark):
    from etl_market_survey_spark.operators.opq import train_opq_blocks

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), float(i % 3), float(i % 2)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    a = train_opq_blocks(df, "embedding", m=2, k=3, sample_n=100)
    b = train_opq_blocks(df, "embedding", m=2, k=3, sample_n=100)
    assert a == b
