"""Similarity search over embedding columns (array<float>) — first-class
beyond-reference operator family.

- ``cosine_topk``      — brute-force exact top-k: the correctness baseline.
  Queries are broadcast (k queries x d floats is tiny); the corpus is never
  shuffled — each partition scores its rows and a partial top-k reduces.
  At 100 TB this is one map + one small aggregation, bandwidth-bound.
- ``lsh_bucket_topk``  — scale path: random-hyperplane (SRP) LSH buckets
  prune the corpus before exact scoring; probe multiplicity trades recall
  for cost. Deterministic: hyperplanes come from a seeded md5-derived
  pseudo-random expansion, so results are reproducible run-to-run.
- ``ivf_topk``         — IVF-style alternative: k-means-lite centroids
  (seeded sample on driver) assign each vector to a cell; queries score
  only their nprobe nearest cells.

Dot products use ``F.zip_with`` + ``F.aggregate`` (sequential fold —
deterministic order) entirely JVM-side. Cosines are rounded to 1e-6 before
ranking: 64-term float reorderings perturb ~1e-14, so rounding makes
cross-engine comparison exact while being far above no semantic loss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

COS_DECIMALS = 6


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return F.round(dot(a, b) / (norm(a) * norm(b)), COS_DECIMALS)


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """``cosine`` with the norms precomputed *below the join* (a Project on
    each input side evaluates them once per VECTOR, not once per pair —
    cosine() inline costs 3 array folds per pair; this costs 1). The float
    expression dot/(na*nb) is unchanged, so results are bit-identical."""
    return F.round(dot(a, b) / (norm_a * norm_b), COS_DECIMALS)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Output: ``(query_id, vec_id, cos, rank)`` with deterministic
    (cos desc, vec_id) ranking.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qvec"),
    ).withColumn("_qn", norm(F.col("_qvec")))
    c = corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos",
        cosine_with_norms(F.col("_qvec"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def _srp_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes (numpy on driver — tiny constant)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id as a bit string — pure-expression
    form (JVM, no Python). Higher-order-function folds are interpreted
    (never codegen'd), so with many planes this is the slow path; kept as
    the dependency-free fallback and the semantic reference."""
    vec = _to_double(vec)
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(w)) for w in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id as a bit string.

    Arrow-vectorized: all plane projections are ONE numpy matmul per
    batch — measured ~50x over the expression form at 64 planes (HOF
    folds are interpreted per element; a (batch x dim) @ (dim x planes)
    GEMM is exactly what the built-ins can't express). Sign rule matches
    ``srp_signature_expr`` (>= 0 -> '1'); dots within float-reassociation
    distance of 0 may rarely flip a bit — acceptable by construction,
    since every SRP consumer is an approximate candidate generator whose
    final scoring is exact.
    """
    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)

    @F.pandas_udf("string")
    def _sig(s: pd.Series) -> pd.Series:
        if s.empty:
            return pd.Series([], dtype=str)
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in s])
        bits = (M @ P) >= 0  # (batch, n_planes)
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    return _sig(vec)


def srp_signature_int_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Pure-expression form of :func:`srp_signature_int` (JVM, no
    Python): one constant-folded nested literal array (the kmeans
    codebook pattern), a transform + aggregate fold — O(1) expression
    tree in the plane count. Higher-order folds are interpreted, so
    with many planes the Arrow form below is the throughput path; both
    produce identical bits (unit-asserted)."""
    vec = _to_double(vec)
    scaled = F.array(
        *[
            F.array(*[F.lit(float(w) * 1e12) for w in plane])
            for plane in planes
        ]
    )
    dots = F.transform(
        scaled,
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda x, w: F.floor(x * w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return F.array_join(
        F.transform(
            dots, lambda d: F.when(d >= 0, F.lit("1")).otherwise(F.lit("0"))
        ),
        "",
    )


def srp_signature_int(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bit string with EXACT integer signs: each
    projection is an int64 sum of ``floor(x * (w * 1e12))`` terms over
    pre-scaled literal plane weights, so the sign — and therefore every
    bucket — is a pure function of (vector, planes) that any engine
    replays bit-for-bit (``sql_srp_bits`` is the DuckDB mirror). This is
    what upgrades SRP-bucketed operators from recall-tested to
    exact-gated: candidate GENERATION itself becomes deterministic
    arithmetic, not a float matmul whose near-zero dots may flip bits
    across engines.

    Arrow-vectorized: per plane, one elementwise double multiply +
    floor + int64 row-sum in numpy — the SAME IEEE multiply, floor and
    exact integer sum the JVM expression performs, so bits are
    bit-identical to :func:`srp_signature_int_expr` (unit-asserted)
    while running ~an order of magnitude faster than the interpreted
    HOF fold (the q60 bench regression that motivated this split)."""
    W = np.asarray(planes, dtype=np.float64) * 1e12  # (p, d)

    @F.pandas_udf("string")
    def _sig(s: pd.Series) -> pd.Series:
        if s.empty:
            return pd.Series([], dtype=str)
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in s])
        bits = np.empty((M.shape[0], W.shape[0]), dtype=bool)
        for pi in range(W.shape[0]):
            bits[:, pi] = (
                np.floor(M * W[pi][None, :]).astype(np.int64).sum(axis=1) >= 0
            )
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    return _sig(_to_double(vec))


def sql_srp_bits(vec_expr: str, planes: list[list[float]]) -> str:
    """DuckDB mirror of :func:`srp_signature_int` — keep in lockstep.
    ``vec_expr`` must be a ``DOUBLE[]`` expression."""
    dim = len(planes[0])
    lits = ", ".join(
        "[" + ", ".join(repr(float(w) * 1e12) for w in plane) + "]"
        for plane in planes
    )
    return (
        f"array_to_string(list_transform([{lits}], p -> "
        f"CASE WHEN list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST(FLOOR({vec_expr}[i] * p[i]) AS BIGINT))) >= 0 "
        f"THEN '1' ELSE '0' END), '')"
    )


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    method: str = "sample",
    sample_rows: int = 2048,
    max_iter: int = 10,
) -> list[list[float]]:
    """Derive IVF cell centroids (unit-normalized).

    ``method='sample'`` — seeded Lloyd iterations on a driver-side sample
    of <= ``sample_rows`` vectors: a tiny constant, good centroids when
    the sample sees every mode. ``method='kmeans'`` — distributed Spark ML
    k-means over the FULL corpus (k-means|| init): the billion-vector
    path, where no bounded sample is representative; the training job is
    a handful of scans, and the resulting centroid list is identical in
    shape, so the query path is unchanged. Persist with
    ``save_centroids`` so serving never retrains.
    """
    import numpy as np

    if method == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = corpus.select(
            array_to_vector(_to_double(F.col(vec_col))).alias("features")
        )
        model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
        cents = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=float)
    elif method == "sample":
        sample = np.array(
            [r[0] for r in corpus.select(vec_col).limit(sample_rows).collect()],
            dtype=float,
        )
        rng = np.random.default_rng(seed)
        cents = sample[
            rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
        ]
        for _ in range(5):  # spherical Lloyd iterations on the sample
            sims = sample @ cents.T
            assign = sims.argmax(axis=1)
            for c in range(len(cents)):
                members = sample[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    norm_ = np.linalg.norm(m)
                    if norm_ > 0:
                        cents[c] = m / norm_
    else:
        raise ValueError(f"unknown method {method!r}")
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (cents / norms).tolist()


def save_centroids(spark, cents: list[list[float]], path: str) -> None:
    """Persist a trained centroid table: ``(cell int, centroid
    array<double>)`` parquet — one tiny file, broadcast at query time."""
    spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list[list[float]]:
    rows = spark.read.parquet(path).orderBy("cell").collect()
    assert [r["cell"] for r in rows] == list(range(len(rows)))
    return [list(r["centroid"]) for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    sample_rows: int = 2048,
    train: str = "sample",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: centroids from ``train_ivf_centroids`` (or a
    pre-trained ``centroids`` list via ``load_centroids``), each corpus
    vector assigned to its nearest cell (one JVM expression), each query
    scored only against its ``nprobe`` nearest cells.

    At 100 TB: the corpus pass is a map (cell assignment) + shuffle on
    cell id; queries broadcast. Recall grows with nprobe; exact
    ``cosine_topk`` is the oracle.
    """
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            corpus, vec_col, n_cells, seed, method=train, sample_rows=sample_rows
        )
    )

    def nearest_cells_expr(vec: Column, n: int) -> Column:
        scores = F.array(
            *[
                F.struct(
                    dot(_to_double(vec), F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(cents)
            ]
        )
        ordered = F.reverse(F.array_sort(scores))
        return F.transform(F.slice(ordered, 1, n), lambda st: st["cell"])

    c_assigned = corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_cv")
    ).select(
        id_col,
        "_cv",
        norm(F.col("_cv")).alias("_cn"),
        nearest_cells_expr(F.col("_cv"), 1)[0].alias("_cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qvec"),
        F.explode(nearest_cells_expr(F.col(vec_col), nprobe)).alias("_cell"),
    ).withColumn("_qn", norm(F.col("_qvec")))
    scored = c_assigned.join(F.broadcast(q), on="_cell").withColumn(
        "cos",
        cosine_with_norms(F.col("_qvec"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
    )
    scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exact_buckets: bool = False,
) -> DataFrame:
    """Approximate top-k: SRP-bucket the corpus, score only the query's
    bucket. Recall < 1 by design; the exact ``cosine_topk`` is the
    recall baseline. ``exact_buckets=True`` uses the integer-sign
    signature (:func:`srp_signature_int`) so the bucketing — and with it
    the whole approximate result — is engine-replayable arithmetic,
    giving q25 a bit-exact SQL gate instead of a rows-only check.
    """
    planes = _srp_planes(dim, n_planes, seed)
    sig = srp_signature_int if exact_buckets else srp_signature
    c = corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_cv")
    ).select(
        id_col,
        "_cv",
        norm(F.col("_cv")).alias("_cn"),
        sig(F.col("_cv"), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qvec"),
        sig(_to_double(F.col(vec_col)), planes).alias("_bucket"),
    ).withColumn("_qn", norm(F.col("_qvec")))
    scored = c.join(F.broadcast(q), on="_bucket").withColumn(
        "cos",
        cosine_with_norms(F.col("_qvec"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
    )
    scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def embedding_neardup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    mode: str = "exact",
    n_bands: int = 8,
    band_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exact_buckets: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``(id_a, id_b, cos)`` with
    ``id_a < id_b`` and rounded ``cos >= threshold``.

    ``exact_buckets=True`` routes LSH banding through
    :func:`srp_signature_int` (integer-sign projections over literal
    planes) — same recall characteristics, but the whole chain becomes a
    deterministic function a SQL oracle replays bit-for-bit (q60's exact
    gate). The default Arrow matmul signature is the throughput path.

    ``mode='exact'`` — all-pairs self-join: the correctness baseline and
    the oracle for the LSH mode (O(n^2) scoring; right only when the
    corpus is bounded). ``mode='lsh'`` — the 100 TB path: each vector
    emits ``n_bands`` (band, SRP-bucket) keys; candidates are pairs
    colliding in ANY band (an equi-join on the band key — work scales
    with colliding pairs, never all pairs). Candidates travel as BARE id
    pairs (dedup shuffles 16 bytes/row, not two vectors); vectors and
    norms re-attach by joining the corpus projection, then one exact
    cosine per unique pair.

    For threshold t the per-band hit rate is p = (1 - acos(t)/pi)^
    band_planes and recall = 1 - (1-p)^n_bands; the defaults target the
    true near-dup regime (t=0.9: p=.29, recall=.93 — and selective 256-
    value buckets). At LOW thresholds SRP bands lose selectivity faster
    than they gain recall (t=0.35 needs band_planes<=2, whose 4-value
    buckets collide half the corpus) — there exact all-pairs is honestly
    cheaper; the recall unit test pins the low-threshold tradeoff.
    """
    base = df.select(
        F.col(id_col).alias("_id"), _to_double(F.col(vec_col)).alias("_v")
    ).withColumn("_nrm", norm(F.col("_v")))
    if mode == "exact":
        a = base.select(
            F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_nrm").alias("_na")
        )
        b = base.select(
            F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_nrm").alias("_nb")
        )
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    elif mode == "lsh":
        planes = _srp_planes(dim, n_bands * band_planes, seed)
        if exact_buckets:
            bits = srp_signature_int(F.col("_v"), planes)
            bands = F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring(
                            F.col("_bits"), i * band_planes + 1, band_planes
                        ).alias("bucket"),
                    )
                    for i in range(n_bands)
                ]
            )
            tagged = (
                base.withColumn("_bits", bits)
                .select("_id", F.explode(bands).alias("_bb"))
                .select(
                    "_id",
                    F.col("_bb.band").alias("band"),
                    F.col("_bb.bucket").alias("bucket"),
                )
            )
        else:
            bands = F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        srp_signature(
                            F.col("_v"),
                            planes[i * band_planes : (i + 1) * band_planes],
                        ).alias("bucket"),
                    )
                    for i in range(n_bands)
                ]
            )
            tagged = base.select("_id", F.explode(bands).alias("_bb")).select(
                "_id",
                F.col("_bb.band").alias("band"),
                F.col("_bb.bucket").alias("bucket"),
            )
        a = tagged.select(F.col("_id").alias("id_a"), "band", "bucket")
        b = tagged.select(F.col("_id").alias("id_b"), "band", "bucket")
        pairs = (
            a.join(b, on=["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b")
        )
        cand = pairs.join(
            base.select(
                F.col("_id").alias("id_a"),
                F.col("_v").alias("_va"),
                F.col("_nrm").alias("_na"),
            ),
            on="id_a",
        ).join(
            base.select(
                F.col("_id").alias("id_b"),
                F.col("_v").alias("_vb"),
                F.col("_nrm").alias("_nb"),
            ),
            on="id_b",
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return (
        cand.withColumn(
            "cos",
            cosine_with_norms(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ),
        )
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cos")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
    batch_slack: int = 8,
) -> DataFrame:
    """Exact brute-force cosine top-k, Arrow-vectorized (the fast path).

    Same contract and BIT-IDENTICAL results as ``cosine_topk``: the numpy
    kernel accumulates dot products sequentially over dimensions with
    separate multiply and add (``acc += C[:,j] (*) Q[:,j]``) — the exact
    FP operation order of the JVM ``aggregate(zip_with(...))`` fold, which
    numpy does not fuse (no FMA) — so raw cosines match the JVM fold to
    the last bit, and the final ROUND/rank happens in the JVM exactly as
    in ``cosine_topk``. The JVM fold is interpreted per element
    (higher-order functions don't enter whole-stage codegen); this kernel
    does the same arithmetic at SIMD speed over Arrow batches, ~10x
    faster at bench scale.

    Scale shape is unchanged: queries broadcast (collected driver-side —
    they are small by contract), the corpus is never shuffled; each Arrow
    batch emits only its local top-(k+slack) per query, so the shuffle
    into the final window carries O(n_batches * n_queries * k) rows, not
    the full score matrix. ``batch_slack`` guards the theoretical case
    where rounding reorders near-ties across the batch-pruning boundary.
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    qid = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([[float(x) for x in r[1]] for r in qrows], dtype=np.float64)
    nq, dim = Q.shape

    def _seq_sq_norms(M):
        acc = np.zeros(M.shape[0], dtype=np.float64)
        for j in range(M.shape[1]):
            acc = acc + M[:, j] * M[:, j]
        return np.sqrt(acc)

    qn = _seq_sq_norms(Q)
    keep = k + batch_slack

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            acc = np.zeros((len(ids), nq), dtype=np.float64)
            for j in range(dim):
                # outer(mul) then add: same op order as the JVM fold
                acc = acc + C[:, j : j + 1] * Q[None, :, j]
            cn = _seq_sq_norms(C)
            cos = acc / (cn[:, None] * qn[None, :])
            if not include_self:
                cos[ids[:, None] == qid[None, :]] = -np.inf
            m = min(keep, len(ids))
            top = np.argpartition(-cos, m - 1, axis=0)[:m]  # (m, nq)
            out_q = np.repeat(qid, m)
            rows = top.T.reshape(-1)
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    id_col: ids[rows],
                    "cos": cos[rows, np.repeat(np.arange(nq), m)],
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cos double"
    )
    scored = scored.filter(F.col("cos") != float("-inf")).withColumn(
        "cos", F.round("cos", COS_DECIMALS)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def sq8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Scalar int8 quantization (the SQ8 of faiss/pgvector — the most
    deployed embedding compression): per-dimension corpus min/max, then
    ``q_d = floor(255 * (x_d - min_d) / (max_d - min_d))`` clamped to
    [0, 255] — 4x smaller vectors, integer dot products downstream.

    floor (never round) keeps the mapping bit-deterministic across
    engines: the scale division is the same double arithmetic
    everywhere and floor has no tie semantics (q277 replays it).

    Returns ``(quantized, stats)``: quantized = (id, qvec array<int>),
    stats = one row per dim (pos, mn, mx) — broadcastable, and the
    piece a serving tier persists next to the codebook."""
    x = F.col(vec_col)
    exploded = emb.select(
        F.col(id_col).alias("_id"), F.posexplode(x).alias("_pos", "_v")
    ).withColumn("_v", F.col("_v").cast("double"))
    stats = (
        exploded.groupBy("_pos")
        .agg(F.min("_v").alias("mn"), F.max("_v").alias("mx"))
        .select(F.col("_pos").alias("pos"), "mn", "mx")
    )
    q = (
        exploded.join(F.broadcast(stats), exploded["_pos"] == stats["pos"])
        .withColumn(
            "_q",
            F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
                F.least(
                    F.lit(255),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            F.lit(255.0)
                            * (F.col("_v") - F.col("mn"))
                            / (F.col("mx") - F.col("mn"))
                        ).cast("int"),
                    ),
                )
            ),
        )
        .groupBy("_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_q"))),
                lambda z: z["_q"],
            ).alias("qvec")
        )
        .select(F.col("_id").alias(id_col), "qvec")
    )
    return q, stats


def sq8_topk(
    quantized: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k by cosine over DEQUANTIZED vectors — how SQ8 serving
    actually ranks (ranking raw shifted-integer dots ignores the per-dim
    offset and the norm, and recall collapses — measured at 0.0-0.2
    before this was reconstruction-based). Reconstruction
    ``x̂_d = mn_d + q_d * (mx_d - mn_d) / 255`` happens once per stored
    row against the broadcast stats; the cosine fold is the q24 kernel
    (deterministic double arithmetic). Output: ``(query_id, vec_id,
    cos, rank)``, ties by vec_id; queries broadcast, corpus never
    shuffles."""
    mns = stats.orderBy("pos").agg(
        F.collect_list("mn").alias("mns"), F.collect_list("mx").alias("mxs")
    )
    recon = (
        quantized.crossJoin(F.broadcast(mns))
        .withColumn(
            "rv",
            F.zip_with(
                "qvec",
                F.arrays_zip("mns", "mxs"),
                lambda q, mm: mm["mns"]
                + q.cast("double") * (mm["mxs"] - mm["mns"]) / F.lit(255.0),
            ),
        )
        .select(id_col, "rv")
    )
    qs = recon.join(
        queries.select(F.col("query_id").alias(id_col)), id_col
    ).select(F.col(id_col).alias("query_id"), F.col("rv").alias("qv"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = (
        recon.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("rv"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("rv"), F.col("rv")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    )
    return (
        scored.withColumn("rank", rk)
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Binary quantization (sign-bit) ANN — the 1-bit-per-dimension family
# (Lucene/FAISS "BQ": quantize to sign bits, rank candidates by Hamming
# distance, rerank the survivors with exact cosine). Complements SRP-LSH:
# SRP prunes by BUCKET EQUALITY on random projections; BQ keeps every
# corpus vector in play but ranks with a 32x-smaller code and an integer
# kernel, so recall degrades gracefully instead of cliff-edging when a
# neighbor lands one bucket over.
#
# Scale shape (100 TB): the candidate pass touches only (id, one BIGINT)
# per corpus vector — 8 bytes of code instead of 256 bytes of floats — and
# the Hamming kernel is bit_count(xor), whole-stage-codegen JVM integer
# ops. Full-precision vectors are fetched ONLY for the k*oversample
# survivors via a broadcast semi-join back against the corpus (candidate
# list is tiny by contract), so the expensive float reranking never
# shuffles the corpus.
# ---------------------------------------------------------------------------


def _bq_bit_const(i: int) -> int:
    """Signed-64 value of bit ``i`` (bit 63 is the sign bit)."""
    v = 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def bq_bits(vec: Column, dim: int, threshold: float = 0.0) -> Column:
    """Pack per-dimension sign bits (``v[i] > threshold``) of an
    ``array<float|double>`` into ONE BIGINT (``dim`` <= 64, bit i =
    dimension i). A static OR-chain of 64 ``when`` terms — pure JVM
    expression, codegen-friendly (no interpreted higher-order fold)."""
    if not 0 < dim <= 64:
        raise ValueError(f"bq_bits packs at most 64 dims into one long, got {dim}")
    vec = _to_double(vec)
    out = None
    for i in range(dim):
        term = F.when(
            F.element_at(vec, i + 1) > F.lit(float(threshold)),
            F.lit(_bq_bit_const(i)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        out = term if out is None else out.bitwiseOR(term)
    return out


def sql_bq_bits(vec_expr: str, dim: int, threshold: float = 0.0) -> str:
    """DuckDB mirror of :func:`bq_bits` — keep in lockstep.
    ``vec_expr`` must be a ``DOUBLE[]`` expression."""
    terms = " | ".join(
        f"(CASE WHEN {vec_expr}[{i + 1}] > {float(threshold)!r} "
        f"THEN CAST({_bq_bit_const(i)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(dim)
    )
    return f"({terms})"


def bq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    oversample: int = 5,
    threshold: float = 0.0,
    include_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k via sign-bit binary quantization.

    Stage 1 (candidates): Hamming distance between packed sign bits —
    corpus rows reduced to ``(id, BIGINT)`` before the broadcast cross
    with the (tiny) query set; keep the ``k * oversample`` nearest codes
    per query with deterministic (hamming, id) ordering.
    Stage 2 (rerank): fetch full vectors for the survivors only
    (broadcast join — candidate list is ``n_queries * k * oversample``
    rows by contract) and rank by exact rounded cosine.

    Deterministic end-to-end: the bit packing, Hamming ties, and the
    rounded-cosine ranking all break ties on ``id``, so the whole chain
    (codes -> candidates -> rerank) replays bit-for-bit in SQL via
    :func:`sql_bq_bits`.

    Output: ``(query_id, vec_id, cos, rank)`` — same contract as
    :func:`cosine_topk`.
    """
    n_cand = k * oversample
    c_bits = corpus.select(
        F.col(id_col), bq_bits(F.col(vec_col), dim, threshold).alias("_bits")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qvec"),
    ).withColumn("_qn", norm(F.col("_qvec")))
    q_bits = q.select(
        "query_id", bq_bits(F.col("_qvec"), dim, threshold).alias("_qbits")
    )
    paired = c_bits.crossJoin(F.broadcast(q_bits)).withColumn(
        "_ham", F.bit_count(F.col("_bits").bitwiseXOR(F.col("_qbits")))
    )
    if not include_self:
        paired = paired.filter(F.col("query_id") != F.col(id_col))
    w_cand = Window.partitionBy("query_id").orderBy(F.col("_ham"), F.col(id_col))
    cand = (
        paired.withColumn("_crank", F.row_number().over(w_cand))
        .filter(F.col("_crank") <= n_cand)
        .select("query_id", id_col)
    )
    c_vec = corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    rerank = c_vec.join(F.broadcast(cand), id_col).join(
        F.broadcast(q), "query_id"
    )
    scored = rerank.withColumn(
        "cos",
        cosine_with_norms(F.col("_qvec"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )


def bq_codes(vec: Column, dim: int, threshold: float = 0.0) -> Column:
    """Multi-word generalization of :func:`bq_bits`: pack ``dim`` sign
    bits into ``ceil(dim / 64)`` BIGINT words (``array<long>``, word j
    holds dims ``64j .. 64j+63``). Same static when/OR expression per
    word — no interpreted fold."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    vec = _to_double(vec)
    words = []
    for w in range((dim + 63) // 64):
        out = None
        for b in range(min(64, dim - w * 64)):
            term = F.when(
                F.element_at(vec, w * 64 + b + 1) > F.lit(float(threshold)),
                F.lit(_bq_bit_const(b)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            out = term if out is None else out.bitwiseOR(term)
        words.append(out)
    return F.array(*words)


def bq_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two same-length ``array<long>`` codes —
    a zip/bit_count/sum over ceil(dim/64) words (the fold is over WORDS,
    not dimensions, so the interpreted-HOF cost is 2-16 terms)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def bq_topk_wide(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 128,
    oversample: int = 5,
    threshold: float = 0.0,
    include_self: bool = False,
) -> DataFrame:
    """:func:`bq_topk` for ``dim > 64``: identical two-stage shape
    (codes-only Hamming candidates, broadcast-join exact-cosine rerank),
    with ``array<long>`` codes and :func:`bq_hamming`. The candidate
    pass still moves only ``8 * ceil(dim/64)`` bytes per corpus vector."""
    n_cand = k * oversample
    c_bits = corpus.select(
        F.col(id_col), bq_codes(F.col(vec_col), dim, threshold).alias("_bits")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("_qvec"),
    ).withColumn("_qn", norm(F.col("_qvec")))
    q_bits = q.select(
        "query_id", bq_codes(F.col("_qvec"), dim, threshold).alias("_qbits")
    )
    paired = c_bits.crossJoin(F.broadcast(q_bits)).withColumn(
        "_ham", bq_hamming(F.col("_bits"), F.col("_qbits"))
    )
    if not include_self:
        paired = paired.filter(F.col("query_id") != F.col(id_col))
    w_cand = Window.partitionBy("query_id").orderBy(F.col("_ham"), F.col(id_col))
    cand = (
        paired.withColumn("_crank", F.row_number().over(w_cand))
        .filter(F.col("_crank") <= n_cand)
        .select("query_id", id_col)
    )
    c_vec = corpus.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_cn", norm(F.col("_cv")))
    rerank = c_vec.join(F.broadcast(cand), id_col).join(F.broadcast(q), "query_id")
    scored = rerank.withColumn(
        "cos",
        cosine_with_norms(F.col("_qvec"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos", "rank")
    )
