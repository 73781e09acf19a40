"""Product quantization ANN (Jégou/Douze/Schmid, TPAMI 2011) — exact-int.

The scale path for similarity search when even an IVF cell is too big to
scan with full vectors: compress each embedding to ``m`` small codes
(one per subspace; here m bytes-worth per vector vs d*4 bytes raw) and
score queries against the *codes* with an asymmetric distance
computation (ADC) — a per-query lookup table of subspace distances, so
scoring a vector is ``m`` array lookups + adds, map-only over the codes
table, no shuffle, broadcast-sized LUT. 100 TB of float vectors becomes
~1.5 TB of codes that scan at memory bandwidth.

Exactness discipline (what makes the q117 gate possible): embeddings are
quantized to the integer grid ``floor(double(x) * 1000)`` — the same
value on every engine — and codebooks/queries are integer literals, so
code assignment (argmin of integer squared-L2, ties to the lowest code
index) and ADC scores are exact integer arithmetic, bit-identical in
Spark and the DuckDB oracle. Approximation lives ONLY in the PQ design
itself (codes instead of vectors), never in engine nondeterminism.

``train_pq_codebooks`` runs per-subspace Lloyd iterations on a driver
sample (seeded, deterministic) — the standard PQ trainer; codebooks are
tiny (m*k*dsub ints) and broadcast as literals into the plan, like the
IVF centroid table.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1000.0  # integer grid for embedding quantization


def quantized_vec(vec: Column, dim: int) -> Column:
    """``array<long>`` of floor(double(x)*1000) per element — the exact
    cross-engine representation all PQ arithmetic runs on."""
    return F.array(
        *[
            F.floor(F.element_at(vec, i).cast("double") * F.lit(SCALE)).cast("long")
            for i in range(1, dim + 1)
        ]
    )


def sql_quantized_vec(expr: str, dim: int) -> str:
    els = ", ".join(
        f"CAST(FLOOR(CAST(({expr})[{i}] AS DOUBLE) * {SCALE}) AS BIGINT)"
        for i in range(1, dim + 1)
    )
    return f"[{els}]"


def random_codebooks(
    m: int, k: int, dsub: int, lo: int, hi: int, seed: int = 42
) -> list[list[list[int]]]:
    """Deterministic integer codebooks on [lo, hi] — the data-free
    fallback (and the gate's literal codebooks)."""
    rng = random.Random(seed)
    return [
        [[rng.randint(lo, hi) for _ in range(dsub)] for _ in range(k)]
        for _ in range(m)
    ]


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int,
    k: int,
    seed: int = 42,
    sample_n: int = 10_000,
    iters: int = 10,
) -> list[list[list[int]]]:
    """Per-subspace Lloyd k-means on a deterministic driver sample,
    returning integer codebooks on the quantized grid. The sample is the
    head of a seeded *content-hash* order (same discipline as
    sampling/mixing), so the trained codebooks are reproducible across
    partition layouts and cluster sizes; assignment/ADC stay exact for
    any codebook regardless."""
    import numpy as np

    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.lit(seed), F.col(vec_col)))
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    Xq = np.floor(X * SCALE)
    # driver-side lexicographic sort: the trained codebooks depend only on
    # the sample CONTENT, never on partition layout or shuffle order
    Xq = Xq[np.lexsort(Xq.T[::-1])]
    dim = Xq.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books: list[list[list[int]]] = []
    for j in range(m):
        S = Xq[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(len(S), size=k, replace=len(S) < k)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = S[assign == c]
                if len(pts):
                    cents[c] = np.floor(pts.mean(axis=0))
        books.append([[int(v) for v in c] for c in cents])
    return books


def _qel(vec: Column, i: int) -> Column:
    # one quantized element straight off the stored array — NEVER build an
    # intermediate array<long> here: projection collapse would inline the
    # whole 64-element construction into every candidate reference
    # (~1000x recompute; measured 10x wall-time on the codes build)
    return F.floor(F.element_at(vec, i).cast("double") * F.lit(SCALE)).cast("long")


def _sub_dist(vec: Column, cb_entry: Sequence[int], j: int, dsub: int) -> Column:
    def _sq(t: int) -> Column:
        diff = _qel(vec, j * dsub + t + 1) - F.lit(int(cb_entry[t]))
        return diff * diff  # stays in long — integer-exact, no pow/double

    terms = [_sq(t) for t in range(dsub)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def assign_codes(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: Sequence[Sequence[Sequence[int]]],
    dim: int,
    impl: str = "arrow",
    rotate_blocks=None,
) -> DataFrame:
    """The index build: map-only codes table ``(id, code_0..code_{m-1})``.
    Argmin of integer squared-L2 per subspace; ties to the lowest code
    index.

    ``impl='arrow'`` (default) runs the batch numpy kernel — int64
    arithmetic on the same floor(double*1000) grid, np.argmin's
    first-minimum tie rule — bit-identical to the expression path and to
    the SQL mirror, but without the pathologically large generated-code
    method the m*k*dsub expression tree costs to JIT (measured: compile
    time, not row throughput, dominated the expression variant).
    ``impl='expr'`` keeps the pure-Catalyst plan (struct-ordered
    array_min), useful as the in-engine cross-check.

    ``rotate_blocks`` (OPQ/rotated-PQ serving): block-diagonal rotation
    applied INSIDE the Arrow kernel via ``opq.rotate_rows`` — the
    coefficients travel as task data, never as an expression tree, so
    the upstream projection stays inside whole-stage codegen (a
    d-output rotation rendered as literals overflows the generated
    method and drops the stage to interpreted eval)."""
    if impl == "arrow":
        return _assign_codes_arrow(
            df, id_col, vec_col, codebooks, dim, rotate_blocks
        )
    if rotate_blocks is not None:
        raise ValueError("rotate_blocks requires impl='arrow'")
    m, dsub = len(codebooks), dim // len(codebooks)
    vec = F.col(vec_col)
    cols = []
    for j in range(m):
        cands = F.array(
            *[
                F.struct(
                    _sub_dist(vec, codebooks[j][c], j, dsub).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        cols.append(F.array_min(cands)["c"].alias(f"code_{j}"))
    return df.select(F.col(id_col).alias("vec_id"), *cols)


def _assign_codes_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: Sequence[Sequence[Sequence[int]]],
    dim: int,
    rotate_blocks=None,
) -> DataFrame:
    import numpy as np

    m, dsub = len(codebooks), dim // len(codebooks)
    books = [np.asarray(b, dtype=np.int64) for b in codebooks]
    schema = ", ".join(
        ["vec_id long"] + [f"code_{j} int" for j in range(m)]
    )

    def _kernel(batches):
        import pandas as pd

        from .opq import rotate_rows

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if rotate_blocks is not None:
                X = rotate_rows(X, rotate_blocks)
            # same grid as the SQL mirror: floor(double(x) * SCALE)
            Xq = np.floor(X.astype(np.float64) * SCALE).astype(np.int64)
            out = {"vec_id": ids}
            for j in range(m):
                S = Xq[:, j * dsub : (j + 1) * dsub]          # (n, dsub)
                diff = S[:, None, :] - books[j][None, :, :]   # (n, k, dsub)
                d2 = (diff * diff).sum(axis=2)                # int64-exact
                out[f"code_{j}"] = d2.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        _kernel, schema=schema
    )


def adc_lut(
    query: Sequence[int], codebooks: Sequence[Sequence[Sequence[int]]]
) -> list[list[int]]:
    """Per-subspace distance lookup table for one integer query vector —
    computed driver-side (m*k ints), broadcast as literals."""
    m = len(codebooks)
    dsub = len(query) // m
    return [
        [
            sum(
                (int(query[j * dsub + t]) - int(codebooks[j][c][t])) ** 2
                for t in range(dsub)
            )
            for c in range(len(codebooks[j]))
        ]
        for j in range(m)
    ]


def adc_topk(
    codes: DataFrame,
    queries: Sequence[tuple[int, Sequence[int]]],
    codebooks: Sequence[Sequence[Sequence[int]]],
    k: int,
) -> DataFrame:
    """Approximate top-k per query over the codes table: ADC score =
    sum_j lut_j[code_j], ties by vec_id.

    ONE scan scores the whole query batch (per-query LUT lookups emitted
    as an exploded (query_id, dist) array per row — scanning the codes
    table n_q times would repay the index build per query); the per-query
    top-k rides the WindowGroupLimit rewrite, so each map task trims to k
    per query before the only (tiny) shuffle."""
    from .windows import top_k_per_group

    per_query = []
    for qid, qvec in queries:
        lut = adc_lut(qvec, codebooks)
        dist = None
        for j, row in enumerate(lut):
            term = F.element_at(
                F.array(*[F.lit(int(v)) for v in row]), F.col(f"code_{j}") + 1
            )
            dist = term if dist is None else dist + term
        per_query.append(
            F.struct(F.lit(qid).alias("query_id"), dist.cast("long").alias("adc_dist"))
        )
    exploded = codes.select(
        "vec_id", F.explode(F.array(*per_query)).alias("q")
    ).select("vec_id", F.col("q.query_id").alias("query_id"), F.col("q.adc_dist").alias("adc_dist"))
    return top_k_per_group(
        exploded, ["query_id"], [F.col("adc_dist"), F.col("vec_id")], k, rank_col="_rk"
    ).drop("_rk").select("query_id", "vec_id", "adc_dist")


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors — keep in lockstep with the Spark expressions
# ---------------------------------------------------------------------------

def sql_codes_cte(
    table: str,
    id_expr: str,
    vec_expr: str,
    groups: Sequence[tuple[str, int, int, Sequence[Sequence[int]]]],
    dim: int,
) -> str:
    """CTE text computing argmin-code columns (list_position of the list
    minimum — first occurrence = lowest index). ``groups`` entries are
    ``(col_name, dim_offset, dsub, codebook)`` — heterogeneous, so a
    full-dim coarse quantizer (IVF cell) and per-subspace PQ codes can
    share one pass.

    Emitted as lambda list arithmetic over literal codebook arrays (NOT
    unrolled per-term expressions: a few thousand unrolled squared terms
    blew DuckDB's optimizer memory), with the distance lists materialized
    once before the argmin stage."""
    dist_cols = []
    code_cols = []
    for name, off, dsub, book in groups:
        lits = ", ".join(
            "[" + ", ".join(str(int(v)) for v in entry) + "]" for entry in book
        )
        sub = f"qv[{off + 1}:{off + dsub}]"
        dist_cols.append(
            f"list_transform([{lits}], c -> list_sum(list_transform("
            f"range(1, {dsub + 1}), i -> ({sub}[i] - c[i]) * ({sub}[i] - c[i])"
            f"))) AS d_{name}"
        )
        code_cols.append(
            f"(list_position(d_{name}, list_min(d_{name})) - 1) AS {name}"
        )
    return (
        f"WITH qvt AS MATERIALIZED (SELECT {id_expr} AS vec_id, "
        f"{sql_quantized_vec(vec_expr, dim)} AS qv FROM {table}),\n"
        f"dists AS MATERIALIZED (SELECT vec_id, {', '.join(dist_cols)} FROM qvt),\n"
        f"codes AS (SELECT vec_id, {', '.join(code_cols)} FROM dists)"
    )


def sql_assign_codes(
    table: str,
    id_expr: str,
    vec_expr: str,
    codebooks: Sequence[Sequence[Sequence[int]]],
    dim: int,
) -> str:
    """CTE text mirroring :func:`assign_codes` (uniform subspaces)."""
    m, dsub = len(codebooks), dim // len(codebooks)
    groups = [
        (f"code_{j}", j * dsub, dsub, codebooks[j]) for j in range(m)
    ]
    return sql_codes_cte(table, id_expr, vec_expr, groups, dim)


def sql_adc_topk(
    codes_cte: str,
    queries: Sequence[tuple[int, Sequence[int]]],
    codebooks: Sequence[Sequence[Sequence[int]]],
    k: int,
) -> str:
    selects = []
    for qid, qvec in queries:
        lut = adc_lut(qvec, codebooks)
        dist = " + ".join(
            f"([{', '.join(str(v) for v in row)}])[code_{j} + 1]"
            for j, row in enumerate(lut)
        )
        selects.append(
            f"(SELECT {qid} AS query_id, vec_id, CAST({dist} AS BIGINT) AS adc_dist"
            f" FROM codes ORDER BY adc_dist, vec_id LIMIT {k})"
        )
    body = " UNION ALL ".join(selects)
    return f"{codes_cte}\nSELECT * FROM ({body}) ORDER BY query_id, adc_dist, vec_id"


# ---------------------------------------------------------------------------
# IVF + PQ composition (the FAISS serving shape: coarse quantizer prunes
# the scan to nprobe cells, PQ codes make the scan cheap)
# ---------------------------------------------------------------------------

def cell_of(query: Sequence[int], centroids: Sequence[Sequence[int]]) -> list[int]:
    """Centroid indices sorted by ascending integer L2 (ties to the
    lower index) — driver-side, exact; used for nprobe probe sets."""
    dists = [
        (sum((int(q) - int(c[t])) ** 2 for t, q in enumerate(query)), i)
        for i, c in enumerate(centroids)
    ]
    return [i for _, i in sorted(dists)]


def ivf_pq_topk(
    index: DataFrame,
    queries: Sequence[tuple[int, Sequence[int]]],
    codebooks: Sequence[Sequence[Sequence[int]]],
    centroids: Sequence[Sequence[int]],
    nprobe: int,
    k: int,
) -> DataFrame:
    """Serve ADC top-k from an IVF-pruned codes table.

    ``index`` carries ``vec_id``, ``cell`` (from ``assign_codes`` with
    ``[centroids]`` as a one-subspace codebook — the coarse quantizer IS
    a PQ with m=1) and ``code_j`` columns. Each query scores ONLY rows
    whose cell is among its nprobe nearest centroids; one scan serves the
    whole query batch (a per-query cell predicate gates each LUT entry,
    nulls compacted away before the explode), top-k rides
    WindowGroupLimit. Recall loss is exactly the IVF blocking — the gate
    pins it with literal centroids, so approximation is still
    deterministic design, not engine noise.
    """
    from .windows import top_k_per_group

    per_query = []
    for qid, qvec in queries:
        probes = cell_of(qvec, centroids)[:nprobe]
        lut = adc_lut(qvec, codebooks)
        dist = None
        for j, row in enumerate(lut):
            term = F.element_at(
                F.array(*[F.lit(int(v)) for v in row]), F.col(f"code_{j}") + 1
            )
            dist = term if dist is None else dist + term
        per_query.append(
            F.when(
                F.col("cell").isin([int(p) for p in probes]),
                F.struct(
                    F.lit(qid).alias("query_id"), dist.cast("long").alias("adc_dist")
                ),
            )
        )
    exploded = (
        index.select("vec_id", F.explode(F.array_compact(F.array(*per_query))).alias("q"))
        .select(
            "vec_id",
            F.col("q.query_id").alias("query_id"),
            F.col("q.adc_dist").alias("adc_dist"),
        )
    )
    return (
        top_k_per_group(
            exploded, ["query_id"], [F.col("adc_dist"), F.col("vec_id")], k, rank_col="_rk"
        )
        .drop("_rk")
        .select("query_id", "vec_id", "adc_dist")
    )


def sql_ivf_pq_topk(
    codes_cte: str,
    queries: Sequence[tuple[int, Sequence[int]]],
    codebooks: Sequence[Sequence[Sequence[int]]],
    centroids: Sequence[Sequence[int]],
    nprobe: int,
    k: int,
) -> str:
    """DuckDB mirror: same probe sets (computed by the same driver-side
    integer arithmetic), same LUTs, same tie order."""
    selects = []
    for qid, qvec in queries:
        probes = cell_of(qvec, centroids)[:nprobe]
        lut = adc_lut(qvec, codebooks)
        dist = " + ".join(
            f"([{', '.join(str(v) for v in row)}])[code_{j} + 1]"
            for j, row in enumerate(lut)
        )
        in_list = ", ".join(str(int(p)) for p in probes)
        selects.append(
            f"(SELECT {qid} AS query_id, vec_id, CAST({dist} AS BIGINT) AS adc_dist"
            f" FROM codes WHERE cell IN ({in_list})"
            f" ORDER BY adc_dist, vec_id LIMIT {k})"
        )
    body = " UNION ALL ".join(selects)
    return f"{codes_cte}\nSELECT * FROM ({body}) ORDER BY query_id, adc_dist, vec_id"
