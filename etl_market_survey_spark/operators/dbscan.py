"""DBSCAN* density clustering over embeddings (beyond reference).

The deterministic core-only DBSCAN variant (Campello et al.'s DBSCAN*,
the HDBSCAN building block): core points are those with >= min_pts
neighbors within eps (self included); clusters are the connected
components of the eps-graph restricted to core points; non-core points
are noise. Unlike classic DBSCAN there is NO border-point ambiguity —
the result is a pure function of the data, which is what lets q226
hash-gate a density clustering bit-for-bit.

Exactness: pairwise squared distances accumulate as int64
``floor((x-y)^2 * 1e12)`` terms (the kmeans/q189 discipline) and the
eps threshold is an integer compare — no float summation order
anywhere; components come from the pointer-jumping operator (min-id
labels), replayed by a recursive-CTE reachability oracle.

Scale: the all-pairs candidate step here is the EXACT baseline
(broadcast nested-loop — gate-scale by contract); at corpus scale
candidate generation goes through the LSH / IVF blocking of
``operators/similarity`` (same downstream core/component algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIST_SCALE = 1e12


def eps_pairs(
    df: DataFrame, id_col: str, vec_col: str, eps2_scaled: int
) -> DataFrame:
    """(id_a, id_b) pairs (a < b) with exact scaled squared distance
    <= ``eps2_scaled``."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    terms = F.zip_with(
        F.col("_va"),
        F.col("_vb"),
        lambda x, y: F.floor((x - y) * (x - y) * F.lit(_DIST_SCALE)).cast("long"),
    )
    d2 = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("_d2", d2)
        .filter(F.col("_d2") <= F.lit(int(eps2_scaled)))
        .select("id_a", "id_b")
    )


def dbscan_star_from_pairs(
    df: DataFrame,
    id_col: str,
    near: DataFrame,
    min_pts: int,
) -> DataFrame:
    """The blocking-agnostic half: given VERIFIED eps pairs (id_a < id_b,
    exact predicate already applied), compute cores and components. Any
    candidate generator that is a superset of the true eps pairs before
    verification yields the identical clustering — which is what makes
    the blocked scale path exact, not approximate."""
    from .components import connected_components

    near = near.localCheckpoint(eager=True)
    # degree over ALL points (left join + coalesce 0): a point with zero
    # eps-neighbors never appears in `near`, but its self-count still
    # applies — with min_pts == 1 an isolated point IS core (ADVICE r2)
    pair_deg = (
        near.select(F.col("id_a").alias("_id"))
        .unionAll(near.select(F.col("id_b").alias("_id")))
        .groupBy("_id")
        .agg(F.count("*").alias("_deg"))
    )
    deg = (
        df.select(F.col(id_col).alias("_id"))
        .join(pair_deg, "_id", "left")
        .select("_id", F.coalesce(F.col("_deg"), F.lit(0)).alias("_deg"))
    )
    core = deg.filter(F.col("_deg") + 1 >= min_pts).select("_id")
    cedges = near.join(
        core.select(F.col("_id").alias("id_a")), "id_a", "left_semi"
    ).join(core.select(F.col("_id").alias("id_b")), "id_b", "left_semi")
    comps = connected_components(cedges, "id_a", "id_b")
    labels = core.join(
        comps, core["_id"] == comps["node"], "left"
    ).select(
        F.col("_id"),
        # isolated core points (no core-core edge) are their own cluster
        F.coalesce(F.col("comp"), F.col("_id")).alias("cluster"),
    )
    return (
        df.select(id_col)
        .join(labels, F.col(id_col) == labels["_id"], "left")
        .select(
            id_col,
            F.col("_id").isNotNull().alias("is_core"),
            "cluster",
        )
    )


def dbscan_star(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    eps2_scaled: int,
    min_pts: int,
) -> DataFrame:
    """(id, is_core, cluster): exact all-pairs baseline — cluster = min
    core id reachable through core-core eps edges; NULL for noise."""
    return dbscan_star_from_pairs(
        df, id_col, eps_pairs(df, id_col, vec_col, eps2_scaled), min_pts
    )


def dbscan_star_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    eps2_scaled: int,
    min_pts: int,
    n_cells: int = 16,
    nprobe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The corpus-scale path: candidate pairs come from shared IVF cells
    (multi-probe assignment over seeded centroids), then the EXACT eps
    predicate verifies every candidate — so the only approximation is
    RECALL of candidate generation (near pairs split across all probed
    cells are missed; nprobe = n_cells degenerates to the exact
    all-pairs result, unit-asserted). Shuffle volume is per-cell, never
    corpus x corpus.

    Note: the IVF centroids are unit-normalized (direction-partitioned)
    — right for the usual normalized-embedding corpora; data whose eps
    structure lives in magnitudes gets weak pruning (never wrong
    results — verification is exact)."""
    from .similarity import train_ivf_centroids

    cents = train_ivf_centroids(df, vec_col, n_cells=n_cells, seed=seed)
    nprobe = min(nprobe, len(cents))
    emb = F.col(vec_col).cast("array<double>")
    cands = []
    for cid, cv in enumerate(cents):
        c = F.array(*[F.lit(float(v)) for v in cv])
        terms = F.zip_with(
            emb, c,
            lambda x, y: F.floor((x - y) * (x - y) * F.lit(_DIST_SCALE)).cast("long"),
        )
        d = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)
        cands.append(F.struct(d.alias("d"), F.lit(cid).cast("int").alias("c")))
    probed = F.slice(F.array_sort(F.array(*cands)), 1, nprobe)
    cells = df.select(
        F.col(id_col),
        emb.alias("_v"),
        F.explode(F.transform(probed, lambda s: s["c"])).alias("_cell"),
    )
    a = cells.select(
        F.col("_cell"), F.col(id_col).alias("id_a"), F.col("_v").alias("_va")
    )
    b = cells.select(
        F.col("_cell"), F.col(id_col).alias("id_b"), F.col("_v").alias("_vb")
    )
    terms = F.zip_with(
        F.col("_va"), F.col("_vb"),
        lambda x, y: F.floor((x - y) * (x - y) * F.lit(_DIST_SCALE)).cast("long"),
    )
    d2 = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)
    near = (
        a.join(b, ["_cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .distinct()  # pairs sharing several probed cells count once
        .withColumn("_d2", d2)
        .filter(F.col("_d2") <= F.lit(int(eps2_scaled)))
        .select("id_a", "id_b")
    )
    return dbscan_star_from_pairs(df, id_col, near, min_pts)


def sql_dbscan_star(
    table: str,
    id_expr: str,
    vec_expr: str,
    dims: int,
    eps2_scaled: int,
    min_pts: int,
) -> str:
    """DuckDB mirror: exact pair distances + recursive reachability."""
    return f"""
WITH RECURSIVE e AS (
  SELECT {id_expr} AS vid, g.i AS pos,
         CAST(list_extract({vec_expr}, g.i) AS DOUBLE) AS v
  FROM {table} CROSS JOIN generate_series(1, {dims}) AS g(i)
),
near AS (
  SELECT a.vid AS ia, b.vid AS ib
  FROM e a JOIN e b ON a.pos = b.pos AND a.vid < b.vid
  GROUP BY 1, 2
  HAVING SUM(CAST(FLOOR((a.v - b.v) * (a.v - b.v) * 1e12) AS BIGINT))
         <= {int(eps2_scaled)}
),
pair_deg AS (
  SELECT vid, COUNT(*) AS n FROM (
    SELECT ia AS vid FROM near UNION ALL SELECT ib FROM near
  ) GROUP BY 1
),
deg AS (
  SELECT t.{id_expr} AS vid, COALESCE(pd.n, 0) AS n
  FROM {table} t LEFT JOIN pair_deg pd ON t.{id_expr} = pd.vid
),
core AS (SELECT vid FROM deg WHERE n + 1 >= {min_pts}),
und AS (
  SELECT n.ia AS a, n.ib AS b FROM near n
  JOIN core ca ON n.ia = ca.vid JOIN core cb ON n.ib = cb.vid
  UNION
  SELECT n.ib, n.ia FROM near n
  JOIN core ca ON n.ia = ca.vid JOIN core cb ON n.ib = cb.vid
),
reach(src, dst) AS (
  SELECT vid, vid FROM core
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
),
labels AS (SELECT src AS vid, MIN(dst) AS cluster FROM reach GROUP BY 1)
SELECT t.{id_expr},
       (l.vid IS NOT NULL) AS is_core,
       l.cluster
FROM {table} t LEFT JOIN labels l ON t.{id_expr} = l.vid
"""
