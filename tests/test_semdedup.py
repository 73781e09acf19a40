"""SemDeDup unit tests — centroid-cell mode (the non-SQL path)."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.semdedup import (
    assign_cells,
    semdedup,
    semdedup_pairs,
)
from etl_market_survey_spark.operators.similarity import train_ivf_centroids

_T = 0.4


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )


def test_cell_pairs_subset_of_exact(spark, sf_dir):
    """Cell blocking may MISS pairs but must never invent one: every
    emitted edge must be a genuine above-threshold cosine pair."""
    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(emb, "embedding", n_cells=4, seed=42)
    got = semdedup_pairs(emb, threshold=_T, centroids=cents)
    # exact all-pairs reference (no blocking): block on a constant
    exact = semdedup_pairs(
        emb.withColumn("_one", F.lit(1)), threshold=_T, cell_col="_one"
    )
    got_set = {(r.id_a, r.id_b) for r in got.collect()}
    exact_set = {(r.id_a, r.id_b) for r in exact.collect()}
    assert got_set <= exact_set


def test_semdedup_survivor_invariants(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(emb, "embedding", n_cells=4, seed=42)
    out = semdedup(emb, threshold=_T, centroids=cents)
    rows = out.collect()
    assert len(rows) == emb.count()  # no rows lost or duplicated
    by_id = {r.vec_id: r.canonical_id for r in rows}
    # canonical is idempotent and minimal: canonical of a canonical is itself
    for vid, canon in by_id.items():
        assert canon <= vid
        assert by_id[canon] == canon
    # determinism: same seed -> same survivors
    out2 = semdedup(emb, threshold=_T, centroids=cents)
    assert {(r.vec_id, r.canonical_id) for r in out2.collect()} == set(by_id.items())


def test_assign_cells_covers_all_rows(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(emb, "embedding", n_cells=4, seed=42)
    assigned = assign_cells(emb, "embedding", cents)
    assert assigned.filter(F.col("cell").isNull()).count() == 0
    assert assigned.select("cell").distinct().count() <= 4


# --- multi-assignment (nprobe > 1) -----------------------------------------

from etl_market_survey_spark.operators.semdedup import assign_cells_multi  # noqa: E402


def test_nprobe_recall_is_monotone_and_exact_at_full_probe(spark, sf_dir):
    """pairs(nprobe=1) ⊆ pairs(nprobe=2) ⊆ ... ⊆ exact all-pairs, with
    equality when every row probes every cell."""
    emb = _emb(spark, sf_dir)
    cents = train_ivf_centroids(emb, "embedding", n_cells=4, seed=42)
    exact = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(
            emb.withColumn("_one", F.lit(1)), threshold=_T, cell_col="_one"
        ).collect()
    }
    prev: set = set()
    for nprobe in (1, 2, 4):
        got = {
            (r.id_a, r.id_b)
            for r in semdedup_pairs(
                emb, threshold=_T, centroids=cents, nprobe=nprobe
            ).collect()
        }
        assert prev <= got <= exact, nprobe
        prev = got
    assert prev == exact  # nprobe == n_cells sees every pair


def test_nprobe_recovers_boundary_pair(spark):
    """Two near-identical vectors on opposite sides of a cell boundary:
    single assignment misses the pair, nprobe=2 recovers it."""
    rows = [
        (1, [1.0, 0.02]),   # nearest centroid: x-axis
        (2, [1.0, -0.02]),  # still x-axis... construct boundary straddle
    ]
    cents = [[1.0, 0.05], [1.0, -0.05], [-1.0, 0.0]]
    # cos(v1, c0) > cos(v1, c1) and cos(v2, c1) > cos(v2, c0): split.
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    single = semdedup_pairs(df, threshold=0.9, centroids=cents, nprobe=1)
    multi = semdedup_pairs(df, threshold=0.9, centroids=cents, nprobe=2)
    assert single.count() == 0
    assert {(r.id_a, r.id_b) for r in multi.collect()} == {(1, 2)}


def test_nprobe_no_double_counting(spark):
    """Rows sharing BOTH probed cells emit their pair exactly once."""
    rows = [(1, [1.0, 0.01]), (2, [1.0, -0.01])]
    cents = [[1.0, 0.0], [0.9, 0.1], [-1.0, 0.0]]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    multi = semdedup_pairs(df, threshold=0.9, centroids=cents, nprobe=2)
    assert multi.count() == 1


def test_nprobe_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    import pytest

    with pytest.raises(ValueError):
        assign_cells_multi(df, "embedding", [[1.0]], nprobe=2)
    with pytest.raises(ValueError):
        semdedup_pairs(df, cell_col="label", nprobe=2)
