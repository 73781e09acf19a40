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
