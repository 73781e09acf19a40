"""DSIR importance weights: target-like raw docs outrank off-domain."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.dsir import dsir_logweights, dsir_select


def _corpus(spark):
    rows = []
    # target domain: "alpha beta" language
    for i in range(20):
        rows.append((i, "alpha beta alpha beta gamma alpha beta", "target"))
    # raw pool: half in-domain, half off-domain
    for i in range(20, 30):
        rows.append((i, "alpha beta alpha beta alpha beta", "raw"))
    for i in range(30, 40):
        rows.append((i, "delta epsilon zeta delta epsilon zeta", "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_in_domain_raw_docs_win(spark):
    df = _corpus(spark)
    sel = dsir_select(
        df, "doc_id", "text", F.col("kind") == "target", n_select=10, n_buckets=256
    )
    ids = sorted(r.doc_id for r in sel.collect())
    assert ids == list(range(20, 30)), ids


def test_logweights_sign_separates_domains(spark):
    df = _corpus(spark)
    w = {
        r.doc_id: r.logw
        for r in dsir_logweights(
            df, "doc_id", "text", F.col("kind") == "target", n_buckets=256
        ).collect()
    }
    assert min(w[i] for i in range(20, 30)) > max(w[i] for i in range(30, 40))


def test_featureless_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "target"), (2, "x", "raw"), (3, "alpha beta", "raw")],
        "doc_id long, text string, kind string",
    )
    w = {
        r.doc_id: (r.n_bigrams, r.logw)
        for r in dsir_logweights(
            df, "doc_id", "text", F.col("kind") == "target", n_buckets=64
        ).collect()
    }
    assert w[2] == (0, 0.0)
