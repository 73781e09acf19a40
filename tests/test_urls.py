"""URL functions (functions/urls) — q275 gates the corpus path; units
pin parse edges the synthesized corpus doesn't hit."""

from pyspark.sql import functions as F

from etl_market_survey_spark.functions.urls import (
    cap_per_domain,
    n_query_params,
    path_depth,
    url_domain,
    url_host,
    url_port,
    url_path,
    url_query,
)


def test_parse_edges(spark):
    urls = [
        "https://a.b.example.com/x/y?k=1&k2=2",
        "http://example.org",
        "https://host.net:8443/",
        "ftp+ssh://deep.sub.domain.io/a/b/c/d",
        "https://single/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        url_host("url").alias("h"),
        url_port("url").alias("p"),
        url_path("url").alias("pa"),
        url_query("url").alias("q"),
        url_domain("url").alias("d"),
        path_depth("url").alias("pd"),
        n_query_params("url").alias("np"),
    ).collect()
    assert [r["h"] for r in rows] == [
        "a.b.example.com", "example.org", "host.net", "deep.sub.domain.io", "single",
    ]
    assert [r["p"] for r in rows] == [None, None, 8443, None, None]
    assert [r["d"] for r in rows] == [
        "example.com", "example.org", "host.net", "domain.io", "single",
    ]
    assert [r["pd"] for r in rows] == [2, 0, 0, 4, 1]
    assert [r["np"] for r in rows] == [2, 0, 0, 0, 0]


def test_cap_per_domain_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"https://www.dom{'AB'[i % 2]}.com/p") for i in range(20)],
        "id long, url string",
    )
    a = cap_per_domain(df, "url", "id", 3)
    kept = a.filter(F.col("kept")).groupBy("domain").count().collect()
    assert {r["domain"]: r["count"] for r in kept} == {"domA.com": 3, "domB.com": 3}
    b = cap_per_domain(df, "url", "id", 3).collect()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b))
