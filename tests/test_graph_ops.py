"""Temporal reachability (operators/temporalbfs) — q281 gates the
corpus path; units pin the time-increasing constraint."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.temporalbfs import temporal_reachability


def test_time_respecting_paths_only(spark):
    # 1 -t1-> 2 -t2-> 3 reachable only when t2 > t1
    ok = spark.createDataFrame([(1, 2, 5), (2, 3, 7)], "src long, dst long, t long")
    bad = spark.createDataFrame([(1, 2, 5), (2, 3, 3)], "src long, dst long, t long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got_ok = {(r["node"], r["arrival"]) for r in temporal_reachability(ok, seeds).collect()}
    assert got_ok == {(2, 5), (3, 7)}
    got_bad = {(r["node"], r["arrival"]) for r in temporal_reachability(bad, seeds).collect()}
    assert got_bad == {(2, 5)}  # 3 unreachable: its edge fired earlier


def test_earliest_arrival_prefers_later_start_if_it_arrives_earlier(spark):
    # two routes to 3: direct at t=10, or via 2 (t=1 then t=4)
    e = spark.createDataFrame(
        [(1, 3, 10), (1, 2, 1), (2, 3, 4)], "src long, dst long, t long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["arrival"] for r in temporal_reachability(e, seeds).collect()}
    assert got[3] == 4  # the two-hop route arrives first


def test_hop_bound(spark):
    chain = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 4, 3), (4, 5, 4)], "src long, dst long, t long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got2 = {r["node"] for r in temporal_reachability(chain, seeds, max_hops=2).collect()}
    assert got2 == {2, 3}
    got4 = {r["node"] for r in temporal_reachability(chain, seeds, max_hops=4).collect()}
    assert got4 == {2, 3, 4, 5}
