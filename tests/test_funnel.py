"""Funnel automaton unit tests: greedy-earliest = join-cascade semantics."""

import pytest

from etl_market_survey_spark.operators.funnel import funnel_match

_STAGES = ["view", "click", "purchase"]


def _run(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, us long, event_type string")
    out = funnel_match(df, ["user_id"], "us", "event_type", _STAGES).collect()
    return {r.user_id: (r.n_completed, list(r.stage_ts)) for r in out}


def test_full_and_partial_matches(spark):
    rows = [
        # user 1: full funnel, out-of-order noise
        (1, 10, "view"), (1, 5, "click"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click before any view only -> stage 1 never starts past view
        (2, 5, "click"), (2, 10, "view"),
        # user 3: view then purchase without click -> stops at 1
        (3, 1, "view"), (3, 2, "purchase"),
    ]
    got = _run(spark, rows)
    assert got[1] == (3, [10, 20, 30])
    assert got[2] == (1, [10])
    assert got[3] == (1, [1])


def test_equal_timestamps_do_not_advance(spark):
    # strict > : a click at the same instant as the matched view is ignored
    rows = [(1, 10, "view"), (1, 10, "click"), (1, 11, "click")]
    got = _run(spark, rows)
    assert got[1] == (2, [10, 11])


def test_earliest_view_wins(spark):
    # the funnel anchors on the FIRST view, even if a later view would
    # enable an earlier click (greedy-earliest = cascade min semantics)
    rows = [(1, 10, "view"), (1, 50, "view"), (1, 20, "click")]
    got = _run(spark, rows)
    assert got[1] == (2, [10, 20])


def test_empty_stages_rejected(spark):
    df = spark.createDataFrame([(1, 1, "view")], "user_id long, us long, event_type string")
    with pytest.raises(ValueError):
        funnel_match(df, ["user_id"], "us", "event_type", [])
